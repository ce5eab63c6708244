"""CLI: train a detector (reference tools/train.py).

Usage:
  python -m modest_tpu.cli.train --cfg_file configs/models/lyft_models/pointrcnn_dynamic_obj.yaml \
      [--batch_size B] [--epochs E] [--extra_tag TAG] [--fix_random_seed] \
      [--merge_all_iters_to_one_epoch] [--set KEY VALUE ...]

Instead of torch.distributed.launch + NCCL DDP, parallelism is a
jax.sharding.Mesh over all local devices; batch_size is the GLOBAL batch
(reference: per-GPU batch × world size).
"""
from __future__ import annotations

import argparse
import datetime
import logging
from pathlib import Path

import numpy as np

from ..data.loader import build_dataloader
from ..models import build_network
from ..parallel.mesh import make_mesh
from ..train.checkpoint import make_manager, restore_checkpoint, save_checkpoint
from ..train.loop import eval_one_epoch, train_model
from ..train.optim import build_optimizer
from ..train.state import create_train_state
from ..utils.config import Config, cfg_from_list, cfg_from_yaml_file


def create_logger(log_file=None):
    logger = logging.getLogger("modest_tpu")
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s  %(levelname)5s  %(message)s")
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file is not None:
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


def parse_config(argv=None):
    parser = argparse.ArgumentParser(description="train a detector")
    parser.add_argument("--cfg_file", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=None, help="global batch size")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--extra_tag", type=str, default="default")
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--pretrained_model", type=str, default=None,
                        help="ckpt dir for a shape-checked partial transfer "
                             "load (reference --pretrained_model)")
    parser.add_argument("--fix_random_seed", action="store_true")
    parser.add_argument("--workers", type=int, default=4,
                        help="loader prefetch threads (reference torch "
                             "DataLoader workers=4); --fix_random_seed "
                             "forces 0 for a deterministic RNG stream")
    parser.add_argument("--ckpt_save_interval", type=int, default=1)
    parser.add_argument("--max_ckpt_save_num", type=int, default=30)
    parser.add_argument("--merge_all_iters_to_one_epoch", action="store_true")
    parser.add_argument("--steps_per_dispatch", type=int, default=1,
                        help="optimizer steps per device dispatch (lax.scan "
                        "over stacked batches; bit-identical to 1, amortizes "
                        "the fixed per-dispatch cost)")
    parser.add_argument("--num_devices", type=int, default=None)
    parser.add_argument("--launcher", choices=["none", "slurm", "manual"],
                        default="none",
                        help="multi-process init (reference train.py "
                             "--launcher): slurm reads SLURM_* env; manual "
                             "reads --coordinator/--num_processes/--process_id")
    parser.add_argument("--coordinator", type=str, default=None,
                        help="host:port of process 0 (launcher=manual)")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    parser.add_argument("--max_gt", type=int, default=64)
    parser.add_argument("--data_path", type=str, default=None,
                        help="override DATA_CONFIG.DATA_PATH")
    parser.add_argument("--output_dir", type=str, default=None)
    parser.add_argument("--eval_after_train", action="store_true")
    parser.add_argument("--set", dest="set_cfgs", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args(argv)

    cfg = cfg_from_yaml_file(args.cfg_file)
    cfg.TAG = Path(args.cfg_file).stem
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)
    if args.data_path is not None:
        cfg.DATA_CONFIG.DATA_PATH = args.data_path
    return args, cfg


def main(argv=None):
    from ..utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    args, cfg = parse_config(argv)
    if args.fix_random_seed:
        np.random.seed(666)
        args.workers = 0

    if args.launcher != "none":
        from ..parallel.multihost import init_multihost

        init_multihost(coordinator_address=args.coordinator,
                       num_processes=args.num_processes,
                       process_id=args.process_id)

    out_root = Path(args.output_dir) if args.output_dir else Path("output") / cfg.TAG / args.extra_tag
    ckpt_dir = out_root / "ckpt"
    out_root.mkdir(parents=True, exist_ok=True)
    logger = create_logger(out_root / f"log_train_{datetime.datetime.now():%Y%m%d-%H%M%S}.txt")
    logger.info(f"config: {args.cfg_file}; output: {out_root}")

    mesh = make_mesh(args.num_devices)
    logger.info(f"mesh: {mesh}")
    batch_size = args.batch_size or int(cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU) * mesh.size
    epochs = args.epochs or int(cfg.OPTIMIZATION.NUM_EPOCHS)

    train_set, train_loader = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size,
        training=True, logger=logger, total_epochs=epochs,
        merge_all_iters_to_one_epoch=args.merge_all_iters_to_one_epoch,
        max_gt=args.max_gt, num_workers=args.workers,
    )
    # a merged loader already spans total_epochs passes (one traversal =
    # the whole run); otherwise each epoch is one traversal
    total_steps = (len(train_loader) if args.merge_all_iters_to_one_epoch
                   else len(train_loader) * epochs)

    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset=train_set)
    optimizer = build_optimizer(cfg.OPTIMIZATION, total_steps,
                                iters_per_epoch=len(train_loader))

    sample = next(iter(train_loader))
    state = create_train_state(model, optimizer, sample)
    n_params = sum(int(np.prod(p.shape)) for p in
                   __import__("jax").tree_util.tree_leaves(state.params))
    logger.info(f"model params: {n_params / 1e6:.2f}M, total steps: {total_steps}")

    from ..train.metrics import MetricsLogger

    metrics_logger = MetricsLogger(out_root)
    manager = make_manager(ckpt_dir, max_to_keep=args.max_ckpt_save_num)
    start_epoch = 0
    restored, last_epoch = restore_checkpoint(manager, state)
    if restored is not None:
        state = restored
        start_epoch = last_epoch
        logger.info(f"resumed from epoch {last_epoch}")
    elif args.pretrained_model is not None:
        if str(args.pretrained_model).endswith(".pth"):
            # a reference torch checkpoint (MODEST's released ckpts)
            from ..train.torch_convert import load_reference_pth

            state, report = load_reference_pth(args.pretrained_model, state)
            logger.info(f"converted reference checkpoint: "
                        f"{len(report.converted)} tensors loaded")
        else:
            from ..train.checkpoint import load_params_partial

            state, n_loaded, n_skipped = load_params_partial(
                state, args.pretrained_model, logger=logger)
            logger.info(f"pretrained transfer: {n_loaded} tensors loaded, "
                        f"{n_skipped} kept at init")

    state = train_model(
        model, cfg.MODEL, optimizer, state, train_loader,
        mesh=mesh, start_epoch=start_epoch, total_epochs=epochs,
        ckpt_manager=manager, ckpt_save_interval=args.ckpt_save_interval,
        logger=logger,
        merge_all_iters_to_one_epoch=args.merge_all_iters_to_one_epoch,
        metrics_logger=metrics_logger,
        steps_per_dispatch=args.steps_per_dispatch,
    )
    if manager.latest_step() != epochs:  # interval save may already cover it
        save_checkpoint(manager, __import__("jax").device_get(state), epochs)
    logger.info("training finished")

    if args.eval_after_train:
        eval_set, eval_loader = build_dataloader(
            cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size,
            training=False, logger=logger, max_gt=args.max_gt,
            num_workers=args.workers,
        )
        result_dir = out_root / "eval" / f"epoch_{epochs}" / "val"
        result_dir.mkdir(parents=True, exist_ok=True)
        eval_one_epoch(
            model, cfg.MODEL, state, eval_loader, eval_set, cfg.CLASS_NAMES,
            mesh=mesh, result_dir=result_dir, logger=logger,
        )
    return state


if __name__ == "__main__":
    main()
