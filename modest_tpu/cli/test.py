"""CLI: evaluate a detector checkpoint (reference tools/test.py).

Usage:
  python -m modest_tpu.cli.test --cfg_file <model.yaml> --ckpt_dir <dir> \
      [--ckpt_epoch N] [--batch_size B] [--set KEY VALUE ...]

Writes result.pkl (consumed by combine_labels for self-training) and prints
range-bucketed R40 AP.
"""
from __future__ import annotations

import argparse
import datetime
from pathlib import Path

import numpy as np

from ..data.loader import build_dataloader
from ..models import build_network
from ..parallel.mesh import make_mesh
from ..train.checkpoint import make_manager, restore_checkpoint
from ..train.loop import eval_one_epoch
from ..train.optim import build_optimizer
from ..train.state import create_train_state
from ..utils.config import cfg_from_list, cfg_from_yaml_file
from .train import create_logger


def main(argv=None):
    parser = argparse.ArgumentParser(description="evaluate a detector")
    parser.add_argument("--cfg_file", type=str, required=True)
    parser.add_argument("--ckpt_dir", type=str, default=None)
    parser.add_argument("--torch_ckpt", type=str, default=None,
                        help="evaluate a reference .pth checkpoint directly "
                             "(MODEST's released checkpoints; converted via "
                             "train/torch_convert.py)")
    parser.add_argument("--ckpt_epoch", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--extra_tag", type=str, default="default")
    parser.add_argument("--num_devices", type=int, default=None)
    parser.add_argument("--data_path", type=str, default=None)
    parser.add_argument("--output_dir", type=str, default=None)
    parser.add_argument("--save_to_file", action="store_true")
    parser.add_argument("--workers", type=int, default=4,
                        help="loader prefetch threads")
    parser.add_argument("--eval_all", action="store_true",
                        help="evaluate every checkpoint in ckpt_dir, polling "
                             "for new ones (reference test.py repeat_eval_ckpt)")
    parser.add_argument("--max_waiting_mins", type=int, default=30,
                        help="with --eval_all: minutes to wait for a new "
                             "checkpoint before exiting")
    parser.add_argument("--set", dest="set_cfgs", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args(argv)

    from ..utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = cfg_from_yaml_file(args.cfg_file)
    cfg.TAG = Path(args.cfg_file).stem
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)
    if args.data_path is not None:
        cfg.DATA_CONFIG.DATA_PATH = args.data_path
    np.random.seed(1024)

    out_root = Path(args.output_dir) if args.output_dir else Path("output") / cfg.TAG / args.extra_tag
    mesh = make_mesh(args.num_devices)
    batch_size = args.batch_size or int(cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU) * mesh.size

    eval_set, eval_loader = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size, training=False,
        num_workers=args.workers,
    )
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset=eval_set)

    # template state for restoration (optimizer state unused at eval)
    optimizer = build_optimizer(cfg.OPTIMIZATION, total_steps=1)
    dummy = next(iter(eval_loader))
    if "gt_boxes" not in dummy:
        dummy["gt_boxes"] = np.zeros((dummy["points"].shape[0], 1, 8), np.float32)
    state = create_train_state(model, optimizer, dummy)

    assert args.ckpt_dir or args.torch_ckpt, "--ckpt_dir or --torch_ckpt required"
    split = cfg.DATA_CONFIG.DATA_SPLIT["test"]

    def eval_epoch(state, epoch):
        result_dir = out_root / "eval" / f"epoch_{epoch}" / split
        result_dir.mkdir(parents=True, exist_ok=True)
        logger = create_logger(
            result_dir / f"log_eval_{datetime.datetime.now():%Y%m%d-%H%M%S}.txt")
        logger.info(f"evaluating epoch {epoch} on split {split}")
        return eval_one_epoch(
            model, cfg.MODEL, state, eval_loader, eval_set, cfg.CLASS_NAMES,
            mesh=mesh, result_dir=result_dir, logger=logger,
            save_to_file=args.save_to_file,
        )

    if args.torch_ckpt is not None:
        from ..train.torch_convert import load_reference_pth

        state, report = load_reference_pth(args.torch_ckpt, state)
        print(f"converted reference checkpoint: {len(report.converted)} tensors")
        return eval_epoch(state, "torch_ckpt")

    manager = make_manager(args.ckpt_dir)
    if not args.eval_all:
        restored, epoch = restore_checkpoint(manager, state, args.ckpt_epoch)
        assert restored is not None, f"no checkpoint found in {args.ckpt_dir}"
        return eval_epoch(restored, epoch)

    # --eval_all: walk every checkpoint, then poll for new ones with a
    # timeout (reference test.py repeat_eval_ckpt:101-113)
    import time

    done = set()
    record = out_root / "eval" / f"eval_list_{split}.txt"
    record.parent.mkdir(parents=True, exist_ok=True)
    if record.exists():
        done = {int(x) for x in record.read_text().split() if x.strip()}
    last_new = time.time()
    results = None
    while True:
        # orbax caches all_steps() at construction — refresh to see
        # checkpoints written by a concurrently running training process
        if hasattr(manager, "reload"):
            manager.reload()
        pending = sorted(set(manager.all_steps()) - done)
        if not pending:
            waited = (time.time() - last_new) / 60
            if waited > args.max_waiting_mins:
                print(f"no new checkpoint for {waited:.1f} min — exiting")
                break
            time.sleep(30)
            continue
        epoch = pending[0]
        restored, epoch = restore_checkpoint(manager, state, epoch)
        results = eval_epoch(restored, epoch)
        done.add(epoch)
        record.write_text("\n".join(str(e) for e in sorted(done)) + "\n")
        last_new = time.time()
    return results


if __name__ == "__main__":
    main()
