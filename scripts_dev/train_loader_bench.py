"""Dev: train throughput THROUGH the data loader (VERDICT r1 item 2).

Builds a realistic-density synthetic KITTI set (~60k pts/frame, Lyft-like),
then times the flagship train step fed by the real DataLoader +
prefetch_to_device, for num_workers=0 (synchronous) and 4 (fork-pool
worker-process prefetch). The gap to the device-only number
(train_step_bench.py) is the host-input overhead the reference hides
behind torch DataLoader workers
(downstream/OpenPCDet/pcdet/datasets/__init__.py build_dataloader).

--force-procs pins loader.use_procs=True so the fork-pool path is
measured even on a 1-core host (where the auto heuristic runs inline).

Usage: python scripts_dev/train_loader_bench.py [--frames 48] [--batch 4]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import jax
import jax.numpy as jnp
import numpy as np

from modest_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()

parser = argparse.ArgumentParser()
parser.add_argument("--frames", type=int, default=48)
parser.add_argument("--batch", type=int, default=4)
parser.add_argument("--epochs", type=int, default=3)
parser.add_argument("--workers", type=int, nargs="*", default=[0, 4])
parser.add_argument("--force-procs", action="store_true")
args = parser.parse_args()

import optax

from synth_kitti import make_dataset
from modest_tpu.data.loader import build_dataloader, prefetch_to_device
from modest_tpu.data.kitti_dataset import create_kitti_infos
from modest_tpu.models.pointrcnn import PointRCNN
from modest_tpu.train.state import create_train_state, make_train_step
from modest_tpu.utils.config import cfg_from_yaml_file

root = Path("/tmp/loader_bench_kitti")
if not (root / "kitti_infos_train.pkl").exists():
    print(f"building {args.frames}-frame synthetic set at {root}...", flush=True)
    make_dataset(root, n_train=args.frames, n_val=2, seed=0,
                 n_ground=55000, n_obj=2500)
    data_cfg = cfg_from_yaml_file("configs/datasets/lyft_dataset_dynamic_obj.yaml")
    data_cfg.DATA_PATH = str(root)
    create_kitti_infos(data_cfg, ["Dynamic"], root, root)

cfg = cfg_from_yaml_file("configs/models/lyft_models/pointrcnn_dynamic_obj.yaml")
cfg.DATA_CONFIG.DATA_PATH = str(root)
model = PointRCNN(model_cfg=cfg.MODEL, num_class=len(cfg.CLASS_NAMES))
tx = optax.adam(1e-3)
step = make_train_step(model, cfg.MODEL, tx)

state = None
for workers in args.workers:
    dataset, loader = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, args.batch, root_path=root,
        training=True, num_workers=workers)
    if args.force_procs and workers > 0:
        loader.use_procs = True
    n_steps = 0
    key = jax.random.PRNGKey(0)
    t0 = None
    for epoch in range(args.epochs):
        loader.set_epoch(epoch)
        for batch in prefetch_to_device(loader, None, size=2):
            if state is None:
                state = create_train_state(
                    model, tx,
                    {"points": np.asarray(batch["points"]),
                     "gt_boxes": np.asarray(batch["gt_boxes"])})
            state, metrics = step(state, jnp.asarray(batch["points"]),
                                  jnp.asarray(batch["gt_boxes"]), key)
            n_steps += 1
            if epoch == 0 and t0 is None and n_steps == len(loader):
                float(metrics["loss"])  # sync: exclude epoch-0 compile
                t0 = time.perf_counter()
                timed0 = n_steps
    float(metrics["loss"])
    dt = time.perf_counter() - t0
    timed = n_steps - timed0
    scans = timed * args.batch
    print(f"workers={workers}: {scans/dt:.1f} scans/s/chip through the loader "
          f"({dt/timed*1e3:.1f} ms/step, {timed} steps)", flush=True)
