"""Dev: through-the-loader train throughput on the flagship config.

Answers VERDICT r1 item 2: the published train scans/s was device-only
(train_step_bench.py); this measures the number the self-training loop
actually sees — real KittiDataset __getitem__ (bin load + gt-sampling +
flips + 12288-pt near/far sampling) + collate + device_put + train step,
with the threaded prefetch loader overlapping host work behind the step.

Usage: python scripts_dev/train_loader_bench.py [--workers N] [--steps K]
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

from modest_tpu.data.loader import build_dataloader, prefetch_to_device
from modest_tpu.models.pointrcnn import PointRCNN
from modest_tpu.train.optim import build_optimizer
from modest_tpu.train.state import create_train_state, make_train_step
from modest_tpu.utils.config import cfg_from_yaml_file

parser = argparse.ArgumentParser()
parser.add_argument("--workers", type=int, default=2)
parser.add_argument("--steps", type=int, default=24)
parser.add_argument("--batch_size", type=int, default=4)
parser.add_argument("--frames", type=int, default=16)
parser.add_argument("--root", type=str, default="/tmp/loader_bench_kitti")
args = parser.parse_args()

root = Path(args.root)
if not (root / "kitti_infos_train.pkl").exists():
    from synth_kitti import make_dataset

    from modest_tpu.data.kitti_dataset import create_kitti_infos

    print(f"building dense synthetic set ({args.frames} frames x ~92k pts)...")
    make_dataset(root, n_train=args.frames, n_val=2, seed=0, n_ground=90000, n_obj=800)
    data_cfg0 = cfg_from_yaml_file("configs/models/lyft_models/pointrcnn_dynamic_obj.yaml").DATA_CONFIG
    data_cfg0.DATA_PATH = str(root)
    create_kitti_infos(data_cfg0, ["Dynamic"], root, root)

cfg = cfg_from_yaml_file("configs/models/lyft_models/pointrcnn_dynamic_obj.yaml")
cfg.DATA_CONFIG.DATA_PATH = str(root)

dataset, loader = build_dataloader(
    cfg.DATA_CONFIG, cfg.CLASS_NAMES, args.batch_size, training=True,
    num_workers=args.workers,
)
dataset.merge_all_iters_to_one_epoch(True, 100)  # endless epoch for timing

model = PointRCNN(model_cfg=cfg.MODEL, num_class=len(cfg.CLASS_NAMES))
optimizer = build_optimizer(cfg.OPTIMIZATION, total_steps=1000)
first = next(iter(loader))
state = create_train_state(model, optimizer, first)
step = make_train_step(model, cfg.MODEL, optimizer)
key = jax.random.PRNGKey(0)

# host-only loader cost (no device work)
t0 = time.perf_counter()
n = 0
for batch in loader:
    n += 1
    if n >= 6:
        break
host_ms = (time.perf_counter() - t0) / n * 1e3
print(f"host batch build: {host_ms:.1f} ms/batch ({args.workers} workers)")

# warmup / compile
state, metrics = step(state, jnp.asarray(first["points"]), jnp.asarray(first["gt_boxes"]), key)
print("compiled, loss:", float(metrics["loss"]))

it = prefetch_to_device(loader, None, size=2)
t0 = time.perf_counter()
n = 0
for batch in it:
    state, metrics = step(state, jnp.asarray(batch["points"]),
                          jnp.asarray(batch["gt_boxes"]), key)
    n += 1
    if n % 6 == 0:
        float(metrics["loss"])  # periodic sync (relay pipelining)
    if n >= args.steps:
        break
float(metrics["loss"])
dt = (time.perf_counter() - t0) / n
print(f"through-the-loader train: {dt*1e3:.1f} ms/batch -> "
      f"{args.batch_size/dt:.1f} scans/s/chip "
      f"(workers={args.workers}, B={args.batch_size})")
