"""Dev: time the full train step (fwd+bwd+adam) on the real chip.

Prints the wall time plus BOTH roofline axes from XLA's own cost model:
achieved TFLOP/s vs the v5e bf16 peak (MFU) and achieved GB/s vs the v5e
HBM peak — the model is gather/HBM-bound, so the bandwidth line is the
one that says how far from speed-of-light the step actually is.

Usage: python scripts_dev/train_step_bench.py [batch]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from modest_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()

from modest_tpu.models.pointrcnn import PointRCNN
from modest_tpu.train.optim import build_optimizer
from modest_tpu.train.state import TrainState, create_train_state, make_train_step
from modest_tpu.utils.config import cfg_from_yaml_file

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 4
cfg = cfg_from_yaml_file("configs/models/lyft_models/pointrcnn_dynamic_obj.yaml")
model = PointRCNN(model_cfg=cfg.MODEL, num_class=len(cfg.CLASS_NAMES))

rng = np.random.RandomState(0)
n = 12288
points = rng.uniform(0, 1, (BATCH, n, 4)).astype(np.float32)
points[..., 0] *= 80
points[..., 1] = (points[..., 1] - 0.5) * 80
points[..., 2] = (points[..., 2] - 0.5) * 3 - 0.5
gt = np.zeros((BATCH, 16, 8), np.float32)
for b in range(BATCH):
    for k in range(10):
        c = rng.uniform([5, -30, -1.6], [70, 30, -1.4])
        sl = slice(k * 300, (k + 1) * 300)
        points[b, sl, :3] = c + rng.uniform(-1, 1, (300, 3)) * [2, 0.9, 0.7]
        gt[b, k, :7] = [c[0], c[1], c[2], 4, 2, 1.6, 0.3]
        gt[b, k, 7] = 1

import optax

tx = optax.adam(1e-3)
state = create_train_state(model, tx, {"points": points, "gt_boxes": gt})
step = make_train_step(model, cfg.MODEL, tx)

pts = jnp.asarray(points)
gtj = jnp.asarray(gt)
key = jax.random.PRNGKey(7)
state, metrics = step(state, pts, gtj, key)
print("loss:", float(metrics["loss"]), flush=True)

ITERS = 10
t0 = time.perf_counter()
for i in range(ITERS):
    state, metrics = step(state, pts, gtj, key)
    if (i + 1) % 5 == 0:
        float(metrics["loss"])
float(metrics["loss"])
dt = (time.perf_counter() - t0) / ITERS
print(f"train step: {dt*1e3:.1f} ms/batch -> {BATCH/dt:.1f} scans/s/chip", flush=True)

# MFU vs the v5e roof (197 TFLOP/s bf16 / 98.3 f32): XLA's own cost model
# for the compiled step, so "fast" is judged against the chip, not history
try:
    import jax

    lowered = jax.jit(step).lower(state, pts, gtj, key)
    cost = lowered.compile().cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops = float(cost.get("flops", 0.0))
    PEAK_BF16 = 197e12
    print(f"step flops (XLA cost model): {flops/1e9:.1f} GF -> "
          f"{flops/dt/1e12:.2f} TFLOP/s achieved, "
          f"MFU {100*flops/dt/PEAK_BF16:.1f}% of v5e bf16 peak", flush=True)
    gbytes = float(cost.get("bytes accessed", 0.0))
    PEAK_HBM = 819e9  # v5e HBM bandwidth
    if gbytes:
        print(f"step bytes accessed (XLA cost model): {gbytes/1e9:.2f} GB -> "
              f"{gbytes/dt/1e9:.1f} GB/s achieved, "
              f"{100*gbytes/dt/PEAK_HBM:.1f}% of v5e HBM peak "
              f"(counts operand+output bytes per op — an upper bound on HBM "
              f"traffic since fused intermediates stay on-chip)", flush=True)
except Exception as e:  # cost_analysis unsupported on some backends
    print(f"cost_analysis unavailable: {e}", flush=True)
