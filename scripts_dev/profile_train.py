"""Dev: train-step decomposition (fwd loss vs fwd+bwd vs full step) and
batch-size sweep on the real chip."""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from modest_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()

import optax

from modest_tpu.models.pointrcnn import PointRCNN
from modest_tpu.train.state import create_train_state, make_train_step
from modest_tpu.utils.config import cfg_from_yaml_file

parser = argparse.ArgumentParser()
parser.add_argument("--batches", type=int, nargs="*", default=[4, 8])
args = parser.parse_args()

cfg = cfg_from_yaml_file("configs/models/lyft_models/pointrcnn_dynamic_obj.yaml")
model = PointRCNN(model_cfg=cfg.MODEL, num_class=len(cfg.CLASS_NAMES))
N = 12288
rng = np.random.RandomState(0)


def make(batch):
    points = rng.uniform(0, 1, (batch, N, 4)).astype(np.float32)
    points[..., 0] *= 80
    points[..., 1] = (points[..., 1] - 0.5) * 80
    points[..., 2] = (points[..., 2] - 0.5) * 3 - 0.5
    gt = np.zeros((batch, 16, 8), np.float32)
    for b in range(batch):
        for k in range(10):
            c = rng.uniform([5, -30, -1.6], [70, 30, -1.4])
            sl = slice(k * 300, (k + 1) * 300)
            points[b, sl, :3] = c + rng.uniform(-1, 1, (300, 3)) * [2, 0.9, 0.7]
            gt[b, k, :7] = [c[0], c[1], c[2], 4, 2, 1.6, 0.3]
            gt[b, k, 7] = 1
    return jnp.asarray(points), jnp.asarray(gt)


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x) if hasattr(x, "shape") else x,
                 out)  # sync after compile
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*args)
        if (i + 1) % 5 == 0:
            first = jax.tree.leaves(out)[0]
            np.asarray(first)
    first = jax.tree.leaves(out)[0]
    np.asarray(first)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:46s}{dt*1e3:8.2f} ms", flush=True)
    return dt


tx = optax.adam(1e-3)
key = jax.random.PRNGKey(7)

for B in args.batches:
    pts, gt = make(B)
    state = create_train_state(model, tx,
                               {"points": np.asarray(pts), "gt_boxes": np.asarray(gt)})
    step = make_train_step(model, cfg.MODEL, tx)

    from modest_tpu.models import api as model_api

    def loss_fn(params):
        out, new_bs = model_api.apply_train(
            model, cfg.MODEL,
            {"params": params, "batch_stats": state.batch_stats},
            pts, gt, key,
        )
        loss, metrics = model_api.compute_loss(
            out, gt, cfg.MODEL, num_class=int(getattr(model, "num_class", 1)))
        return loss

    fwd = jax.jit(loss_fn)
    grad = jax.jit(jax.grad(loss_fn))

    print(f"--- B={B}")
    t_f = timeit("train fwd (loss only)", fwd, state.params)
    t_g = timeit("train fwd+bwd (grad)", grad, state.params)

    # the step donates its state arg — thread it instead of reusing
    holder = [state]

    def stepped():
        new_state, m = step(holder[0], pts, gt, key)
        holder[0] = new_state
        return m

    t_s = timeit("full step (fwd+bwd+adam)", stepped)
    print(f"  bwd-only ~{(t_g-t_f)*1e3:.1f} ms, optimizer+rest ~{(t_s-t_g)*1e3:.1f} ms "
          f"-> {B/t_s:.1f} train scans/s/chip", flush=True)
