"""Dev: per-stage roofline attribution of the train step (VERDICT r2 item 4).

Times + XLA-cost-analyzes (flops, bytes accessed) each subgraph of the
flagship train step — backbone fwd, full train fwd, fwd+bwd, optimizer —
so the 57 GB/step shows WHERE it moves. Differences between rows attribute
bytes to the stage added.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts_dev/roofline_split.py [batch]
"""
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

from modest_tpu.models import api as model_api
from modest_tpu.models.pointrcnn import PointRCNN
from modest_tpu.train.state import create_train_state, make_train_step
from modest_tpu.utils.config import cfg_from_yaml_file

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
N = 12288
cfg = cfg_from_yaml_file("configs/models/lyft_models/pointrcnn_dynamic_obj.yaml")
model = PointRCNN(model_cfg=cfg.MODEL, num_class=len(cfg.CLASS_NAMES))

rng = np.random.RandomState(0)
points = rng.uniform(0, 1, (B, N, 4)).astype(np.float32)
points[..., 0] *= 80
points[..., 1] = (points[..., 1] - 0.5) * 80
points[..., 2] = (points[..., 2] - 0.5) * 3 - 0.5
gt = np.zeros((B, 16, 8), np.float32)
for b in range(B):
    for k in range(10):
        c = rng.uniform([5, -30, -1.6], [70, 30, -1.4])
        points[b, k * 300:(k + 1) * 300, :3] = (
            c + rng.uniform(-1, 1, (300, 3)) * [2, 0.9, 0.7])
        gt[b, k, :7] = [c[0], c[1], c[2], 4, 2, 1.6, 0.3]
        gt[b, k, 7] = 1

tx = optax.adam(1e-3)
state = create_train_state(model, tx, {"points": points, "gt_boxes": gt})
pts, gtj = jnp.asarray(points), jnp.asarray(gt)
key = jax.random.PRNGKey(7)
variables = {"params": state.params, "batch_stats": state.batch_stats}


def report(name, fn, *args, iters=10):
    jitted = jax.jit(fn)
    lowered = jitted.lower(*args)
    cost = lowered.compile().cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    gf = float(cost.get("flops", 0.0)) / 1e9
    gb = float(cost.get("bytes accessed", 0.0)) / 1e9
    # reduce outputs to ONE scalar on device so the pipelined sync fetch is
    # 4 bytes — fetching a 25 MB feature map through the 0.02 GB/s relay
    # would otherwise dominate the row
    def scalarized(*a):
        out = fn(*a)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(out)
                   if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating))

    sj = jax.jit(scalarized)
    out = sj(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = sj(*args)
        if (i + 1) % 5 == 0:
            np.asarray(out)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:32s} {dt*1e3:8.1f} ms  {gf:8.1f} GF  {gb:8.2f} GB  "
          f"{gb/dt:6.1f} GB/s", flush=True)
    return dt


# --- backbone only (train mode, same params subtree) ---
from modest_tpu.models.pointnet2_backbone import PointNet2MSG

bb_cfg = cfg.MODEL.BACKBONE_3D
bb = PointNet2MSG(
    sa_npoints=tuple(bb_cfg.SA_CONFIG.NPOINTS),
    sa_radii=tuple(tuple(r) for r in bb_cfg.SA_CONFIG.RADIUS),
    sa_nsamples=tuple(tuple(s) for s in bb_cfg.SA_CONFIG.NSAMPLE),
    sa_mlps=tuple(tuple(tuple(c) for c in m) for m in bb_cfg.SA_CONFIG.MLPS),
    fp_mlps=tuple(tuple(m) for m in bb_cfg.FP_MLPS),
)
bb_params = {"params": variables["params"]["backbone"],
             "batch_stats": variables["batch_stats"]["backbone"]}


def bb_fwd(v, p):
    return bb.apply(v, p, train=False)


report("backbone fwd (eval)", bb_fwd, bb_params, pts)


def bb_fwd_train(v, p):
    out, _ = bb.apply(v, p, train=True, mutable=["batch_stats"])
    return out


report("backbone fwd (train BN)", bb_fwd_train, bb_params, pts)


def bb_fwd_bwd(v, p):
    def loss(params):
        out, _ = bb.apply({"params": params,
                           "batch_stats": v["batch_stats"]},
                          p, train=True, mutable=["batch_stats"])
        return sum(jnp.sum(x) for x in jax.tree.leaves(out)
                   if x.dtype in (jnp.float32, jnp.bfloat16))

    return jax.grad(loss)(v["params"])


report("backbone fwd+bwd", bb_fwd_bwd, bb_params, pts)


# --- full train fwd (loss only) ---
def train_fwd(params, bs, p, g, k):
    out, new_bs = model_api.apply_train(model, cfg.MODEL,
                                        {"params": params, "batch_stats": bs},
                                        p, g, k)
    loss, _ = model_api.compute_loss(out, g, cfg.MODEL,
                                     num_class=len(cfg.CLASS_NAMES))
    return loss


report("train fwd (loss)", train_fwd, state.params, state.batch_stats,
       pts, gtj, key)


def train_fwd_bwd(params, bs, p, g, k):
    return jax.grad(train_fwd)(params, bs, p, g, k)


report("train fwd+bwd", train_fwd_bwd, state.params, state.batch_stats,
       pts, gtj, key)

step = make_train_step(model, cfg.MODEL, tx)
report("full step (fwd+bwd+adam)",
       lambda s, p, g, k: step(s, p, g, k)[1]["loss"], state, pts, gtj, key)
