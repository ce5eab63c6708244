"""Dev: stage-level timing of the PointRCNN eval forward on the real chip.

Times each subgraph jitted separately with pipelined dispatch (sync every 5),
mirroring bench.py's methodology, so the numbers are comparable.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from modest_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()

from modest_tpu.models.pointrcnn import PointRCNN, post_process
from modest_tpu.utils.config import cfg_from_yaml_file

BATCH = 4
cfg = cfg_from_yaml_file("configs/models/lyft_models/pointrcnn_dynamic_obj.yaml")
model = PointRCNN(model_cfg=cfg.MODEL, num_class=len(cfg.CLASS_NAMES))

rng = np.random.RandomState(0)
n = 12288
points = rng.uniform(0, 1, (BATCH, n, 4)).astype(np.float32)
points[..., 0] *= 80
points[..., 1] = (points[..., 1] - 0.5) * 80
points[..., 2] = (points[..., 2] - 0.5) * 3 - 0.5
for b in range(BATCH):
    for k in range(10):
        c = rng.uniform([5, -30, -1.6], [70, 30, -1.4])
        sl = slice(k * 300, (k + 1) * 300)
        points[b, sl, :3] = c + rng.uniform(-1, 1, (300, 3)) * [2, 0.9, 0.7]

gt = np.zeros((BATCH, 8, 8), np.float32)
gt[:, 0, :7] = [10, 0, -1.5, 4, 2, 1.6, 0.3]
gt[:, 0, 7] = 1
variables = model.init(
    {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)},
    jnp.asarray(points), jnp.asarray(gt), train=True,
)
pts = jnp.asarray(points)


def timeit(name, fn, *args, iters=15):
    r = fn(*args)
    jax.tree.map(lambda x: np.asarray(x) if hasattr(x, "shape") else x, r)
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = fn(*args)
        if (i + 1) % 5 == 0:
            leaf = jax.tree.leaves(out)[0]
            np.asarray(leaf)
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt*1e3:8.2f} ms/batch", flush=True)
    return out


# full eval forward
@jax.jit
def full(variables, pts):
    out = model.apply(variables, pts, train=False)
    final = post_process(out, cfg.MODEL.POST_PROCESSING)
    return final["boxes"], final["scores"], final["valid"]


timeit("full eval fwd + post", full, variables, pts)


# backbone only
from modest_tpu.models.pointnet2_backbone import PointNet2MSG

bb_cfg = cfg.MODEL.BACKBONE_3D
bb = PointNet2MSG(
    sa_npoints=tuple(bb_cfg.SA_CONFIG.NPOINTS),
    sa_radii=tuple(tuple(r) for r in bb_cfg.SA_CONFIG.RADIUS),
    sa_nsamples=tuple(tuple(s) for s in bb_cfg.SA_CONFIG.NSAMPLE),
    sa_mlps=tuple(tuple(tuple(c) for c in m) for m in bb_cfg.SA_CONFIG.MLPS),
    fp_mlps=tuple(tuple(m) for m in bb_cfg.FP_MLPS),
)
bb_vars = bb.init(jax.random.PRNGKey(0), pts)


@jax.jit
def bb_fwd(v, p):
    return bb.apply(v, p).sum()  # scalar out: keep relay transfer out of the timing


timeit("backbone", bb_fwd, bb_vars, pts)

# FPS alone at level-1 shape
from modest_tpu.ops import pointnet2 as p2


@jax.jit
def noop(p):
    return p[0, 0, 0]


timeit("relay roundtrip floor", noop, pts)


@jax.jit
def fps1(p):
    return p2.furthest_point_sample(p[..., :3], 4096).sum()


timeit("fps level1 4096/12288", fps1, pts)


@jax.jit
def d2k(p):
    c = p2.gather_points(p[..., :3], p2.furthest_point_sample(p[..., :3], 4096))
    d2 = p2.pairwise_dist2(c, p[..., :3])
    td, ti = p2.nearest_topk(d2, 32)
    return td.sum() + ti.sum()


timeit("fps+dist2+topk level1", d2k, pts)
