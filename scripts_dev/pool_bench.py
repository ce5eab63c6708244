"""Dev: microbench roipoint_pool3d variants + three_nn on the real chip."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from modest_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()

import functools

from modest_tpu.ops import pointnet2 as p2

B, N, C = 4, 12288, 128
rng = np.random.RandomState(0)
pts = jnp.asarray(rng.uniform(-40, 40, (B, N, 3)).astype(np.float32))
feats = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
boxes = np.zeros((B, 128, 7), np.float32)
boxes[..., :3] = rng.uniform(-30, 30, (B, 128, 3))
boxes[..., 3:6] = [4, 2, 1.6]
boxes = jnp.asarray(boxes)


def timeit(name, fn, *args, iters=15):
    r = fn(*args)
    jax.tree.map(lambda x: np.asarray(x) if hasattr(x, "shape") else x, r)
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = fn(*args)
        if (i + 1) % 5 == 0:
            np.asarray(jax.tree.leaves(out)[0])
    np.asarray(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt*1e3:8.2f} ms", flush=True)
    return out


# current implementation
cur = jax.jit(lambda p, f, b: p2.roipoint_pool3d(p, f, b, 512))
timeit("roipoint_pool3d current (128 rois)", cur, pts, feats, boxes)


# variant: plain lax.top_k instead of approx
@functools.partial(jax.jit, static_argnames=("ns",))
def pool_exact_topk(points, point_features, boxes3d, ns=512):
    def per_box(p, f, box):
        shift = p - box[0:3]
        c, s = jnp.cos(-box[6]), jnp.sin(-box[6])
        lx = shift[:, 0] * c - shift[:, 1] * s
        ly = shift[:, 0] * s + shift[:, 1] * c
        in_box = ((jnp.abs(shift[:, 2]) <= box[5] / 2)
                  & (jnp.abs(lx) <= box[3] / 2) & (jnp.abs(ly) <= box[4] / 2))
        col = jnp.arange(p.shape[0], dtype=jnp.int32)
        score = jnp.where(in_box, -col.astype(jnp.float32), -jnp.inf)
        top_scores, top_idx = jax.lax.top_k(score, ns)
        valid = jnp.isfinite(top_scores)
        cnt = valid.sum().astype(jnp.int32)
        slot = jnp.arange(ns, dtype=jnp.int32)
        src = jnp.where(cnt > 0, slot % jnp.maximum(cnt, 1), 0)
        sel = top_idx[src]
        fsel = f.astype(jnp.bfloat16)[sel].astype(jnp.float32)
        return jnp.concatenate([p[sel], fsel], -1), (cnt == 0).astype(jnp.int32)

    return jax.vmap(lambda p, f, bx: jax.vmap(lambda b: per_box(p, f, b))(bx))(
        points, point_features, boxes3d)


timeit("variant: exact lax.top_k", pool_exact_topk, pts, feats, boxes)


# variant: sort by (in_box ? col : BIG) via single argsort-free cumsum+topk on
# int32 key — measure a no-gather skeleton to isolate selection cost
@jax.jit
def select_only(points, boxes3d):
    def per_box(p, box):
        shift = p - box[0:3]
        c, s = jnp.cos(-box[6]), jnp.sin(-box[6])
        lx = shift[:, 0] * c - shift[:, 1] * s
        ly = shift[:, 0] * s + shift[:, 1] * c
        in_box = ((jnp.abs(shift[:, 2]) <= box[5] / 2)
                  & (jnp.abs(lx) <= box[3] / 2) & (jnp.abs(ly) <= box[4] / 2))
        col = jnp.arange(p.shape[0], dtype=jnp.int32)
        score = jnp.where(in_box, -col.astype(jnp.float32), -jnp.inf)
        _, top_idx = p2._fast_top_k(score, 512)
        return top_idx

    return jax.vmap(lambda p, bx: jax.vmap(lambda b: per_box(p, b))(bx))(
        points, boxes3d)


timeit("selection only (approx top_k, no gather)", select_only, pts, boxes)


# gather-only skeleton: fixed random indices
sel_idx = jnp.asarray(rng.randint(0, N, (B, 128, 512)).astype(np.int32))


@jax.jit
def gather_only(points, point_features, sel):
    flat = sel.reshape(B, -1)
    g = p2.gather_points(points, flat)
    f = p2.gather_points(point_features.astype(jnp.bfloat16), flat).astype(jnp.float32)
    return g, f


timeit("gather only (bf16 feats)", gather_only, pts, feats, sel_idx)

# three_nn old-vs-new at FP level-0 shape
unknown = pts
known = jnp.asarray(rng.uniform(-40, 40, (B, 4096, 3)).astype(np.float32))
timeit("three_nn (new approx path)", jax.jit(p2.three_nn), unknown, known)


@jax.jit
def three_nn_old(unknown, known):
    d2 = p2.pairwise_dist2(unknown, known)
    col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, d2.ndim - 1)
    idxs = []
    cur = d2
    for _ in range(3):
        i = jnp.argmin(cur, axis=-1).astype(jnp.int32)
        idxs.append(i)
        cur = jnp.where(col == i[..., None], jnp.inf, cur)
    idx = jnp.stack(idxs, axis=-1)
    b, n, _ = idx.shape
    nbr = p2.gather_points(known, idx.reshape(b, -1)).reshape(b, n, 3, 3)
    exact = ((nbr - unknown[:, :, None, :]) ** 2).sum(-1)
    return jnp.sqrt(exact), idx


timeit("three_nn (old 3-pass argmin)", three_nn_old, unknown, known)
