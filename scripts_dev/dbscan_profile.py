"""Dev: split dbscan_pp into kNN vs cluster-propagation time on the chip."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp

from modest_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
from bench_pipeline import synth_frame  # noqa: E402

from modest_tpu.pipeline import clustering as C
from modest_tpu.pipeline.ground_plane import above_plane, estimate_plane

rng = np.random.RandomState(0)
ptc = synth_frame(rng)
pp = rng.uniform(0, 1, len(ptc)).astype(np.float32)
pp[60000:60000 + 12 * 800] *= 0.3

plane = estimate_plane(ptc[:, :3], max_hs=-1.5, ptc_range=((-70, 70), (-20, 40)))
mask = (above_plane(ptc[:, :3], plane, offset=0.05, only_range=((-70, 70), (-20, 40)))
        & (np.abs(ptc[:, 0]) < 70) & (np.abs(ptc[:, 1]) < 40))
xyz = ptc[mask, :3]
ppm = pp[mask]
n = len(xyz)
print(f"n={n}")

# use the library's real prep (spread pads, quarter-pow2 bucket)
radius, eps, min_samples, k_req, row_chunk = 2.0, 0.1, 10, 70, 1024
n_pad = C._bucket(n, row_chunk)
order, x, p, valid, need = C._dbscan_prep(xyz, ppm, n_pad, radius, row_chunk)
k = min(k_req, max(n - 1, 1))
w = C._window_width(need, k, row_chunk)
print(f"n_pad={n_pad} need={need} w={w} k={k}")

xj = jnp.asarray(x)
vj = jnp.asarray(valid)
pj = jnp.asarray(p)


def timeit(name, fn, warm=1, iters=5):
    for _ in range(warm):
        out = fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
        np.asarray(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:30s} {dt*1e3:8.1f} ms", flush=True)
    return out


import jax  # noqa: E402

idx, d2 = timeit("_knn_windowed", lambda: C._knn_windowed(
    xj, vj, k, row_chunk, w, float(radius)))

raw = timeit("_cluster_from_knn", lambda: C._cluster_from_knn(
    idx, d2, pj, vj, np.float32(radius * radius), np.float32(eps), min_samples))

# count propagation iterations by running an unrolled python loop on host logic
idx_h = np.asarray(idx)
d2_h = np.asarray(d2)
kth = np.where(valid, np.max(np.where(np.isfinite(d2_h), d2_h, -1.0), axis=1), -1.0)
finite = np.isfinite(d2_h)
mutual = finite & (d2_h <= kth[idx_h])
within = finite & (d2_h <= radius * radius)
ppok = np.abs(p[:, None] - p[idx_h]) <= eps
edge = mutual & within & ppok & valid[:, None] & valid[idx_h]
deg = edge.sum(1)
core = valid & ((deg + 1) >= min_samples)
core_edge = edge & core[:, None] & core[idx_h]
labels = np.where(core, np.arange(n_pad), n_pad).astype(np.int64)
it = 0
while True:
    ext = np.concatenate([labels, [n_pad]])
    nbr = np.where(core_edge, ext[idx_h], n_pad)
    new = np.minimum(labels, nbr.min(1))
    ext2 = np.concatenate([new, [n_pad]])
    new = np.where(core, np.minimum(new, ext2[new]), new)
    ext3 = np.concatenate([new, [n_pad]])
    new = np.where(core, np.minimum(new, ext3[new]), new)
    it += 1
    if np.array_equal(new, labels):
        break
    labels = new
print(f"propagation iterations: {it}")
