"""Dev: decompose dbscan_pp's 418 ms on the real frame — host prep, kNN,
cluster setup, per-round propagation gather, compress pass, while overhead.

Relay-safe timing: enqueue `iters` calls back-to-back, then force completion
with a tiny scalar fetch (full-buffer downloads on this relay run at
~0.02 GB/s and would dominate)."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
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

radius, eps, min_samples, k_req, row_chunk = 2.0, 0.1, 10, 70, 1024
n_pad = C._bucket(n, row_chunk)
t0 = time.perf_counter()
order, x, p, valid, need = C._dbscan_prep(xyz, ppm, n_pad, radius, row_chunk)
print(f"host prep: {(time.perf_counter()-t0)*1e3:.1f} ms  n={n} n_pad={n_pad} need={need}")
k = min(k_req, max(n - 1, 1))
w = C._window_width(need, k, row_chunk)
print(f"w={w} k={k}")

xj = jax.device_put(jnp.asarray(x))
vj = jax.device_put(jnp.asarray(valid))
pj = jax.device_put(jnp.asarray(p))
jax.block_until_ready(xj)


def timeit(name, fn, iters=5):
    out = fn()  # warm/compile
    s = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(jax.jit(lambda a: a.ravel()[:1])(s))
    t0 = time.perf_counter()
    outs = [fn() for _ in range(iters)]
    _ = [np.asarray(jax.jit(lambda a: a.ravel()[:1])(jax.tree_util.tree_leaves(o)[0]))
         for o in outs[-1:]]
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt*1e3:8.1f} ms", flush=True)
    return out


idx, d2 = timeit("knn_windowed", lambda: C._knn_windowed(xj, vj, k, row_chunk, w, float(radius)))
idx = jax.block_until_ready(idx)
d2 = jax.block_until_ready(d2)

timeit("cluster_from_knn (full, while)", lambda: C._cluster_from_knn(
    idx, d2, pj, vj, np.float32(radius * radius), np.float32(eps), min_samples))

r2 = np.float32(radius * radius)
epsf = np.float32(eps)


@jax.jit
def setup(idx, d2, pp, valid):
    n = idx.shape[0]
    kth_d2 = jnp.where(valid, jnp.max(jnp.where(jnp.isfinite(d2), d2, -1.0), axis=1), -1.0)
    packed = jax.lax.complex(kth_d2, pp)[idx]
    finite = jnp.isfinite(d2)
    mutual = finite & (d2 <= jnp.real(packed))
    within_r = finite & (d2 <= r2)
    pp_ok = jnp.abs(pp[:, None] - jnp.imag(packed)) <= epsf
    edge = mutual & within_r & pp_ok
    degree = edge.sum(axis=1)
    core = valid & ((degree + 1) >= min_samples)
    init = jnp.where(core, jnp.arange(n, dtype=jnp.int32), jnp.int32(n))
    return edge, core, init


edge, core, init = timeit("setup (packed gather + masks)", lambda: setup(idx, d2, pj, vj))
edge, core, init = jax.block_until_ready((edge, core, init))


@jax.jit
def one_round(labels, edge, core, idx):
    n = labels.shape[0]
    ext = jnp.concatenate([labels, jnp.int32(n)[None]])
    nbr = jnp.where(edge, ext[idx], jnp.int32(n))
    return jnp.where(core, jnp.minimum(labels, nbr.min(axis=1)), labels)


@jax.jit
def one_compress(labels):
    n = labels.shape[0]
    ext = jnp.concatenate([labels, jnp.int32(n)[None]])
    return jnp.minimum(labels, ext[labels])


@jax.jit
def changed(a, b):
    return jnp.any(a != b)


lab = timeit("one propagation round (N,k gather+min)", lambda: one_round(init, edge, core, idx), iters=10)
timeit("one compress pass (N gather)", lambda: one_compress(init), iters=10)
timeit("changed reduction", lambda: changed(init, init), iters=10)

# count actual outer/inner iterations on this data
lab = init
outer = inner_total = 0
while True:
    new = one_round(lab, edge, core, idx)
    while True:
        c = one_compress(new)
        inner_total += 1
        if not bool(changed(c, new)):
            break
        new = c
    outer += 1
    if not bool(changed(new, lab)):
        break
    lab = new
print(f"outer rounds: {outer}, total compress passes: {inner_total}")

# dispatch/sync overhead of the relay for a trivial op
@jax.jit
def triv(a):
    return a + 1


timeit("trivial dispatch (relay floor)", lambda: triv(init), iters=10)
