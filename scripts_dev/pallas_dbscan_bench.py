"""Dev: compile + validate + bench the Pallas DBSCAN on the real chip."""
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
from modest_tpu.ops import pallas_dbscan as PD

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
radius, eps, min_samples, k_req, row_chunk = 2.0, 0.1, 10, 70, 1024

rng = np.random.RandomState(0)
frames = []
for i in range(B):
    ptc = synth_frame(np.random.RandomState(i))
    pp = np.random.RandomState(100 + i).uniform(0, 1, len(ptc)).astype(np.float32)
    pp[60000:60000 + 12 * 800] *= 0.3
    plane = estimate_plane(ptc[:, :3], max_hs=-1.5, ptc_range=((-70, 70), (-20, 40)))
    mask = (above_plane(ptc[:, :3], plane, offset=0.05,
                        only_range=((-70, 70), (-20, 40)))
            & (np.abs(ptc[:, 0]) < 70) & (np.abs(ptc[:, 1]) < 40))
    frames.append((ptc[mask, :3], pp[mask]))

ns = [len(f[0]) for f in frames]
n_max = max(ns)
n_pad = C._bucket(n_max, row_chunk)
print(f"ns={ns} n_pad={n_pad}")

preps = [C._dbscan_prep(x, p, n_pad, radius, row_chunk) for x, p in frames]
k = min(k_req, max(n_max - 1, 1))
w_knn = C._window_width(max(pr[4] for pr in preps), k, row_chunk)

xb = jnp.asarray(np.stack([pr[1] for pr in preps]))
pb = jnp.asarray(np.stack([pr[2] for pr in preps]))
vb = jnp.asarray(np.stack([pr[3] for pr in preps]))

los, ws = [], []
for pr in preps:
    lo, w = PD.window_rows(pr[1][:, 0], n_pad, radius)
    los.append(lo)
    ws.append(w)
w = max(ws)
lob = jnp.asarray(np.minimum(np.stack(los), n_pad // 128 - w // 128))
print(f"knn window={w_knn} prop window={w}")

t0 = time.perf_counter()
idx, d2 = C._knn_windowed_batch(xb, vb, k, row_chunk, w_knn, float(radius))
idx, d2 = jax.block_until_ready((idx, d2))
print(f"knn compile+run {time.perf_counter()-t0:.1f}s")

t0 = time.perf_counter()
packed = np.asarray(PD._dbscan_device(
    pb, vb, lob, idx, d2, n_pad=n_pad, w=w,
    min_samples=min_samples, eps=float(eps), radius2=float(radius * radius),
    rounds=12))
print(f"pallas dbscan compile+run {time.perf_counter()-t0:.1f}s "
      f"changed={bool(packed.flat[0] & 1)}")

# validate vs the XLA path
labels_h = packed >> 2
core_h = ((packed >> 1) & 1).astype(bool)
ok = True
for i in range(B):
    ref_raw, ref_core = C._cluster_from_knn(
        idx[i], d2[i], pb[i], vb[i], np.float32(radius * radius),
        np.float32(eps), min_samples)
    ref_raw = np.asarray(ref_raw)
    got = np.where(labels_h[i] >= n_pad, -1, labels_h[i])
    want = np.where(ref_raw >= n_pad, -1, ref_raw)
    if not np.array_equal(got, want):
        bad = np.flatnonzero(got != want)
        print(f"frame {i}: MISMATCH {len(bad)} pts, first {bad[:10]}")
        print("  got ", got[bad[:10]])
        print("  want", want[bad[:10]])
        ok = False
    if not np.array_equal(core_h[i], np.asarray(ref_core)):
        print(f"frame {i}: core mismatch")
        ok = False
print("exact match:", ok)


def timeit(name, fn, iters=5):
    out = fn()
    s = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(jax.jit(lambda a: a.ravel()[:1])(s))
    t0 = time.perf_counter()
    outs = [fn() for _ in range(iters)]
    _ = np.asarray(jax.jit(lambda a: a.ravel()[:1])(
        jax.tree_util.tree_leaves(outs[-1])[0]))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1e3:8.1f} ms  ({dt*1e3/B:6.1f} ms/frame)")


timeit("knn_windowed_batch", lambda: C._knn_windowed_batch(
    xb, vb, k, row_chunk, w_knn, float(radius)))
timeit("pallas dbscan (edge+prop+border)", lambda: PD._dbscan_device(
    pb, vb, lob, idx, d2, n_pad=n_pad, w=w, min_samples=min_samples,
    eps=float(eps), radius2=float(radius * radius), rounds=12))
timeit("XLA cluster_from_knn (old)", lambda: C._cluster_from_knn_batch(
    idx, d2, pb, vb, np.float32(radius * radius), np.float32(eps),
    min_samples))
