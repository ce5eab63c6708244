"""Dev: on-chip correctness + timing of the Pallas windowed kNN kernel
(ops/pallas_knn.py) at the flagship's production shapes.

Correctness: winners vs the dense exact path (lax.top_k over
pairwise_dist2) — in-radius prefix must match to the packed-ranking
quantum; the coverage certificate must hold on realistic clouds.
Timing: vs the dense d²+approx_max_k path the backbone uses today.

Usage: python scripts_dev/pallas_knn_bench.py [B]
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

from modest_tpu.ops import pallas_knn as pk
from modest_tpu.ops import pointnet2 as p2

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
rng = np.random.RandomState(0)


def make_cloud(n):
    """Lyft-like non-uniform density: heavier near-field."""
    x = np.abs(rng.standard_normal((B, n)) * 25) + 1
    y = rng.standard_normal((B, n)) * 18
    z = rng.uniform(-2, 1, (B, n))
    return np.stack([x, y, z], -1).astype(np.float32)


def timeit(name, fn, *args, iters=20):
    jitted = jax.jit(lambda *a: jax.tree.map(jnp.sum, fn(*a)))
    out = jitted(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jitted(*args)
    np.asarray(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:52s} {dt:8.2f} ms", flush=True)
    return dt


SHAPES = [  # (tag, M, N, k, radius)
    ("SA1 4096<-12288 k=32 r=0.5", 4096, 12288, 32, 0.5),
    ("SA2 1024<-4096  k=32 r=1.0", 1024, 4096, 32, 1.0),
    ("FP0 12288<-4096 k=3 (3nn)", 12288, 4096, 3, None),
    ("FP1 4096<-1024  k=3 (3nn)", 4096, 1024, 3, None),
]

for tag, m, n, k, radius in SHAPES:
    xyz = make_cloud(n)
    if m <= n:
        new_xyz = np.take_along_axis(
            xyz, rng.choice(n, (B, m, 1), replace=True).astype(np.int64), 1)
    else:
        new_xyz = make_cloud(m)
    xyz_d, new_d = jnp.asarray(xyz), jnp.asarray(new_xyz)

    if not pk.knn_supported(m, n, k):
        print(f"{tag}: UNSUPPORTED shape, skipped")
        continue

    # ---- correctness vs dense exact ----
    w = pk._pick_window(n)
    td2, idx, ok = jax.jit(
        lambda a, b: pk._prep_and_run(a, b, k, w, radius=radius))(new_d, xyz_d)
    td2, idx, ok = np.asarray(td2), np.asarray(idx), bool(np.asarray(ok))
    ed2, eidx = jax.lax.top_k(-p2.pairwise_dist2(new_d, xyz_d), k)
    ed2 = np.asarray(-ed2)
    r2 = (radius * radius) if radius is not None else np.inf
    mask = ed2 < min(r2, 1e30)
    match = np.isclose(np.where(mask, td2, 0), np.where(mask, ed2, 0),
                       rtol=3e-3, atol=1e-5)
    print(f"{tag}: cert={'OK' if ok else 'FAIL->dense'}  "
          f"in-criterion slot match {match.mean()*100:.3f}%")

    # ---- timing ----
    t_pal = timeit(f"  pallas windowed (w={w})",
                   lambda a, b: pk._prep_and_run(a, b, k, w, radius=radius),
                   new_d, xyz_d)
    t_den = timeit("  dense d2 + approx topk",
                   lambda a, b: p2.nearest_topk(p2.pairwise_dist2(a, b), k),
                   new_d, xyz_d)
    print(f"  speedup {t_den / t_pal:.2f}x")
