"""Dev: on-chip recall check + bench of the windowed nearest-k path.

Correctness on real TPU (CPU equality is covered in tests): recall of
nearest_neighbors (x-sorted windows + hardware approx top-k) against the
exact dense k-nearest, restricted to in-radius neighbors — the only ones
the grouping consumers keep. Must sit at/above the 0.95 recall target the
dense approx path already runs at.

Bench: SA1/SA2-shaped dense dist+topk vs windowed path.

A Pallas bf16 d2 kernel was benched here first and measured a WASH
(dense dist2+topk 10.28 ms vs 10.34 fused at SA1): XLA fuses the diff-form
d2 into approx_max_k's input, so the matrix never round-trips HBM and
halving its bytes buys nothing — candidate PRUNING is what pays.
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

from modest_tpu.ops import pointnet2 as p2

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
rng = np.random.RandomState(0)


def synth_cloud(b, n):
    """Lidar-like: uniform background + dense car-size clusters."""
    pts = rng.uniform([0, -40, -2], [80, 40, 1], (b, n, 3)).astype(np.float32)
    for bi in range(b):
        for k in range(12):
            c = rng.uniform([5, -30, -1.6], [70, 30, -1.4])
            sl = slice(k * (n // 40), k * (n // 40) + n // 40)
            pts[bi, sl] = c + rng.uniform(-1, 1, (n // 40, 3)) * [2, 0.9, 0.7]
    return pts


def centers_from(pts, m):
    sel = np.stack([rng.choice(pts.shape[1], m, replace=False)
                    for _ in range(pts.shape[0])])
    return np.take_along_axis(pts, sel[..., None], axis=1)


def timeit(name, fn, *args, iters=10):
    jitted = jax.jit(lambda *a: jax.tree.map(jnp.sum, fn(*a)))
    out = jitted(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for i in range(iters):
        out = jitted(*args)
        if (i + 1) % 5 == 0:
            np.asarray(jax.tree.leaves(out)[0])
    np.asarray(jax.tree.leaves(out)[0])
    print(f"{name:52s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms", flush=True)


for (m, n, k, r, tag) in [(4096, 12288, 32, 0.5, "SA1"),
                          (1024, 4096, 32, 1.0, "SA2")]:
    xyz = jnp.asarray(synth_cloud(B, n))
    new_xyz = jnp.asarray(centers_from(np.asarray(xyz), m))

    # --- in-radius recall vs exact dense k-NN, on chip ---
    td2, idx = jax.jit(
        lambda a, b_: p2.nearest_neighbors(a, b_, k, radius=r))(new_xyz, xyz)
    td2, idx = np.asarray(td2), np.asarray(idx)
    d2 = np.asarray(p2.pairwise_dist2(new_xyz, xyz))
    exact_idx = np.argsort(d2, axis=-1, kind="stable")[..., :k]
    exact_d2 = np.take_along_axis(d2, exact_idx, -1)
    r2 = r * r
    hits = total = 0
    for bi in range(B):
        for ci in range(0, m, 17):
            want = set(exact_idx[bi, ci][exact_d2[bi, ci] < r2].tolist())
            got = set(idx[bi, ci][td2[bi, ci] < r2].tolist())
            hits += len(want & got)
            total += len(want)
    print(f"{tag} in-radius recall vs exact {k}-NN: {hits / max(total, 1):.4f} "
          f"({total} in-radius neighbors sampled)")
    assert hits / max(total, 1) >= 0.95

    timeit(f"{tag} dense f32 dist2 + approx topk k={k} ({m}x{n})",
           lambda a, b_: p2.nearest_topk(p2.pairwise_dist2(a, b_), k),
           new_xyz, xyz)
    timeit(f"{tag} windowed nearest_neighbors k={k} r={r}",
           lambda a, b_: p2.nearest_neighbors(a, b_, k, radius=r),
           new_xyz, xyz)
