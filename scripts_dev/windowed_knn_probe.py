"""Dev: per-piece timing of the windowed nearest-k path at SA1 shape."""
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

B, M, N, K, R, W = 4, 4096, 12288, 32, 0.5, 2048
rng = np.random.RandomState(0)
xyz = jnp.asarray(rng.uniform([0, -40, -2], [80, 40, 1], (B, N, 3)).astype(np.float32))
new_xyz = jnp.asarray(rng.uniform([0, -40, -2], [80, 40, 1], (B, M, 3)).astype(np.float32))


def timeit(name, fn, *args, iters=20):
    jitted = jax.jit(lambda *a: jax.tree.map(jnp.sum, fn(*a)))
    out = jitted(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for i in range(iters):
        out = jitted(*args)
    np.asarray(jax.tree.leaves(out)[0])
    print(f"{name:56s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms", flush=True)


timeit("noop (dispatch floor): x+1", lambda a: a + 1, xyz)
timeit("argsort N=12288 keys", lambda a: jnp.argsort(a[..., 0], axis=-1), xyz)
timeit("lax.sort (keys+3payload) N=12288",
       lambda a: jax.lax.sort((a[..., 0], a[..., 1], a[..., 2],
                               jax.lax.broadcasted_iota(jnp.int32, a.shape[:2], 1)),
                              dimension=-1, num_keys=1), xyz)
timeit("argsort M=4096 centers", lambda c: jnp.argsort(c[..., 0], axis=-1), new_xyz)
timeit("sort+take cloud (B,N,3)",
       lambda a: jnp.take_along_axis(
           a, jnp.argsort(a[..., 0], axis=-1)[..., None], axis=1), xyz)
timeit("cand gather (B, 32*2048, 3)",
       lambda a: jnp.take_along_axis(
           a, (jnp.arange(32 * W, dtype=jnp.int32) % N)[None, :, None], axis=1), xyz)


def d2_topk_windowed(q, c):
    # q: (B, 32, 128, 3) fake chunked centers; c: (B, 32, W, 3)
    diff = q[:, :, :, None, :] - c[:, :, None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    neg, idx = jax.lax.approx_max_k(-d2, K, recall_target=0.95)
    return neg, idx


qf = new_xyz.reshape(B, 32, 128, 3)
cf = jnp.broadcast_to(xyz[:, None, :W, :], (B, 32, W, 3))
cf = cf + 0.0  # materialize
timeit("windowed d2+topk (B,32,128,2048)", d2_topk_windowed, qf, cf)
timeit("dense d2+topk (B,4096,12288)",
       lambda a, b: p2.nearest_topk(p2.pairwise_dist2(a, b), K), new_xyz, xyz)
timeit("FULL windowed nearest_neighbors",
       lambda a, b: p2._windowed_nearest(a, b, K, R), new_xyz, xyz)
