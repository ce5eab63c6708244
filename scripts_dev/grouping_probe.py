"""Dev: isolate the cost of the SA-level dist+topk and FP three_nn on chip.

Decides whether a fused Pallas dist+topk kernel is worth building: if
pairwise_dist2 + nearest_topk at SA1 shapes (B,4096,12288 k=32) and
three_nn at FP0 shapes (B,12288,4096 k=3) are a small share of the train
step, the fusion target moves elsewhere.
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
xyz = jnp.asarray(rng.uniform(0, 70, (B, 12288, 3)).astype(np.float32))
new_xyz = jnp.asarray(rng.uniform(0, 70, (B, 4096, 3)).astype(np.float32))
feats = jnp.asarray(rng.randn(B, 4096, 256).astype(np.float32))


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
    print(f"{name:44s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms", flush=True)


timeit("SA1 pairwise_dist2 (4096x12288)", p2.pairwise_dist2, new_xyz, xyz)
timeit("SA1 dist2 + nearest_topk k=32",
       lambda a, b: p2.nearest_topk(p2.pairwise_dist2(a, b), 32), new_xyz, xyz)
timeit("SA1 dist2 + topk + nearest_group k=32",
       lambda a, b: p2.nearest_group(
           b, a, None, *p2.nearest_topk(p2.pairwise_dist2(a, b), 32),
           0.5, 32), new_xyz, xyz)
timeit("FP0 three_nn (12288 from 4096)", p2.three_nn, xyz, new_xyz)
timeit("FP0 interpolate_features (256ch)",
       p2.interpolate_features, xyz, new_xyz, feats)
timeit("FPS 4096/12288 (pallas)",
       lambda a: p2.furthest_point_sample(a, 4096), xyz)
