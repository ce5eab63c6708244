"""Dev check: new 3D-layout Pallas FPS vs XLA reference — exactness + timing."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from modest_tpu.ops.pallas_fps import furthest_point_sample_pallas
from modest_tpu.ops.pointnet2 import _furthest_point_sample_xla

rng = np.random.RandomState(0)
for b, n, npoint in [(4, 12288, 4096), (4, 4096, 1024), (4, 1024, 256)]:
    pts = rng.uniform(-40, 40, (b, n, 3)).astype(np.float32)
    pts = jnp.asarray(pts)
    got = np.asarray(furthest_point_sample_pallas(pts, npoint))
    want = np.asarray(_furthest_point_sample_xla(pts, npoint))
    match = (got == want).all()
    print(f"B={b} N={n} np={npoint}: exact={match}", flush=True)
    if not match:
        bad = np.argwhere(got != want)[:5]
        print("  first mismatches:", bad, got[tuple(bad[0])], want[tuple(bad[0])])
    # timing
    f = jax.jit(lambda p: furthest_point_sample_pallas(p, npoint))
    f(pts).block_until_ready()
    t0 = time.perf_counter()
    iters = 20
    for _ in range(iters):
        r = f(pts)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    print(f"  pallas: {dt*1e3:.2f} ms", flush=True)
