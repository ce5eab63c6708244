"""Dev: stage split of pp_score_for_frame_cached on the real chip
(VERDICT r2 item 8).

Splits one origin-frame PP-score pass into: host pose/assembly, origin
cloud transform+pad, query upload, device radius count (sorted-window
Pallas kernel), counts download, host entropy — so the 6.5 scans/s wall
is attributed to compute vs relay transfers vs host work.
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

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
from bench_pipeline import synth_frame  # noqa: E402

from modest_tpu.ops.pallas_radius_count import BN
from modest_tpu.pipeline.pp_score import (
    DeviceFrameCache,
    _sorted_pool_counts,
    compute_ephe_score,
)

TRAVERSALS, FRAMES_PER_TRAV = 5, 8
rng = np.random.RandomState(0)


def timeit(name, fn, warm=2, iters=8):
    for _ in range(warm):
        out = fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    print(f"{name:44s} {(time.perf_counter()-t0)/iters*1e3:8.1f} ms", flush=True)
    return out


frames_np = {}
for g in range(TRAVERSALS * FRAMES_PER_TRAV):
    frames_np[g] = synth_frame(rng).astype(np.float32)

cache = DeviceFrameCache(lambda g: frames_np[g])
for g in frames_np:
    cache.frame(g)

f = TRAVERSALS * FRAMES_PER_TRAV
frames = jnp.stack([cache.frame(g)[0] for g in range(f)])
fmask = jnp.stack([cache.frame(g)[1] for g in range(f)])
rot = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (f, 1, 1)))
trans = jnp.asarray(rng.randn(f, 3).astype(np.float32) * 0.1)

origin = synth_frame(rng).astype(np.float32)
n = len(origin)
n_pad = max(BN, ((n + BN - 1) // BN) * BN)
print(f"origin n={n} n_pad={n_pad}, pool={f} frames x {frames.shape[1]} pts")

q_np = np.full((n_pad, 3), 1e9, np.float32)
q_np[:n] = origin[:, :3]

# --- stage: query upload (host->device through the relay) ---
timeit("query upload (device_put + ready)",
       lambda: jax.device_put(q_np).block_until_ready())
q_dev = jax.device_put(q_np)

# --- stage: device radius count, result left ON device ---


def count_only():
    c = _sorted_pool_counts(q_dev, frames, fmask, rot, trans,
                            np.float32(0.3), t_count=TRAVERSALS,
                            fmax=FRAMES_PER_TRAV)
    c.block_until_ready()
    return c


counts_dev = timeit("device radius count (no download)", count_only)

# --- stage: counts download ---
timeit("counts download (N x T int32)", lambda: np.asarray(counts_dev))
counts = np.asarray(counts_dev)[:n]

# --- stage: host entropy ---
timeit("host entropy (compute_ephe_score)",
       lambda: compute_ephe_score(counts))

# --- end-to-end (upload + count + download + entropy) ---


def full():
    c = _sorted_pool_counts(jax.device_put(q_np), frames, fmask, rot, trans,
                            np.float32(0.3), t_count=TRAVERSALS,
                            fmax=FRAMES_PER_TRAV)
    return compute_ephe_score(np.asarray(c)[:n])


timeit("end-to-end per frame", full)
