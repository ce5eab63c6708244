"""Dev: stage split of generate_mask_for_frame on the real chip."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from modest_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
from bench_pipeline import synth_frame  # noqa: E402

from modest_tpu.pipeline.clustering import dbscan_pp
from modest_tpu.pipeline.ground_plane import above_plane, estimate_plane
from modest_tpu.pipeline.seed_labels import filter_labels
from modest_tpu.pipeline.box_fit import fit_objs_batched

rng = np.random.RandomState(0)
ptc = synth_frame(rng)
pp = rng.uniform(0, 1, len(ptc)).astype(np.float32)
# make object points clearly ephemeral so clusters form
pp[60000:60000 + 12 * 800] *= 0.3


def timeit(name, fn, warm=1, iters=5):
    for _ in range(warm):
        out = fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:38s} {dt*1e3:8.1f} ms", flush=True)
    return out


plane = timeit("estimate_plane", lambda: estimate_plane(
    ptc[:, :3], max_hs=-1.5, ptc_range=((-70, 70), (-20, 40))))
mask = timeit("above_plane + range mask", lambda: above_plane(
    ptc[:, :3], plane, offset=0.05, only_range=((-70, 70), (-20, 40)))
    & (np.abs(ptc[:, 0]) < 70) & (np.abs(ptc[:, 1]) < 40))
print(f"in-mask points: {mask.sum()}", flush=True)

labels = timeit("dbscan_pp", lambda: dbscan_pp(
    ptc[mask, :3], pp[mask], n_neighbors=70, radius=2.0, eps=0.1,
    min_samples=10))

full = np.full(len(ptc), -1, np.int64)
full[mask] = labels
compact = timeit("filter_labels (2nd plane + loops)", lambda: filter_labels(
    ptc, pp, full))

n_cl = int(compact.max())
print(f"clusters: {n_cl}", flush=True)
timeit("fit_objs_batched", lambda: list(fit_objs_batched(
    ptc[:, :3], compact, n_cl, fit_method="closeness_to_edge")))
