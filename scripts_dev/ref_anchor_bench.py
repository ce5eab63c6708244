"""Dev: same-host reference-vs-ours forward timing (VERDICT r2 item 9).

BASELINE.md's 12.5 scans/s anchor is a literature figure (the reference
repo publishes no numbers and its GPU stack can't run here). This script
produces the one measurable bound this image allows: the reference's OWN
torch PointRCNN forward (CPU, CUDA exts backed by tests/ref_shims.py) vs
our JAX forward on the SAME CPU and identical scenes.

The shim time (python/numpy point-ops standing in for the reference's
CUDA kernels) is measured separately and reported, so the NN-only ratio
can be read alongside the end-to-end one.

Usage: PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=cpu \
    python scripts_dev/ref_anchor_bench.py [--scenes 6]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--scenes", type=int, default=6)
args = parser.parse_args()

import jax

jax.config.update("jax_platforms", "cpu")

import ref_shims
import test_reference_parity_model as T


class _Req:
    """Minimal pytest-fixture driver: run the module fixtures by hand."""


def main():
    import torch

    ref_gen = T.ref_model.__wrapped__()
    ref = next(ref_gen)
    rng = np.random.RandomState(3)
    scenes = [T._synth_scene(rng) for _ in range(args.scenes)]

    # --- shim overhead probe: wrap the installed shim entry points ---
    shim_time = {"t": 0.0}
    import pcdet.ops.pointnet2.pointnet2_batch.pointnet2_batch_cuda as pnc
    import pcdet.ops.roipoint_pool3d.roipoint_pool3d_cuda as rpc
    import pcdet.ops.iou3d_nms.iou3d_nms_cuda as inc

    def timed(fn):
        def wrap(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            shim_time["t"] += time.perf_counter() - t0
            return out
        return wrap

    for mod in (pnc, rpc, inc):
        for name in dir(mod):
            if not name.startswith("_") and callable(getattr(mod, name)):
                setattr(mod, name, timed(getattr(mod, name)))

    # --- reference torch-CPU forward ---
    T._ref_forward(ref, scenes[:2])  # warm
    shim_time["t"] = 0.0
    t0 = time.perf_counter()
    for s0 in range(0, args.scenes, 2):
        T._ref_forward(ref, scenes[s0:s0 + 2])
    ref_dt = time.perf_counter() - t0
    ref_shim = shim_time["t"]

    # --- our JAX-CPU forward (exact ops, same weights) ---
    ours_gen = T.ours.__wrapped__(ref)
    ours = next(ours_gen)
    inp = [np.stack(scenes[s0:s0 + 2]) for s0 in range(0, args.scenes, 2)]
    r = ours.infer(inp[0])
    np.asarray(r["scores"])  # warm + compile
    t0 = time.perf_counter()
    for x in inp:
        r = ours.infer(x)
    np.asarray(r["scores"])
    our_dt = time.perf_counter() - t0

    n = args.scenes
    print(f"reference torch-CPU forward: {ref_dt / n * 1e3:8.1f} ms/scan "
          f"({n / ref_dt:.2f} scans/s; {ref_shim / ref_dt * 100:.0f}% in "
          f"python point-op shims)")
    print(f"ours JAX-CPU forward:        {our_dt / n * 1e3:8.1f} ms/scan "
          f"({n / our_dt:.2f} scans/s, exact ops)")
    print(f"NN-only reference estimate:  {(ref_dt - ref_shim) / n * 1e3:8.1f} "
          f"ms/scan (shim time excluded)")
    try:
        next(ref_gen)
    except StopIteration:
        pass


if __name__ == "__main__":
    main()
