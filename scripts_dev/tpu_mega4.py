"""Dev: round-5 final chip queue (one claim; see tpu_mega1.py).

  1. seed-gen rates with steady-state warm (mega3 found 1.75 s/frame of
     first-touch bucket cache loads inside the 3-frame timed loop; stage
     sum is 233 ms/frame)
  2. micro-batched B=16 serving: two back-to-back B=8 dispatches —
     the B>8 XLA superlinearity (proposal NMS 9.6x, RoI tower 3.3x at 2x
     batch) lives above the B=8 program, so serving splits the batch at
     the dispatch level
  3. trained AP parity at 600 steps (at 300 steps the IoU0.5 delta read
     -1.77 vs +0.20 at IoU0.7 — threshold noise on a half-trained model?)
  4. headline B=4 re-confirm

Usage: timeout 10800 python scripts_dev/tpu_mega4.py [steps...]
"""
import json
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

from modest_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

_SAVED_ARGV = sys.argv
sys.argv = ["tpu_mega1.py", "none"]
try:
    from tpu_mega1 import wait_healthy
finally:
    sys.argv = _SAVED_ARGV

STEPS = sys.argv[1:] or ["1", "2", "3", "4", "5"]
_CANARIED = []


def step(tag):
    def deco(fn):
        if tag in STEPS:
            if not _CANARIED:
                _CANARIED.append(True)
                wait_healthy()
            print(f"\nMEGA4: ==== step {tag}: {fn.__name__} ====", flush=True)
            t0 = time.time()
            try:
                fn()
                print(f"MEGA4: step {tag} done in {time.time() - t0:.0f}s",
                      flush=True)
            except Exception:
                traceback.print_exc()
                print(f"MEGA4: step {tag} FAILED", flush=True)
        return fn
    return deco


def _run_path(script, argv):
    import runpy

    saved = sys.argv
    sys.argv = argv
    try:
        runpy.run_path(str(Path(__file__).resolve().parent / script),
                       run_name="__main__")
    except SystemExit as e:
        if e.code not in (0, None):
            raise
    finally:
        sys.argv = saved


@step("1")
def seed_gen_steady_state():
    import bench_pipeline as bp

    rng = np.random.RandomState(0)
    bp.bench_seed_gen(rng, frames=3)


@step("2")
def microbatched_b16():
    saved = sys.argv
    sys.argv = ["tpu_mega2.py", "none"]  # keep its @step decorators inert
    try:
        from tpu_mega2 import _flagship_model, _scene_batch
    finally:
        sys.argv = saved
    from modest_tpu.models.pointrcnn import post_process

    cfg, model = _flagship_model()
    rng = np.random.RandomState(0)
    points, gt = _scene_batch(rng, 8)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)},
        jnp.asarray(points), jnp.asarray(gt), train=True)

    @jax.jit
    def infer(variables, pts):
        out = model.apply(variables, pts, train=False)
        final = post_process(out, cfg.MODEL.POST_PROCESSING)
        return final["boxes"], final["scores"], final["valid"]

    # a "B=16 request" = two B=8 micro-batches enqueued back-to-back
    iters = 10
    inputs = [
        (jnp.asarray(points + rng.randn(*points.shape).astype(np.float32) * 0.01),
         jnp.asarray(points + rng.randn(*points.shape).astype(np.float32) * 0.01))
        for _ in range(iters)
    ]
    for _ in range(2):
        r1 = infer(variables, inputs[0][0])
        r2 = infer(variables, inputs[0][1])
        np.asarray(r2[1])
    t0 = time.perf_counter()
    r2 = None
    for i in range(iters):
        r1 = infer(variables, inputs[i][0])  # noqa: F841
        r2 = infer(variables, inputs[i][1])
        if (i + 1) % 5 == 0:
            np.asarray(r2[1])
    np.asarray(r2[1])
    dt = time.perf_counter() - t0
    print("MEGA4: " + json.dumps({
        "metric": "pointrcnn_inference_scans_per_sec_per_chip_B16_microbatched",
        "value": round(16 * iters / dt, 3), "unit": "scans/s",
        "detail": "2 x B=8 dispatches per request"}), flush=True)


@step("3")
def ap_parity_600():
    _run_path("exact_ab_check.py",
              ["exact_ab_check.py", "--scenes", "200", "--train-steps", "600"])


@step("4")
def headline_b4():
    # tpu_mega2 may already be imported (step 2) — reload so its @step
    # decorators re-fire with argv selecting only its step 1 (headline B=4)
    import importlib

    saved = sys.argv
    sys.argv = ["tpu_mega2.py", "1"]
    try:
        if "tpu_mega2" in sys.modules:
            importlib.reload(sys.modules["tpu_mega2"])
        else:
            import tpu_mega2  # noqa: F401
    finally:
        sys.argv = saved


@step("5")
def pp_q16_pipelined():
    """The CLI's operating point: 2 origins in flight on the q16 upload
    path (pre_compute_pp_score pipeline_workers=2 + uint16 transport)."""
    import concurrent.futures as cf

    import bench_pipeline as bp
    from modest_tpu.ops.pallas_radius_count import BN
    from modest_tpu.pipeline import pp_score as pp

    rng = np.random.RandomState(0)
    traversals, fpt = 5, 8
    n0 = bp.synth_frame(rng).shape[0]
    m_pad = 1 << (n0 - 1).bit_length()
    frames = np.zeros((traversals * fpt, m_pad, 3), np.float32)
    fmask = np.zeros((traversals * fpt, m_pad), bool)
    for i in range(traversals * fpt):
        p = bp.synth_frame(rng)
        frames[i, : len(p)] = p
        fmask[i, : len(p)] = True
    frames_d = jax.device_put(frames)
    fmask_d = jax.device_put(fmask)
    rot = jnp.asarray(np.tile(np.eye(3, dtype=np.float32),
                              (traversals * fpt, 1, 1)))
    trans = jnp.asarray(rng.randn(traversals * fpt, 3).astype(np.float32) * 0.1)
    r = np.float32(0.3)
    origins = [bp.synth_frame(rng) for _ in range(6)]

    def run_q16(o):
        n = len(o)
        n_pad = ((n + BN - 1) // BN) * BN
        qi, off = pp.quantize_queries_u16(o.astype(np.float32), n_pad)
        c = pp._sorted_pool_counts_q16(
            jnp.asarray(qi), jnp.asarray(off), jnp.int32(n), frames_d,
            fmask_d, rot, trans, r, t_count=traversals, fmax=fpt)
        return pp.compute_ephe_score(np.asarray(c)[:n])

    run_q16(origins[0])  # compile/warm
    many = origins * 3
    with cf.ThreadPoolExecutor(2) as pool:
        t0 = time.perf_counter()
        list(pool.map(run_q16, many))
        dt = time.perf_counter() - t0
    print("MEGA4: " + json.dumps({
        "metric": "pp_score_q16_pipelined_scans_per_sec",
        "value": round(len(many) / dt, 3), "unit": "scans/s",
        "detail": "uint16 query upload + entropy, 2 origins in flight"}),
        flush=True)


if __name__ == "__main__":
    print("MEGA4: all requested steps attempted", flush=True)
