"""Dev: serialized one-process TPU measurement queue (round 5).

One chip claim for all of round 5's on-chip work (the axon relay wedges on
rapid claim cycling — see tpu_mega1.py):

  1. headline B=4 inference (validates the compact_select revert ≥ 58
     scans/s + quality gate, VERDICT item 1)
  2. B=8 / B=16 sweep + stage split at both batches (item 6 diagnosis)
  3. train stage wall at B=8 (pool stage after the revert, item 1 done-check)
  4. single vs K=8 multi-step train throughput at B=8 (item 3 target:
     >= 41 train scans/s/chip)
  5. exact-vs-approx A/B with AP-level parity at 200 scenes (item 7)
  6. seed-gen rates after the host-work cuts (item 4)
  7. PP-score q16 vs f32 query upload A/B (item 5)
  8. SA-candidate-reuse probe: gather SA2's d2 entries out of SA1's matrix
     vs recomputing the matmul (item 3 — evidence for the design decision)

Usage: timeout 10800 python scripts_dev/tpu_mega2.py [steps...]
"""
import json
import os
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

from modest_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

# tpu_mega1's @step decorators fire at import based on sys.argv — neutralize
# them while importing its helpers (canary + multi-step bench)
_SAVED_ARGV = sys.argv
sys.argv = ["tpu_mega1.py", "none"]
try:
    from tpu_mega1 import multi_step_train_throughput, wait_healthy
finally:
    sys.argv = _SAVED_ARGV

STEPS = sys.argv[1:] or ["1", "2", "3", "4", "5", "6", "7", "8"]
_CANARIED = []


def banner(msg):
    print(f"\nMEGA2: ==== {msg} ====", flush=True)


def step(tag):
    def deco(fn):
        if tag in STEPS:
            if not _CANARIED:
                _CANARIED.append(True)
                wait_healthy()
            banner(f"step {tag}: {fn.__name__}")
            t0 = time.time()
            try:
                fn()
                print(f"MEGA2: step {tag} done in {time.time() - t0:.0f}s",
                      flush=True)
            except Exception:
                traceback.print_exc()
                print(f"MEGA2: step {tag} FAILED", flush=True)
        return fn
    return deco


def _scene_batch(rng, batch, n=12288):
    points = rng.uniform(0, 1, (batch, n, 4)).astype(np.float32)
    points[..., 0] *= 80
    points[..., 1] = (points[..., 1] - 0.5) * 80
    points[..., 2] = (points[..., 2] - 0.5) * 3 - 0.5
    for b in range(batch):
        for k in range(10):
            c = rng.uniform([5, -30, -1.6], [70, 30, -1.4])
            sl = slice(k * 300, (k + 1) * 300)
            points[b, sl, :3] = c + rng.uniform(-1, 1, (300, 3)) * [2, 0.9, 0.7]
    gt = np.zeros((batch, 8, 8), np.float32)
    gt[:, 0, :7] = [10, 0, -1.5, 4, 2, 1.6, 0.3]
    gt[:, 0, 7] = 1
    return points, gt


def _flagship_model():
    from modest_tpu.models.pointrcnn import PointRCNN
    from modest_tpu.utils.config import cfg_from_yaml_file

    cfg = cfg_from_yaml_file("configs/models/lyft_models/pointrcnn_dynamic_obj.yaml")
    return cfg, PointRCNN(model_cfg=cfg.MODEL, num_class=len(cfg.CLASS_NAMES))


def _pipelined_rate(infer, variables, inputs, iters, batch):
    for _ in range(2):
        r = infer(variables, inputs[0])
        np.asarray(r[1])
    t0 = time.perf_counter()
    r = None
    for i in range(iters):
        r = infer(variables, inputs[i])
        if (i + 1) % 5 == 0:
            np.asarray(r[1])
    np.asarray(r[1])
    dt = time.perf_counter() - t0
    return batch * iters / dt


@step("1")
def headline_b4():
    from modest_tpu.models.pointrcnn import post_process

    cfg, model = _flagship_model()
    rng = np.random.RandomState(0)
    points, gt = _scene_batch(rng, 4)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)},
        jnp.asarray(points), jnp.asarray(gt), train=True)

    @jax.jit
    def infer(variables, pts):
        out = model.apply(variables, pts, train=False)
        final = post_process(out, cfg.MODEL.POST_PROCESSING)
        return final["boxes"], final["scores"], final["valid"]

    iters = 10
    inputs = [jnp.asarray(points + rng.randn(*points.shape).astype(np.float32) * 0.01)
              for _ in range(iters)]
    rate = _pipelined_rate(infer, variables, inputs, iters, 4)
    print("MEGA2: " + json.dumps({
        "metric": "pointrcnn_inference_scans_per_sec_per_chip",
        "value": round(rate, 3), "unit": "scans/s", "batch": 4}), flush=True)
    if rate < 52.4:
        print(f"MEGA2: WARNING headline {rate:.1f} < perf-gate floor 52.4",
              flush=True)


@step("2")
def batch_sweep_and_stage_split():
    from modest_tpu.models.pointnet2_backbone import PointNet2MSG
    from modest_tpu.models.pointrcnn import post_process

    cfg, model = _flagship_model()
    bb_cfg = cfg.MODEL.BACKBONE_3D
    bb = PointNet2MSG(
        sa_npoints=tuple(bb_cfg.SA_CONFIG.NPOINTS),
        sa_radii=tuple(tuple(r) for r in bb_cfg.SA_CONFIG.RADIUS),
        sa_nsamples=tuple(tuple(s) for s in bb_cfg.SA_CONFIG.NSAMPLE),
        sa_mlps=tuple(tuple(tuple(c) for c in m) for m in bb_cfg.SA_CONFIG.MLPS),
        fp_mlps=tuple(tuple(m) for m in bb_cfg.FP_MLPS),
    )
    for batch in (8, 16):
        rng = np.random.RandomState(0)
        points, gt = _scene_batch(rng, batch)
        pts = jnp.asarray(points)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)},
            pts, jnp.asarray(gt), train=True)

        @jax.jit
        def infer(variables, p):
            out = model.apply(variables, p, train=False)
            final = post_process(out, cfg.MODEL.POST_PROCESSING)
            return final["boxes"], final["scores"], final["valid"]

        iters = 10
        inputs = [jnp.asarray(points + rng.randn(*points.shape).astype(np.float32) * 0.01)
                  for _ in range(iters)]
        rate = _pipelined_rate(infer, variables, inputs, iters, batch)
        print("MEGA2: " + json.dumps({
            "metric": f"pointrcnn_inference_scans_per_sec_per_chip_B{batch}",
            "value": round(rate, 3), "unit": "scans/s"}), flush=True)

        # stage split: backbone-only vs full (the delta is proposals + NMS +
        # RoI head + post) — the B=16 collapse suspect list
        bb_vars = bb.init(jax.random.PRNGKey(0), pts)

        @jax.jit
        def bb_fwd(v, p):
            return bb.apply(v, p).sum()

        r = bb_fwd(bb_vars, pts)
        np.asarray(r)
        t0 = time.perf_counter()
        for i in range(iters):
            r = bb_fwd(bb_vars, inputs[i])
            if (i + 1) % 5 == 0:
                np.asarray(r)
        np.asarray(r)
        bb_dt = (time.perf_counter() - t0) / iters
        full_dt = batch / rate
        print(f"MEGA2: B={batch}: full {full_dt * 1e3:.1f} ms, backbone "
              f"{bb_dt * 1e3:.1f} ms, post-backbone "
              f"{(full_dt - bb_dt) * 1e3:.1f} ms "
              f"({(full_dt - bb_dt) / full_dt * 100:.0f}%)", flush=True)


@step("3")
def train_stage_wall_b8():
    import train_stage_wall as tsw

    saved = sys.argv
    sys.argv = ["train_stage_wall.py", "8"]
    try:
        tsw.main()
    finally:
        sys.argv = saved


@step("4")
def train_multi_step_b8():
    multi_step_train_throughput()


@step("5")
def ap_parity_200():
    import runpy

    saved = sys.argv
    sys.argv = ["exact_ab_check.py", "--scenes", "200"]
    try:
        runpy.run_path(str(Path(__file__).resolve().parent / "exact_ab_check.py"),
                       run_name="__main__")
    except SystemExit as e:
        if e.code not in (0, None):
            raise
    finally:
        sys.argv = saved


@step("6")
def seed_gen_rates():
    import bench_pipeline as bp

    rng = np.random.RandomState(0)
    bp.bench_seed_gen(rng, frames=3)


@step("7")
def pp_q16_ab():
    """q16 vs f32 query-upload A/B on the sorted-pool CLI path, realistic
    frame sizes (~92k query pts, 40 cached frames in 5 traversals)."""
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

    def run_f32(o):
        n = len(o)
        n_pad = ((n + BN - 1) // BN) * BN
        q = np.full((n_pad, 3), 1e9, np.float32)
        q[:n] = o
        c = pp._sorted_pool_counts(jnp.asarray(q), frames_d, fmask_d, rot,
                                   trans, r, t_count=traversals, fmax=fpt)
        return np.asarray(c)[:n]

    def run_q16(o):
        n = len(o)
        n_pad = ((n + BN - 1) // BN) * BN
        qi, off = pp.quantize_queries_u16(o.astype(np.float32), n_pad)
        c = pp._sorted_pool_counts_q16(
            jnp.asarray(qi), jnp.asarray(off), jnp.int32(n), frames_d,
            fmask_d, rot, trans, r, t_count=traversals, fmax=fpt)
        return np.asarray(c)[:n]

    a = run_f32(origins[0])
    b = run_q16(origins[0])  # also compiles
    diff = np.abs(a.astype(np.int64) - b.astype(np.int64))
    print(f"MEGA2: q16 counts vs f32: max |d| {diff.max()}, "
          f"frac>0 {(diff > 0).mean():.5f}", flush=True)
    for name, fn in (("f32", run_f32), ("q16", run_q16)):
        t0 = time.perf_counter()
        for o in origins:
            fn(o)
        dt = (time.perf_counter() - t0) / len(origins)
        print(f"MEGA2: pp {name} upload path: {dt * 1e3:.1f} ms/frame = "
              f"{1 / dt:.2f} scans/s (serialized)", flush=True)


@step("8")
def sa_reuse_probe():
    """Item 3 evidence: is gathering SA2's (1024, 4096) d2 entries from
    SA1's resident (4096, 12288) matrix faster than recomputing the matmul
    + is selection or generation the cost? Times, per formulation, at B=4."""
    from modest_tpu.ops import pointnet2 as p2

    rng = np.random.RandomState(0)
    B, N, M1, M2, K = 4, 12288, 4096, 1024, 32
    pts = jnp.asarray(rng.uniform(-40, 40, (B, N, 3)).astype(np.float32))

    def timed(name, fn, *args, iters=20):
        r = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(r)[0])
        t0 = time.perf_counter()
        for i in range(iters):
            r = fn(*args)
            if (i + 1) % 5 == 0:
                np.asarray(jax.tree_util.tree_leaves(r)[0])
        np.asarray(jax.tree_util.tree_leaves(r)[0])
        dt = (time.perf_counter() - t0) / iters
        print(f"MEGA2: sa-probe {name:42s} {dt * 1e3:7.2f} ms", flush=True)
        return dt

    @jax.jit
    def level1(p):
        idx1 = p2.furthest_point_sample(p, M1)
        c1 = p2.gather_points(p, idx1)
        d2 = p2.pairwise_dist2(c1, p)
        td, ti = p2.nearest_topk(d2, K)
        return c1, d2, idx1, td.sum() + ti.sum()

    @jax.jit
    def sa2_matmul(c1):
        idx2 = p2.furthest_point_sample(c1, M2)
        c2 = p2.gather_points(c1, idx2)
        d2 = p2.pairwise_dist2(c2, c1)
        td, ti = p2.nearest_topk(d2, K)
        return td.sum() + ti.sum()

    @jax.jit
    def sa2_gather(c1, d2_l1, idx1):
        # d2_cc[i, j] = |c2_i - c1_j|^2 = d2_l1[fps2[i], idx1[j]] — reuse the
        # resident SA1 matrix via a 2-D gather instead of a fresh matmul
        idx2 = p2.furthest_point_sample(c1, M2)
        rows = jnp.take_along_axis(d2_l1, idx2[..., None], axis=1)  # (B,M2,N)
        d2_cc = jnp.take_along_axis(
            rows, jnp.broadcast_to(idx1[:, None, :], (B, M2, M1)), axis=2)
        td, ti = p2.nearest_topk(d2_cc, K)
        return td.sum() + ti.sum()

    @jax.jit
    def sa2_selection_only(d2_cc):
        td, ti = p2.nearest_topk(d2_cc, K)
        return td.sum() + ti.sum()

    c1, d2_l1, idx1, _ = level1(pts)
    c1 = jax.block_until_ready(c1)
    timed("level1 fps+d2+topk (4096x12288)", level1, pts)
    timed("SA2 fresh matmul+topk (1024x4096)", sa2_matmul, c1)
    timed("SA2 gather-from-SA1-d2+topk", sa2_gather, c1, d2_l1, idx1)
    d2_cc = jnp.asarray(rng.uniform(0, 100, (B, M2, M1)).astype(np.float32))
    timed("SA2 selection only (topk 1024x4096)", sa2_selection_only, d2_cc)


if __name__ == "__main__":
    print("MEGA2: all requested steps attempted", flush=True)
