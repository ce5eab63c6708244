"""Dev: serialized one-process TPU measurement queue (round 4).

The axon relay wedges when chip claims cycle too fast (a killed or even
cleanly-exited client can leave the lease cooling down for tens of
minutes, and every new process pays a claim). This runner does ALL the
round's pending on-chip measurements in ONE process / one claim:

  1. fused kNN+DBSCAN exactness (new one-dispatch path vs XLA reference)
  2. per-frame + pipelined seed-gen rates (VERDICT item 8)
  3. PP-score rate (regression check)
  4. B=8 / B=16 inference throughput (VERDICT item 2d)
  5. HBM bandwidth calibration + achieved train-step GB/s (item 4)
  6. train-step wall-clock stage split at B=8 (item 7)
  7. training-side exact-vs-approx A/B, 300 steps + AP eval (item 2a)

Each step is independently try/except'd; results print with a MEGA:
prefix for easy grepping.

Usage: timeout 7200 python scripts_dev/tpu_mega1.py [steps...]
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

STEPS = sys.argv[1:] or ["1", "2", "3", "4", "5", "6", "7", "8", "9"]


def banner(msg):
    print(f"\nMEGA: ==== {msg} ====", flush=True)


def wait_healthy(max_wait_s: float = 7200.0):
    """Hold the claim but delay measurements until the chip/relay is sane.

    Slot-to-slot the platform varies wildly (measured: the same B=4 train
    step 112 ms in one slot, 28,664 ms in the next; tiny-op round trips
    from 5 ms to seconds). Two canaries gate every measurement step:
    dispatch+sync latency of a tiny op (healthy < 300 ms) and a fixed
    2048^3 f32 matmul (healthy < 100 ms). Unhealthy -> sleep 2 min and
    re-probe, keeping the claim so recovery is caught immediately.
    """
    import jax
    import jax.numpy as jnp

    tiny = jax.jit(lambda x, c: (x * c).sum())
    # 8 chained matmuls -> scalar: compute-weighted, 4-byte download (the
    # relay fetches at ~0.02 GB/s, so the canary must NEVER download a
    # matrix; an earlier version fetched 16 MB and read "degraded" on a
    # healthy chip)
    mm = jax.jit(lambda a, c: jax.lax.fori_loop(
        0, 8, lambda i, acc: (acc @ a) * (1.0 + 1e-9 * i), a)[0, 0])
    x = jnp.ones((256, 256))
    a = jnp.ones((2048, 2048)) * 1e-3
    np.asarray(tiny(x, 1.0))  # compile
    np.asarray(mm(a, 1.0))
    t0 = time.time()
    while time.time() - t0 < max_wait_s:
        lats = []
        for i in range(3):
            s = time.perf_counter()
            np.asarray(tiny(x, 2.0 + i))
            lats.append(time.perf_counter() - s)
        lat = min(lats)
        s = time.perf_counter()
        np.asarray(mm(a, 2.0))
        mmt = time.perf_counter() - s
        healthy = lat < 0.3 and mmt < 0.25
        print(f"MEGA: canary: tiny-op {lat * 1e3:.0f} ms, 2048^3 matmul "
              f"{mmt * 1e3:.0f} ms -> {'HEALTHY' if healthy else 'degraded'}",
              flush=True)
        if healthy:
            return True
        time.sleep(120)
    print("MEGA: canary never went healthy; measuring anyway", flush=True)
    return False


_CANARIED = []


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
                print(f"MEGA: step {tag} done in {time.time() - t0:.0f}s",
                      flush=True)
            except Exception:
                traceback.print_exc()
                print(f"MEGA: step {tag} FAILED", flush=True)
        return fn
    return deco


@step("1")
def fused_dbscan_exactness():
    """New fused one-dispatch path vs the XLA _cluster_from_knn path."""
    from modest_tpu.pipeline import clustering as cl

    rng = np.random.RandomState(3)
    for n, label in ((9000, "small"), (36000, "lyft-scale")):
        xyz = np.zeros((n, 3), np.float32)
        xyz[:, 0] = rng.uniform(-70, 70, n)
        xyz[:, 1] = rng.uniform(-40, 40, n)
        xyz[:, 2] = rng.uniform(-2, 1, n)
        # plant clusters
        for k in range(15):
            c = rng.uniform([-60, -30, -1.5], [60, 30, -1.0])
            sl = slice(k * 300, (k + 1) * 300)
            xyz[sl] = c + rng.randn(300, 3).astype(np.float32) * 0.25
        pp = rng.uniform(0, 1, n).astype(np.float32)
        pp[: 15 * 300] *= 0.1
        kw = dict(n_neighbors=30, radius=2.0, eps=0.15, min_samples=10)
        lab_pallas = cl.dbscan_pp(xyz, pp, **kw)
        os.environ["MODEST_PALLAS_DBSCAN"] = "0"
        try:
            lab_xla = cl.dbscan_pp(xyz, pp, **kw)
        finally:
            os.environ["MODEST_PALLAS_DBSCAN"] = "1"
        same = np.array_equal(lab_pallas, lab_xla)
        print(f"MEGA: fused dbscan [{label} n={n}] exact-match vs XLA: {same} "
              f"(clusters {lab_pallas.max()} vs {lab_xla.max()})", flush=True)
        assert same, "fused pallas path diverged from XLA reference"


@step("2")
def seed_gen_rates():
    import bench_pipeline as bp

    rng = np.random.RandomState(0)
    bp.bench_seed_gen(rng, frames=3)


@step("3")
def pp_score_rate():
    import bench_pipeline as bp

    rng = np.random.RandomState(0)
    bp.bench_pp_score(rng)


@step("4")
def inference_batch_sweep():
    from modest_tpu.models.pointrcnn import PointRCNN, post_process
    from modest_tpu.utils.config import cfg_from_yaml_file

    cfg = cfg_from_yaml_file("configs/models/lyft_models/pointrcnn_dynamic_obj.yaml")
    model = PointRCNN(model_cfg=cfg.MODEL, num_class=len(cfg.CLASS_NAMES))

    for BATCH in (8, 16):
        rng = np.random.RandomState(0)
        n = 12288
        points = rng.uniform(0, 1, (BATCH, n, 4)).astype(np.float32)
        points[..., 0] *= 80
        points[..., 1] = (points[..., 1] - 0.5) * 80
        points[..., 2] = (points[..., 2] - 0.5) * 3 - 0.5
        for b in range(BATCH):
            for k in range(10):
                c = rng.uniform([5, -30, -1.6], [70, 30, -1.4])
                sl = slice(k * 300, (k + 1) * 300)
                points[b, sl, :3] = c + rng.uniform(-1, 1, (300, 3)) * [2, 0.9, 0.7]
        gt = np.zeros((BATCH, 8, 8), np.float32)
        gt[:, 0, :7] = [10, 0, -1.5, 4, 2, 1.6, 0.3]
        gt[:, 0, 7] = 1
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)},
            jnp.asarray(points), jnp.asarray(gt), train=True)

        @jax.jit
        def infer(variables, pts):
            out = model.apply(variables, pts, train=False)
            final = post_process(out, cfg.MODEL.POST_PROCESSING)
            return final["boxes"], final["scores"], final["valid"]

        ITERS = 10
        inputs = [jnp.asarray(points + rng.randn(*points.shape).astype(np.float32) * 0.01)
                  for _ in range(ITERS)]
        for _ in range(2):
            r = infer(variables, inputs[0])
            np.asarray(r[1])
        t0 = time.perf_counter()
        r = None
        for i in range(ITERS):
            r = infer(variables, inputs[i])
            if (i + 1) % 5 == 0:
                np.asarray(r[1])
        np.asarray(r[1])
        dt = time.perf_counter() - t0
        print("MEGA: " + json.dumps({
            "metric": f"pointrcnn_inference_scans_per_sec_per_chip_B{BATCH}",
            "value": round(BATCH * ITERS / dt, 3), "unit": "scans/s"}),
            flush=True)


@step("5")
def hbm_calibration():
    import hbm_calibrate as hc  # scripts_dev on sys.path

    peak = hc.calibrate()
    for b in (4, 8):
        wall, model_bytes, _ = hc.train_step_wall(b)
        print(f"MEGA: train B={b} wall {wall * 1e3:.1f} ms; cost-model "
              f"{model_bytes / 1e9 if np.isfinite(model_bytes) else float('nan'):.2f} GB; "
              f"calibrated peak {peak:.1f} GB/s", flush=True)
        if np.isfinite(model_bytes):
            gbs = model_bytes / wall / 1e9
            max_bytes = wall * peak * 1e9
            print(f"MEGA:   nominal {gbs:.1f} GB/s = {100 * gbs / peak:.1f}% of "
                  f"calibrated; inversion: real traffic <= "
                  f"{min(1.0, max_bytes / model_bytes) * 100:.0f}% of cost-model claim",
                  flush=True)


@step("6")
def train_stage_split():
    import train_stage_wall as tsw  # scripts_dev on sys.path

    saved = sys.argv
    sys.argv = ["train_stage_wall.py", "8"]
    try:
        tsw.main()
    finally:
        sys.argv = saved


@step("7")
def train_exact_vs_approx():
    import runpy

    saved = sys.argv
    sys.argv = ["train_ab_check.py", "--steps", "300"]
    try:
        runpy.run_path(str(Path(__file__).resolve().parent / "train_ab_check.py"),
                       run_name="__main__")
    finally:
        sys.argv = saved


@step("9")
def multi_step_train_throughput():
    """K-steps-per-dispatch vs per-step dispatch at B=8 (amortization)."""
    import optax

    from modest_tpu.models.pointrcnn import PointRCNN
    from modest_tpu.train.state import (create_train_state,
                                        make_train_multi_step,
                                        make_train_step)
    from modest_tpu.utils.config import cfg_from_yaml_file

    cfg = cfg_from_yaml_file("configs/models/lyft_models/pointrcnn_dynamic_obj.yaml")
    model = PointRCNN(model_cfg=cfg.MODEL, num_class=len(cfg.CLASS_NAMES))
    B, N, K = 8, 12288, 8
    rng = np.random.RandomState(0)
    pts = rng.uniform(0, 1, (K, B, N, 4)).astype(np.float32)
    pts[..., 0] *= 80
    pts[..., 1] = (pts[..., 1] - 0.5) * 80
    pts[..., 2] = (pts[..., 2] - 0.5) * 3 - 0.5
    gt = np.zeros((K, B, 16, 8), np.float32)
    for kk in range(K):
        for b in range(B):
            for j in range(10):
                c = rng.uniform([5, -30, -1.6], [70, 30, -1.4])
                sl = slice(j * 300, (j + 1) * 300)
                pts[kk, b, sl, :3] = c + rng.uniform(-1, 1, (300, 3)) * [2, 0.9, 0.7]
                gt[kk, b, j, :7] = [c[0], c[1], c[2], 4, 2, 1.6, 0.3]
                gt[kk, b, j, 7] = 1
    tx = optax.adam(1e-3)
    state = create_train_state(model, tx, {"points": pts[0], "gt_boxes": gt[0]})
    single = make_train_step(model, cfg.MODEL, tx)
    multi = make_train_multi_step(model, cfg.MODEL, tx)
    key = jax.random.PRNGKey(7)
    ptsj, gtj = jnp.asarray(pts), jnp.asarray(gt)

    st = jax.tree_util.tree_map(jnp.array, state)
    st, m = single(st, ptsj[0], gtj[0], key)  # compile + warm
    float(m["loss"])
    t0 = time.perf_counter()
    iters = 2
    for _ in range(iters):
        for kk in range(K):
            st, m = single(st, ptsj[kk], gtj[kk], key)
        float(m["loss"])
    per_step = (time.perf_counter() - t0) / (iters * K)
    print(f"MEGA: single-step driver: {per_step * 1e3:.1f} ms/step = "
          f"{B / per_step:.1f} train scans/s/chip", flush=True)

    st = jax.tree_util.tree_map(jnp.array, state)
    st, mm = multi(st, ptsj, gtj, key)  # compile + warm
    float(mm["loss"][-1])
    t0 = time.perf_counter()
    for _ in range(iters):
        st, mm = multi(st, ptsj, gtj, key)
        float(mm["loss"][-1])
    per_step_k = (time.perf_counter() - t0) / (iters * K)
    print(f"MEGA: K={K}-steps/dispatch:  {per_step_k * 1e3:.1f} ms/step = "
          f"{B / per_step_k:.1f} train scans/s/chip", flush=True)


@step("10")
def seedgen_fused_ab():
    import seedgen_ab

    seedgen_ab.main()


@step("8")
def pp_stage_split():
    import runpy

    saved = sys.argv
    sys.argv = ["pp_score_profile.py"]
    try:
        runpy.run_path(str(Path(__file__).resolve().parent / "pp_score_profile.py"),
                       run_name="__main__")
    finally:
        sys.argv = saved


if __name__ == "__main__":
    print("MEGA: all requested steps attempted", flush=True)
