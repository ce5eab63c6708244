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

STEPS = sys.argv[1:] or ["1", "2", "3", "4", "5", "6", "7"]


def banner(msg):
    print(f"\nMEGA: ==== {msg} ====", flush=True)


def step(tag):
    def deco(fn):
        if tag in STEPS:
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
