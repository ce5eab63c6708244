"""Dev: TRAINING-side exact-vs-approx A/B (VERDICT r2 item 7).

Two short trainings from the same init and identical batch streams —
approx TPU ops (approx_max_k ball query, nearest-k MSG grouping, bf16
gathers) vs exact reference semantics (MODEST_EXACT_OPS) — then the SAME
eval protocol on held-out scenes for both checkpoints: lidar-frame R40 AP
vs the planted gt (eval/kitti_eval.py ap_from_lidar_annos) plus the loss
curves. Quantifies the approximations where they matter most: trained
model quality, not just a fixed checkpoint's inference (exact_ab_check.py).

Exact semantics matched: ball_query_gpu.cu / group_points_gpu.cu
first-by-index grouping, lax.top_k, f32 gathers.

Usage: python scripts_dev/train_ab_check.py [--steps 500] [--batch 4]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from modest_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()

import optax

from modest_tpu.eval.kitti_eval import ap_from_lidar_annos
from modest_tpu.models.pointrcnn import PointRCNN, post_process
from modest_tpu.ops import pointnet2 as p2
from modest_tpu.train.state import create_train_state, make_train_step
from modest_tpu.utils.config import cfg_from_yaml_file

parser = argparse.ArgumentParser()
parser.add_argument("--steps", type=int, default=500)
parser.add_argument("--batch", type=int, default=4)
parser.add_argument("--eval_scenes", type=int, default=40)
args = parser.parse_args()

cfg = cfg_from_yaml_file("configs/models/lyft_models/pointrcnn_dynamic_obj.yaml")
model = PointRCNN(model_cfg=cfg.MODEL, num_class=len(cfg.CLASS_NAMES))
N = 12288


def make_batch(rng, b):
    pts = rng.uniform(0, 1, (b, N, 4)).astype(np.float32)
    pts[..., 0] *= 80
    pts[..., 1] = (pts[..., 1] - 0.5) * 80
    pts[..., 2] = (pts[..., 2] - 0.5) * 3 - 0.5
    gt = np.zeros((b, 16, 8), np.float32)
    for i in range(b):
        for k in range(rng.randint(4, 12)):
            c = rng.uniform([5, -30, -1.6], [70, 30, -1.4])
            sl = slice(k * 400, (k + 1) * 400)
            ry = rng.uniform(-np.pi, np.pi)
            dims = rng.uniform([3.5, 1.6, 1.4], [4.5, 2.0, 1.7])
            local = rng.uniform(-0.5, 0.5, (400, 3)) * dims
            cs, sn = np.cos(ry), np.sin(ry)
            rot = np.array([[cs, -sn, 0], [sn, cs, 0], [0, 0, 1.0]])
            pts[i, sl, :3] = local @ rot.T + c
            gt[i, k, :7] = [*c, *dims, ry]
            gt[i, k, 7] = 1
    return pts, gt


def run(mode_exact: bool):
    p2.set_exact_ops(mode_exact)
    tx = optax.adam(1e-3)
    rng = np.random.RandomState(0)  # identical batch stream for both runs
    pts0, gt0 = make_batch(rng, args.batch)
    state = create_train_state(model, tx, {"points": pts0, "gt_boxes": gt0})
    step = make_train_step(model, cfg.MODEL, tx)
    key = jax.random.PRNGKey(7)
    losses = []
    t0 = time.perf_counter()
    pts, gt = pts0, gt0
    for i in range(args.steps):
        state, metrics = step(state, jnp.asarray(pts), jnp.asarray(gt), key)
        if (i + 1) % 25 == 0:
            losses.append((i + 1, float(metrics["loss"])))
        pts, gt = make_batch(rng, args.batch)
    dt = time.perf_counter() - t0
    tag = "exact " if mode_exact else "approx"
    print(f"[{tag}] {args.steps} steps in {dt:.0f}s "
          f"({args.steps * args.batch / dt:.1f} scans/s); loss "
          + " ".join(f"{s}:{v:.3f}" for s, v in losses), flush=True)

    # --- eval on held-out scenes (EVAL ALWAYS APPROX=OFF? No: evaluate each
    # checkpoint under ITS OWN mode — the deployed configuration) ---
    erng = np.random.RandomState(999)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def infer(pv):
        out = model.apply(variables, pv, train=False)
        return post_process(out, cfg.MODEL.POST_PROCESSING)

    gt_annos, dt_annos = [], []
    for s0 in range(0, args.eval_scenes, args.batch):
        pts, gt = make_batch(erng, args.batch)
        final = infer(jnp.asarray(pts))
        for i in range(args.batch):
            ok = np.asarray(final["valid"][i])
            n_gt = int(gt[i, :, 7].sum())
            gt_annos.append({"name": np.array(["Dynamic"] * n_gt),
                             "boxes_lidar": gt[i, :n_gt, :7]})
            dt_annos.append({
                "name": np.array(["Dynamic"] * int(ok.sum())),
                "boxes_lidar": np.asarray(final["boxes"][i])[ok],
                "score": np.asarray(final["scores"][i])[ok],
            })
    res = ap_from_lidar_annos(gt_annos, dt_annos, ["Dynamic"],
                              iou_thresholds=(0.5, 0.25))
    print(f"[{tag}] eval AP: {res}", flush=True)
    return losses, res


loss_a, ap_a = run(mode_exact=False)
loss_e, ap_e = run(mode_exact=True)
print("\nA/B summary (approx vs exact):")
print(f"  final loss: {loss_a[-1][1]:.3f} vs {loss_e[-1][1]:.3f}")
for k in ap_a[1]:  # ap_from_lidar_annos returns (result_str, result_dict)
    print(f"  {k}: {ap_a[1][k]:.2f} vs {ap_e[1][k]:.2f}")
p2.set_exact_ops(False)
