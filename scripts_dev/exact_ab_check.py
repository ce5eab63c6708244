"""Dev: end-to-end exact-vs-approx A/B on the flagship eval path (TPU).

Runs the full PointRCNN eval forward (backbone → proposals → RoI → post NMS)
on N realistic synthetic scenes twice — approx TPU path (approx_max_k,
nearest-k MSG grouping, bf16 gathers) vs exact reference semantics
(MODEST_EXACT_OPS: lax.top_k, first-by-index ball query, f32 gathers) — and
reports box match rate + score deltas (VERDICT r1 item 3).

Usage: python scripts_dev/exact_ab_check.py [--scenes 100]
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

from modest_tpu.models.pointrcnn import PointRCNN, post_process
from modest_tpu.ops import pointnet2 as p2
from modest_tpu.ops.iou3d import boxes_iou_bev
from modest_tpu.utils.config import cfg_from_yaml_file

parser = argparse.ArgumentParser()
parser.add_argument("--scenes", type=int, default=100)
parser.add_argument("--batch", type=int, default=4)
parser.add_argument("--train-steps", type=int, default=0,
                    help="train this many steps first so the AP-parity rows "
                         "compare MEANINGFUL detections (random init scores "
                         "~0 AP on both paths, which is vacuous)")
args = parser.parse_args()

cfg = cfg_from_yaml_file("configs/models/lyft_models/pointrcnn_dynamic_obj.yaml")
model = PointRCNN(model_cfg=cfg.MODEL, num_class=len(cfg.CLASS_NAMES))

rng = np.random.RandomState(0)
N = 12288


def make_batch(b):
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


batches = [make_batch(args.batch) for _ in range(args.scenes // args.batch)]

variables = model.init(
    {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)},
    jnp.asarray(batches[0][0]), jnp.asarray(batches[0][1]), train=True,
)

if args.train_steps > 0:
    import optax

    from modest_tpu.train.state import create_train_state, make_train_step

    tx = optax.adam(2e-3)
    state = create_train_state(
        model, tx, {"points": batches[0][0], "gt_boxes": batches[0][1]})
    step = make_train_step(model, cfg.MODEL, tx)
    key = jax.random.PRNGKey(11)
    t0 = time.perf_counter()
    for it in range(args.train_steps):
        pts, gt = batches[it % len(batches)]
        state, metrics = step(state, jnp.asarray(pts), jnp.asarray(gt), key)
    loss = float(metrics["loss"])
    print(f"pre-trained {args.train_steps} steps in "
          f"{time.perf_counter() - t0:.0f}s (loss {loss:.3f})", flush=True)
    variables = {"params": state.params, "batch_stats": state.batch_stats}


def run_all(tag):
    @jax.jit
    def fwd(pts):
        out = model.apply(variables, pts, train=False)
        final = post_process(out, cfg.MODEL.POST_PROCESSING)
        return final["boxes"], final["scores"], final["valid"]

    results = []
    t0 = time.perf_counter()
    for pts, _ in batches:
        boxes, scores, valid = fwd(jnp.asarray(pts))
        results.append((np.asarray(boxes), np.asarray(scores), np.asarray(valid)))
    dt = time.perf_counter() - t0
    print(f"{tag}: {len(batches)} batches in {dt:.1f}s")
    return results


p2.set_exact_ops(False)
approx = run_all("approx")
p2.set_exact_ops(True)
exact = run_all("exact")
p2.set_exact_ops(False)

# ---------------------------------------------------------------------------
# compare: greedy BEV-IoU matching of post-NMS boxes per scene
# ---------------------------------------------------------------------------
tot_e = tot_a = tot_match = 0
score_deltas, center_deltas = [], []
for (ab, asc, av), (eb, esc, ev) in zip(approx, exact):
    for i in range(ab.shape[0]):
        A, E = ab[i][av[i]], eb[i][ev[i]]
        sa, se = asc[i][av[i]], esc[i][ev[i]]
        tot_a += len(A)
        tot_e += len(E)
        if len(A) == 0 or len(E) == 0:
            continue
        iou = np.asarray(boxes_iou_bev(jnp.asarray(E[:, :7]), jnp.asarray(A[:, :7])))
        used = np.zeros(len(A), bool)
        for j in np.argsort(-se):
            k = int(np.argmax(np.where(used, -1.0, iou[j])))
            if iou[j, k] >= 0.7 and not used[k]:
                used[k] = True
                tot_match += 1
                score_deltas.append(abs(se[j] - sa[k]))
                center_deltas.append(np.linalg.norm(E[j, :3] - A[k, :3]))

print(f"scenes={args.scenes}  exact boxes={tot_e}  approx boxes={tot_a}")
print(f"matched@IoU0.7: {tot_match} ({100*tot_match/max(tot_e,1):.2f}% of exact)")
if score_deltas:
    print(f"score |delta|: mean {np.mean(score_deltas):.4f}  "
          f"p95 {np.percentile(score_deltas, 95):.4f}  max {np.max(score_deltas):.4f}")
    print(f"center |delta| (m): mean {np.mean(center_deltas):.4f}  "
          f"p95 {np.percentile(center_deltas, 95):.4f}")

# ---------------------------------------------------------------------------
# AP-level parity (VERDICT r4 item 7): the planted boxes ARE ground truth —
# run the AP harness on both paths' detections and compare the metric the
# north star is stated in (AP_BEV), not just box-level matching.
# ---------------------------------------------------------------------------
from modest_tpu.eval.kitti_eval import ap_from_lidar_annos  # noqa: E402

gt_annos = []
for pts, gt in batches:
    for i in range(gt.shape[0]):
        g = gt[i][gt[i, :, 7] > 0]
        gt_annos.append({"name": np.array(["Dynamic"] * len(g)),
                         "boxes_lidar": g[:, :7]})


def to_annos(results):
    annos = []
    for ab, asc, av in results:
        for i in range(ab.shape[0]):
            B, S = ab[i][av[i]], asc[i][av[i]]
            annos.append({"name": np.array(["Dynamic"] * len(B)),
                          "boxes_lidar": B[:, :7], "score": S})
    return annos


_, ap_a = ap_from_lidar_annos(gt_annos, to_annos(approx), ["Dynamic"],
                              iou_thresholds=(0.5, 0.7))
_, ap_e = ap_from_lidar_annos(gt_annos, to_annos(exact), ["Dynamic"],
                              iou_thresholds=(0.5, 0.7))
worst = 0.0
for k in ap_e:
    d = ap_a[k] - ap_e[k]
    worst = max(worst, -d)
    print(f"AP parity {k}: exact {ap_e[k]:6.2f}  approx {ap_a[k]:6.2f}  "
          f"delta {d:+.2f}")
if worst > 1.5:
    print(f"AP PARITY FAIL: approx path loses {worst:.2f} AP points vs exact")
    sys.exit(1)
print(f"AP parity ok (worst approx-vs-exact delta {worst:.2f} <= 1.5 AP pts)")
