"""Dev: KITTI range-AP harness throughput at self-training scale.

VERDICT r1 item 7: get_range_eval_result runs every self-training round on
~5k frames x 8 range/metric configs; this benches it on synthetic annos at
Lyft-val scale (default 4900 frames, realistic box counts).

Usage: python scripts_dev/eval_bench.py [--frames 4900]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--frames", type=int, default=4900)
args = parser.parse_args()

from modest_tpu.eval.kitti_eval import get_range_eval_result

rng = np.random.RandomState(0)


def make(n_frames):
    gt_annos, dt_annos = [], []
    for _ in range(n_frames):
        n_gt = rng.randint(0, 14)
        n_dt = rng.randint(0, 22)
        loc = np.stack([rng.uniform(-30, 30, n_gt), rng.uniform(0.5, 2.5, n_gt),
                        rng.uniform(2, 78, n_gt)], 1)
        dims = np.stack([rng.uniform(3, 5, n_gt), rng.uniform(1.3, 1.9, n_gt),
                         rng.uniform(1.5, 2.1, n_gt)], 1)
        ry = rng.uniform(-np.pi, np.pi, n_gt)
        gt = {"name": np.array(["Dynamic"] * n_gt),
              "truncated": np.zeros(n_gt), "occluded": np.zeros(n_gt),
              "alpha": np.full(n_gt, -10.0),
              "bbox": np.sort(rng.uniform(0, 370, (n_gt, 4)), axis=1),
              "dimensions": dims, "location": loc, "rotation_y": ry}
        rows = []
        for _ in range(n_dt):
            if n_gt > 0 and rng.rand() < 0.7:
                j = rng.randint(n_gt)
                rows.append((loc[j] + rng.randn(3) * 0.3, dims[j], ry[j]))
            else:
                rows.append((np.array([rng.uniform(-30, 30), 1.5, rng.uniform(2, 78)]),
                             np.array([4.0, 1.6, 1.8]), 0.0))
        dt = {"name": np.array(["Dynamic"] * n_dt),
              "truncated": np.zeros(n_dt), "occluded": np.zeros(n_dt),
              "alpha": np.full(n_dt, -10.0),
              "bbox": np.sort(rng.uniform(0, 370, (n_dt, 4)), axis=1),
              "dimensions": (np.stack([r[1] for r in rows]) if rows
                             else np.zeros((0, 3))),
              "location": (np.stack([r[0] for r in rows]) if rows
                           else np.zeros((0, 3))),
              "rotation_y": np.array([r[2] for r in rows]),
              "score": rng.uniform(0.01, 1.0, n_dt)}
        gt_annos.append(gt)
        dt_annos.append(dt)
    return gt_annos, dt_annos


print(f"building {args.frames} synthetic frames...")
gt_annos, dt_annos = make(args.frames)
t0 = time.perf_counter()
result, ret = get_range_eval_result(gt_annos, dt_annos, ["Dynamic"])
dt = time.perf_counter() - t0
print(f"range eval ({args.frames} frames, 5 buckets x 2 metrics x 2 IoUs): {dt:.1f}s")
print(f"key APs: 0-80 bev0.7={ret['Dynamic_bev_iou0.7/00-80_R40']:.2f} "
      f"3d0.5={ret['Dynamic_3d_iou0.5/00-80_R40']:.2f}")
