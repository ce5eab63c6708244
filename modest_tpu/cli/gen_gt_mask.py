"""CLI: rasterize GT boxes into per-point labels (segmentation-style eval aid).

Reference: generate_cluster_mask/gen_gt_mask.py (hardcoded author paths there;
proper flags here). Writes ``save_dir/{idx:06d}.npy`` with 0 = background and
1..K = object id per point.

Usage:
  python -m modest_tpu.cli.gen_gt_mask --data_root <kitti>/training \
      --idx_list <txt> --save_dir <dir> [--label_dir label_2]
"""
from __future__ import annotations

import argparse
import os
import os.path as osp

import numpy as np
from tqdm.auto import tqdm

from ..utils import kitti_io


def points_in_camera_box(ptc_rect, obj) -> np.ndarray:
    """bool mask of rect-coord points inside a label box (bottom-center t)."""
    shifted = ptc_rect[:, [0, 2]] - np.asarray(obj.t)[[0, 2]]
    c, s = np.cos(obj.ry), np.sin(obj.ry)
    u = shifted[:, 0] * c - shifted[:, 1] * s
    v = shifted[:, 0] * s + shifted[:, 1] * c
    return (
        (u > -obj.l / 2) & (u < obj.l / 2)
        & (v > -obj.w / 2) & (v < obj.w / 2)
        & (ptc_rect[:, 1] > obj.t[1] - obj.h) & (ptc_rect[:, 1] <= obj.t[1])
    )


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_root", required=True)
    parser.add_argument("--idx_list", required=True)
    parser.add_argument("--save_dir", required=True)
    parser.add_argument("--label_dir", default="label_2")
    args = parser.parse_args(argv)

    idx_list = [int(x) for x in open(args.idx_list).readlines()]
    os.makedirs(args.save_dir, exist_ok=True)
    for idx in tqdm(idx_list):
        out = osp.join(args.save_dir, f"{idx:06d}.npy")
        if osp.exists(out):
            continue
        ptc = kitti_io.load_velo_scan(osp.join(args.data_root, "velodyne", f"{idx:06d}.bin"))
        calib = kitti_io.Calibration(osp.join(args.data_root, "calib", f"{idx:06d}.txt"))
        ptc_rect = calib.project_velo_to_rect(ptc[:, :3])
        label_path = osp.join(args.data_root, args.label_dir, f"{idx:06d}.txt")
        objs = kitti_io.read_label(label_path) if osp.exists(label_path) else []
        labels = np.zeros(len(ptc), np.int64)
        for i, obj in enumerate(objs):
            labels[points_in_camera_box(ptc_rect, obj)] = i + 1
        np.save(out, labels)


if __name__ == "__main__":
    main()
