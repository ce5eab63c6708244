"""CLI: PP-gated clustering → per-point seed masks + seed bounding boxes.

Drop-in equivalent of generate_cluster_mask/generate_mask.py: writes
``seg_save_dst/{idx:06d}.npy`` (per-point cluster labels, 0 = background)
and ``bbox_info_save_dst/{idx:06d}.pkl`` (list of seed box objects), plus a
``configs.yaml`` snapshot next to each output dir.

Usage:
  python -m modest_tpu.cli.generate_mask data_root=/data/lyft/training [key=value ...]
"""
from __future__ import annotations

import os
import os.path as osp
import pickle

from tqdm.auto import tqdm

from ..pipeline.seed_labels import generate_mask_for_frame, generate_masks_for_frames
from ..utils import kitti_io
from ..utils.config import save_config
from .common import display_args, load_pipeline_config, make_parser, shard_idx_list

import numpy as np


def main(argv=None):
    args = make_parser(__doc__).parse_args(argv)
    cfg = load_pipeline_config("generate_mask", args.overrides)
    display_args("clustering", cfg)

    idx_list = [int(x) for x in open(cfg.data_paths.idx_list).readlines()]
    idx_list = shard_idx_list(idx_list, cfg.total_part, cfg.part)

    os.makedirs(cfg.data_paths.seg_save_dst, exist_ok=True)
    if not osp.exists(osp.join(cfg.data_paths.seg_save_dst, "configs.yaml")):
        save_config(cfg, osp.join(cfg.data_paths.seg_save_dst, "configs.yaml"))
    bbox_dst = cfg.data_paths.get("bbox_info_save_dst", None)
    if bbox_dst is not None:
        os.makedirs(bbox_dst, exist_ok=True)
        if not osp.exists(osp.join(bbox_dst, "configs.yaml")):
            save_config(cfg, osp.join(bbox_dst, "configs.yaml"))

    def _outputs(idx: int):
        seg_out = osp.join(cfg.data_paths.seg_save_dst, f"{idx:06d}.npy")
        bbox_out = osp.join(bbox_dst, f"{idx:06d}.pkl") if bbox_dst else None
        return seg_out, bbox_out

    def _load(idx: int):
        ptc = kitti_io.load_velo_scan(osp.join(cfg.ptc_path, f"{idx:06d}.bin"))
        pp_score = np.load(osp.join(cfg.data_paths.pp_score_path, f"{idx:06d}.npy"))
        calib = kitti_io.Calibration(osp.join(cfg.calib_path, f"{idx:06d}.txt"))
        return ptc, pp_score, calib

    def _save(idx: int, labels, objs):
        seg_out, bbox_out = _outputs(idx)
        if bbox_out is not None:
            with open(bbox_out, "wb") as f:
                pickle.dump(objs, f)
        np.save(seg_out, labels)

    def process(idx: int):
        seg_out, bbox_out = _outputs(idx)
        if osp.exists(seg_out) and (bbox_out is None or osp.exists(bbox_out)):
            return
        ptc, pp_score, calib = _load(idx)
        labels, objs = generate_mask_for_frame(ptc, pp_score, calib, cfg)
        _save(idx, labels, objs)

    def process_group(idxs):
        todo = []
        for idx in idxs:
            seg_out, bbox_out = _outputs(idx)
            if osp.exists(seg_out) and (bbox_out is None or osp.exists(bbox_out)):
                continue
            todo.append(idx)
        if not todo:
            return
        loaded = [_load(i) for i in todo]
        results = generate_masks_for_frames(
            [(ptc, pp) for ptc, pp, _ in loaded], [c for _, _, c in loaded], cfg)
        for idx, (labels, objs) in zip(todo, results):
            _save(idx, labels, objs)

    # software pipeline: frames run through the device in groups of
    # `device_batch_frames` (ONE batched dispatch for the group's clustering
    # and one for its box fits), and `pipeline_workers` groups stay in flight
    # so one group's host stages (IO, plane RANSAC, percentiles, label
    # compaction) overlap another's device work and the relay round-trip
    # latency. workers=1 + group=1 → reference-style strictly sequential loop.
    workers = int(cfg.get("pipeline_workers", 3))
    group = int(cfg.get("device_batch_frames", 4))
    if workers <= 1 and group <= 1:
        for idx in tqdm(idx_list):
            process(int(idx))
    else:
        import collections
        import concurrent.futures as cf

        groups = [[int(i) for i in idx_list[s : s + group]]
                  for s in range(0, len(idx_list), max(group, 1))]
        with cf.ThreadPoolExecutor(max(workers, 1)) as pool:
            pending = collections.deque()
            bar = tqdm(total=len(idx_list))
            for g in groups:
                pending.append((len(g), pool.submit(process_group, g)))
                if len(pending) >= max(workers, 1) * 2:
                    cnt, fut = pending.popleft()
                    fut.result()
                    bar.update(cnt)
            while pending:
                cnt, fut = pending.popleft()
                fut.result()
                bar.update(cnt)
            bar.close()


if __name__ == "__main__":
    main()
