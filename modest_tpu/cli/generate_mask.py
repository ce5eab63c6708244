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

from ..pipeline.seed_labels import generate_mask_for_frame
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

    def process(idx: int):
        seg_out = osp.join(cfg.data_paths.seg_save_dst, f"{idx:06d}.npy")
        bbox_out = osp.join(bbox_dst, f"{idx:06d}.pkl") if bbox_dst else None
        if osp.exists(seg_out) and (bbox_out is None or osp.exists(bbox_out)):
            return
        ptc = kitti_io.load_velo_scan(osp.join(cfg.ptc_path, f"{idx:06d}.bin"))
        pp_score = np.load(osp.join(cfg.data_paths.pp_score_path, f"{idx:06d}.npy"))
        calib = kitti_io.Calibration(osp.join(cfg.calib_path, f"{idx:06d}.txt"))

        labels, objs = generate_mask_for_frame(ptc, pp_score, calib, cfg)

        if bbox_out is not None:
            with open(bbox_out, "wb") as f:
                pickle.dump(objs, f)
        np.save(seg_out, labels)

    # software pipeline: K frames in flight so one frame's host stages (IO,
    # masks, percentiles, label compaction) overlap another's device work
    # and the relay round-trip latency (frames are independent; each thread
    # blocks only on its own frame's results). workers=1 → reference-style
    # strictly sequential loop.
    workers = int(cfg.get("pipeline_workers", 3))
    if workers <= 1:
        for idx in tqdm(idx_list):
            process(int(idx))
    else:
        import collections
        import concurrent.futures as cf

        with cf.ThreadPoolExecutor(workers) as pool:
            pending = collections.deque()
            bar = tqdm(total=len(idx_list))
            for idx in idx_list:
                pending.append(pool.submit(process, int(idx)))
                if len(pending) >= workers * 2:
                    pending.popleft().result()
                    bar.update(1)
            while pending:
                pending.popleft().result()
                bar.update(1)
            bar.close()


if __name__ == "__main__":
    main()
