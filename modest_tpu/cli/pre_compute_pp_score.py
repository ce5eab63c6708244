"""CLI: compute PP (persistence) scores for all training frames.

Drop-in equivalent of the reference's generate_cluster_mask/pre_compute_pp_score.py:
same metadata inputs (track_list / valid_idx pkl), same per-frame
``pp_score/{idx:06d}.npy`` outputs, idempotent skip, total_part/part sharding.

Usage:
  python -m modest_tpu.cli.pre_compute_pp_score data_root=/data/lyft/training \
      [data_paths=nusc] [key=value ...]
"""
from __future__ import annotations

import os
import os.path as osp
import pickle

import numpy as np
from tqdm.auto import tqdm

from ..pipeline.pp_score import (
    DeviceFrameCache,
    TraversalIndex,
    pp_score_for_frame,
    pp_score_for_frame_cached,
    remove_center,
)
from .common import display_args, load_pipeline_config, make_parser, shard_idx_list


def main(argv=None):
    args = make_parser(__doc__).parse_args(argv)
    cfg = load_pipeline_config("pp_score", args.overrides)
    display_args("ephemerality", cfg)

    np.random.seed(cfg.seed)
    track_list = pickle.load(open(cfg.data_paths.track_path, "rb"))
    valid_idx = pickle.load(open(cfg.data_paths.idx_info, "rb"))
    os.makedirs(cfg.data_paths.pp_score_path, exist_ok=True)

    if cfg.data_paths.idx_list is not None and osp.exists(str(cfg.data_paths.idx_list)):
        idx_list = [int(x) for x in open(cfg.data_paths.idx_list).readlines()]
    else:
        idx_list = list(valid_idx)
    idx_list = shard_idx_list(idx_list, cfg.total_part, cfg.part)

    index = TraversalIndex(cfg.data_root, track_list, valid_idx, nusc=cfg.nusc)
    # fast path: raw frames stay resident in device HBM across origin frames
    # (consecutive origins share most neighbor frames); the noise ablation
    # perturbs the origin cloud and uses the combined-cloud path
    use_cache = cfg.add_random_noise <= 0

    def _load(gid):
        pts = index._velo(gid)
        return remove_center(pts) if cfg.nusc else pts

    cache = DeviceFrameCache(_load) if use_cache else None

    trans_dir = cfg.data_paths.load_save_precomputed_trans_mat
    if trans_dir is not None:
        os.makedirs(trans_dir, exist_ok=True)

    def process(origin_idx: int, out: str):
        if use_cache:
            H = pp_score_for_frame_cached(
                index, cache, origin_idx,
                radius=cfg.max_neighbor_dist,
                limit_traversals=cfg.limit_traversals,
            )
        else:
            H = pp_score_for_frame(
                index,
                origin_idx,
                radius=cfg.max_neighbor_dist,
                limit_traversals=cfg.limit_traversals,
                add_random_noise=cfg.add_random_noise,
            )
        np.save(out, H.astype(np.float32))

    # software pipeline: 2 origins in flight — one origin's host stages
    # (pose math, cloud transform, query upload, counts download, entropy)
    # overlap the other's device radius count. Measured stage split (round
    # 4, pp_score_profile): upload 55.7 ms + host 19 ms vs device 77 ms per
    # frame — serialized they sum, pipelined the device stays busy.
    workers = int(cfg.get("pipeline_workers", 2)) if use_cache else 1

    import collections
    import concurrent.futures as cf

    pool = cf.ThreadPoolExecutor(workers) if workers > 1 else None
    futs: "collections.deque" = collections.deque()
    for origin_idx in tqdm(idx_list):
        origin_idx = int(origin_idx)
        out = osp.join(cfg.data_paths.pp_score_path, f"{origin_idx:06d}.npy")
        if osp.exists(out) or osp.exists(out[:-4]):
            continue
        n_traversals = len(valid_idx[origin_idx][2])
        assert n_traversals > 1, origin_idx

        if trans_dir is not None:
            _, trans_mat = index.combined_traversals(origin_idx)
            np.save(osp.join(trans_dir, f"{origin_idx:06d}.npy"), trans_mat)
        if cfg.skip_ephe:
            continue
        if pool is None:
            process(origin_idx, out)
        else:
            futs.append(pool.submit(process, origin_idx, out))
            while len(futs) > workers:
                futs.popleft().result()
    for f in futs:
        f.result()
    if pool is not None:
        pool.shutdown()


if __name__ == "__main__":
    main()
