"""Pipeline throughput benchmark: PP (persistence) score + seed-label
generation on realistic synthetic frames (BASELINE.md configs 1-2).

Prints one JSON line per stage (bench.py remains the driver's headline).
Sizes follow Lyft: ~90k pts/frame origin clouds, 5 traversals × ~160k pts
combined clouds for the PP stage; ~35k in-range points for clustering.
"""
from __future__ import annotations

import json
import time

import numpy as np


def synth_frame(rng, n_ground=60000, n_objects=12, n_wall=20000):
    pts = [
        np.stack([rng.uniform(0, 90, n_ground), rng.uniform(-40, 40, n_ground),
                  rng.normal(-1.8, 0.03, n_ground)], 1)
    ]
    for _ in range(n_objects):
        c = rng.uniform([5, -30, -1.6], [70, 30, -1.2])
        pts.append(c + rng.uniform(-1, 1, (800, 3)) * [2.2, 1.0, 0.75])
    pts.append(
        np.stack([rng.uniform(0, 90, n_wall), np.full(n_wall, -35.0) + rng.randn(n_wall),
                  rng.uniform(-1.8, 2, n_wall)], 1)
    )
    return np.concatenate(pts).astype(np.float32)


def bench_pp_score(rng, origins=4, traversals=5, frames_per_trav=8):
    """Steady-state PP score with the HBM-resident frame cache: each origin
    uploads only its own query cloud; neighbor frames are already on device
    (the CLI's sliding-window access pattern)."""
    import jax
    import jax.numpy as jnp

    from modest_tpu.pipeline.pp_score import compute_ephe_score

    n = synth_frame(rng).shape[0]
    m_pad = 1 << (n - 1).bit_length()
    f = traversals * frames_per_trav
    f_pad = ((f + 7) // 8) * 8
    frames = np.zeros((f_pad, m_pad, 3), np.float32)
    fmask = np.zeros((f_pad, m_pad), bool)
    for i in range(f):
        pts = synth_frame(rng)
        frames[i, : len(pts)] = pts
        fmask[i, : len(pts)] = True
    rot = np.tile(np.eye(3, dtype=np.float32), (f_pad, 1, 1))
    trans = rng.randn(f_pad, 3).astype(np.float32) * 0.1
    onehot = np.zeros((f_pad, traversals), np.float32)
    onehot[np.arange(f), np.arange(f) % traversals] = 1.0
    frames_d = jax.device_put(frames)
    fmask_d = jax.device_put(fmask)

    from modest_tpu.pipeline.pp_score import _sorted_pool_counts
    from modest_tpu.ops.pallas_radius_count import BN

    # regroup frames per traversal (slabs of frames_per_trav)
    order = np.argsort(np.arange(f) % traversals, kind="stable")
    frames_g = jax.device_put(frames[list(order) + list(range(f, f_pad))][: traversals * frames_per_trav])
    fmask_g = jax.device_put(fmask[list(order) + list(range(f, f_pad))][: traversals * frames_per_trav])
    rot_g = jnp.asarray(rot[: traversals * frames_per_trav])
    trans_g = jnp.asarray(trans[: traversals * frames_per_trav])

    def one(o):
        n_pad = ((len(o) + BN - 1) // BN) * BN
        q = np.full((n_pad, 3), 1e9, np.float32)
        q[: len(o)] = o
        counts = _sorted_pool_counts(
            jnp.asarray(q), frames_g, fmask_g, rot_g, trans_g, np.float32(0.3),
            t_count=traversals, fmax=frames_per_trav,
        )
        return compute_ephe_score(np.asarray(counts)[: len(o)])

    olist = [synth_frame(rng) for _ in range(origins)]
    one(olist[0])  # warm/compile
    t0 = time.perf_counter()
    for o in olist:
        one(o)
    dt = time.perf_counter() - t0
    total_pts = int(fmask.sum())
    print(json.dumps({
        "metric": "pp_score_scans_per_sec",
        "value": round(origins / dt, 3),
        "unit": "scans/s",
        "detail": f"{n} origin pts vs {f} cached frames ({total_pts} pts) in {traversals} traversals",
    }))

    # pipelined variant — the CLI's 2-in-flight origin pipeline: one
    # origin's host/query-upload/entropy stages overlap another's device
    # radius count (cli/pre_compute_pp_score.py pipeline_workers)
    import concurrent.futures as cf

    many = olist * 3
    with cf.ThreadPoolExecutor(2) as pool:
        t0 = time.perf_counter()
        list(pool.map(one, many))
        dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "pp_score_pipelined_scans_per_sec",
        "value": round(len(many) / dt, 3),
        "unit": "scans/s",
        "detail": "2 origins in flight (CLI pipeline_workers=2)",
    }))


def bench_seed_gen(rng, frames=3):
    from modest_tpu.pipeline.seed_labels import generate_mask_for_frame
    from modest_tpu.utils.config import Config
    from modest_tpu.utils.kitti_io import Calibration

    cfg = Config({
        "plane_estimate": {"range": [[-70, 70], [-20, 20]], "max_hs": -1.5, "offset": 0.05},
        "limit_range": [[-70, 70], [-40, 40]],
        "graph": {"neighbor_type": "radius_mutual_knn", "affinity_type": "l1",
                  "n_neighbors": 70, "radius": 2.0},
        "clustering": {"method": "DBSCAN", "DBSCAN": {"eps": 0.1, "min_samples": 10}},
        "filtering": {"min_points": 10, "max_volume": 120, "min_volume": 0.5,
                      "min_max_height": 0.5, "max_min_height": 1.0,
                      "percentile": 20, "min_percentile_pp_score": 0.7},
        "bbox_gen": {"fit_method": "closeness_to_edge"},
    })
    P2 = np.array([[700.0, 0, 600, 0], [0, 700.0, 200, 0], [0, 0, 1.0, 0]])
    V2C = np.array([[0.0, -1, 0, 0], [0, 0, -1, 0], [1.0, 0, 0, 0]])
    calib = Calibration({"P2": P2, "P3": P2, "R0_rect": np.eye(3), "Tr_velo_to_cam": V2C})

    clouds = []
    for _ in range(frames):
        pts = synth_frame(rng)
        ptc = np.concatenate([pts, np.zeros((len(pts), 1), np.float32)], 1)
        pp = rng.rand(len(pts)).astype(np.float32)
        pp[:60000] = 0.85  # ground persistent
        pp[60000:60000 + 12 * 800] = 0.05  # objects ephemeral
        clouds.append((ptc, pp))
    # warm EVERY frame's (n_pad, window, cluster-count) program bucket, not
    # just frame 0's: each distinct bucket pays a one-time in-process
    # compile-cache load (~1.2 s on this host), which the real multi-
    # thousand-frame CLI amortizes to noise but a 3-frame timed loop does
    # not — round-5 mega runs read 0.5 scans/s with 1.75 s/frame of pure
    # first-touch cost (stage sum: 233 ms). Steady state is the honest CLI
    # rate; the bucket sets are bounded by design (4/octave n_pad, pow2 w).
    for ptc, pp in clouds:
        generate_mask_for_frame(ptc, pp, calib, cfg)
    t0 = time.perf_counter()
    n_boxes = 0
    for ptc, pp in clouds:
        labels, objs = generate_mask_for_frame(ptc, pp, calib, cfg)
        n_boxes += len(objs)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "seed_label_gen_scans_per_sec",
        "value": round(frames / dt, 3),
        "unit": "scans/s",
        "detail": f"{clouds[0][0].shape[0]} pts/frame, {n_boxes} seed boxes total",
    }))

    # pipelined + group-batched variant — the cli/generate_mask.py pool:
    # groups of 4 frames share ONE batched clustering dispatch and one
    # box-fit dispatch, and 3 groups stay in flight so host stages (masks,
    # percentiles, label compaction) overlap device work + relay round trips
    import concurrent.futures as cf

    from modest_tpu.pipeline.seed_labels import generate_masks_for_frames

    group = 4
    many = clouds * ((4 * group + len(clouds) - 1) // len(clouds))
    gs = [many[s : s + group] for s in range(0, len(many), group)]
    for g in gs:  # warm every group composition's buckets (see above)
        generate_masks_for_frames(g, [calib] * len(g), cfg)
    with cf.ThreadPoolExecutor(3) as pool:
        t0 = time.perf_counter()
        futs = [pool.submit(generate_masks_for_frames, g, [calib] * len(g), cfg)
                for g in gs]
        boxes = sum(len(objs) for f in futs for _, objs in f.result())
        dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "seed_label_gen_pipelined_scans_per_sec",
        "value": round(len(many) / dt, 3),
        "unit": "scans/s",
        "detail": f"groups of {group} frames/dispatch, 3 worker threads, "
                  f"{len(many)} frames, {boxes} seed boxes",
    }))


def main():
    from modest_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.RandomState(0)
    bench_pp_score(rng)
    bench_seed_gen(rng)


if __name__ == "__main__":
    main()
