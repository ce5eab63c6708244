"""Seed-label generation & self-training label fusion (pipeline L3/L4).

Covers the reference's generate_mask.py, gen_label_files.py and
combine_labels.py inner logic as library functions; the CLIs in
modest_tpu/cli wrap these with the file contract.
"""
from __future__ import annotations

import types

import numpy as np

from ..utils import kitti_io
from .box_fit import get_obj
from .clustering import dbscan_pp
from .ground_plane import above_plane, distance_to_plane, estimate_plane

# ---------------------------------------------------------------------------
# cluster validity filters (reference clustering_utils.py:94-135)
# ---------------------------------------------------------------------------


def is_valid_cluster(ptc, pp_score, plane, min_points=10, max_volume=40, min_volume=0.5,
                     max_min_height=4, min_max_height=0, percentile=10,
                     min_percentile_pp_score=0.7) -> bool:
    if ptc.shape[0] < min_points:
        return False
    dist = distance_to_plane(ptc, plane, directional=True)
    if dist.min() > max_min_height:  # must touch the ground
        return False
    if dist.max() < min_max_height:  # must be tall enough
        return False
    if np.percentile(pp_score, percentile) > min_percentile_pp_score:
        return False  # must be ephemeral (low persistence)
    return True


def _compact_ids(labels: np.ndarray) -> np.ndarray:
    """np.unique(labels) + searchsorted(keys, labels) without the two
    N·log N sorts: rank each present id through a lookup table over the
    (tiny) id range. Identical output — each label maps to its rank among
    the distinct values present."""
    if labels.size == 0:
        return labels.astype(np.int64)
    lo = int(labels.min())
    present = np.zeros(int(labels.max()) - lo + 1, bool)
    shifted = labels - lo
    present[shifted] = True
    ranks = np.cumsum(present) - 1
    return ranks[shifted]


def filter_labels(ptc, pp_score, labels, min_points=10, max_volume=40, min_volume=0.5,
                  max_min_height=4, min_max_height=0, percentile=10,
                  min_percentile_pp_score=0.7) -> np.ndarray:
    """Drop invalid clusters and compact ids; noise(-1) → 0, clusters → 1..K.

    Vectorized equivalent of an `is_valid_cluster` loop over all clusters:
    one bincount/segment pass replaces K python-level mask + percentile
    calls (the loop was ~54 ms/frame of host time at Lyft cluster counts).
    """
    labels = labels.copy()
    plane = estimate_plane(ptc, max_hs=-1.5, ptc_range=((-70, 70), (-50, 50)))
    n_clusters = int(labels.max()) + 1
    if n_clusters > 0:
        sel = labels >= 0
        lab = labels[sel]
        dist = distance_to_plane(ptc[sel, :3], plane, directional=True)
        counts = np.bincount(lab, minlength=n_clusters)
        dmin = np.full(n_clusters, np.inf)
        np.minimum.at(dmin, lab, dist)
        dmax = np.full(n_clusters, -np.inf)
        np.maximum.at(dmax, lab, dist)
        # per-cluster np.percentile (linear interpolation) over pp_score:
        # sort once by (label, pp) and interpolate inside each segment
        order = np.lexsort((pp_score[sel], lab))
        pps = pp_score[sel][order]
        starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
        pos = (counts - 1) * (percentile / 100.0)
        lo = np.floor(pos).astype(np.int64)
        hi = np.ceil(pos).astype(np.int64)
        nonempty = counts > 0
        v_lo = pps[starts + np.where(nonempty, lo, 0)]
        v_hi = pps[starts + np.where(nonempty, hi, 0)]
        perc = v_lo + (v_hi - v_lo) * (pos - lo)
        invalid = (
            (counts < min_points)
            | (dmin > max_min_height)  # must touch the ground
            | (dmax < min_max_height)  # must be tall enough
            | (nonempty & (perc > min_percentile_pp_score))  # must be ephemeral
        )
        kill = (labels >= 0) & invalid[np.clip(labels, 0, None)]
        labels[kill] = -1
    return _compact_ids(labels)  # noise → 0 (when present), clusters → 1..K


# ---------------------------------------------------------------------------
# per-frame seed mask generation (reference generate_mask.py:47-109)
# ---------------------------------------------------------------------------


def _frame_final_mask(ptc: np.ndarray, cfg) -> np.ndarray:
    """Above-ground ∧ in-range mask (generate_mask.py:47-60)."""
    pe = cfg.plane_estimate
    plane = estimate_plane(ptc[:, :3], max_hs=pe.max_hs, ptc_range=_t(pe.range))
    plane_mask = above_plane(ptc[:, :3], plane, offset=pe.offset, only_range=_t(pe.range))
    lr = cfg.limit_range
    range_mask = (
        (ptc[:, 0] <= lr[0][1]) & (ptc[:, 0] > lr[0][0])
        & (ptc[:, 1] <= lr[1][1]) & (ptc[:, 1] > lr[1][0])
    )
    return plane_mask & range_mask


def _check_clustering_cfg(cfg):
    if cfg.clustering.method != "DBSCAN":
        raise NotImplementedError(cfg.clustering.method)
    assert cfg.graph.neighbor_type == "radius_mutual_knn", cfg.graph.neighbor_type
    assert cfg.graph.affinity_type == "l1", cfg.graph.affinity_type


def _finish_frame(labels: np.ndarray, fit_results, cfg):
    """Volume-filter fitted boxes, zero out rejected clusters, compact ids."""
    objs = []
    lut = np.arange(int(labels.max()) + 1, dtype=labels.dtype)
    for i, obj in fit_results:
        if cfg.filtering.min_volume < obj.volume < cfg.filtering.max_volume:
            objs.append(obj)
        else:
            lut[i] = 0  # one LUT pass replaces a labels==i scan per reject
    labels = lut[labels]
    return _compact_ids(labels), objs


def generate_mask_for_frame(ptc: np.ndarray, pp_score: np.ndarray, calib, cfg):
    """ptc: (N, 4) velodyne points; pp_score: (N,). Returns (labels, objs)."""
    _check_clustering_cfg(cfg)
    final_mask = _frame_final_mask(ptc, cfg)

    labels = np.full(ptc.shape[0], -1, dtype=np.int64)
    labels[final_mask] = dbscan_pp(
        ptc[final_mask, :3],
        pp_score[final_mask],
        n_neighbors=cfg.graph.n_neighbors,
        radius=cfg.graph.radius,
        eps=cfg.clustering.DBSCAN.eps,
        min_samples=cfg.clustering.DBSCAN.min_samples,
    )

    labels = filter_labels(ptc, pp_score, labels, **cfg.filtering.to_dict())

    ptc_rect = calib.project_velo_to_rect(ptc[:, :3])
    from .box_fit import fit_objs_batched

    fits = fit_objs_batched(ptc_rect, labels, int(labels.max()),
                            fit_method=cfg.bbox_gen.fit_method)
    return _finish_frame(labels, fits, cfg)


def generate_masks_for_frames(frames, calibs, cfg):
    """Multi-frame generate_mask_for_frame: ONE batched device dispatch for
    the whole group's clustering (dbscan_pp_many) and one for every frame's
    box-fit angle scans, instead of 2+ round trips per frame. Same outputs.

    frames: list of (ptc (N, 4), pp_score (N,)); calibs: matching list.
    Returns list of (labels, objs).
    """
    from .box_fit import fit_objs_grouped
    from .clustering import dbscan_pp_many

    _check_clustering_cfg(cfg)
    masks = [_frame_final_mask(ptc, cfg) for ptc, _ in frames]
    groups = dbscan_pp_many(
        [(ptc[m, :3], pp[m]) for (ptc, pp), m in zip(frames, masks)],
        n_neighbors=cfg.graph.n_neighbors,
        radius=cfg.graph.radius,
        eps=cfg.clustering.DBSCAN.eps,
        min_samples=cfg.clustering.DBSCAN.min_samples,
    )
    labels_list = []
    fit_groups = []
    for (ptc, pp), m, sub, calib in zip(frames, masks, groups, calibs):
        labels = np.full(ptc.shape[0], -1, dtype=np.int64)
        labels[m] = sub
        labels = filter_labels(ptc, pp, labels, **cfg.filtering.to_dict())
        labels_list.append(labels)
        fit_groups.append((calib.project_velo_to_rect(ptc[:, :3]), labels,
                           int(labels.max())))
    fits = fit_objs_grouped(fit_groups, fit_method=cfg.bbox_gen.fit_method)
    return [_finish_frame(lb, f, cfg) for lb, f in zip(labels_list, fits)]


def _t(pair):
    return tuple(tuple(p) for p in pair)


# ---------------------------------------------------------------------------
# NMS over objs + KITTI label writing (reference pointcloud_utils.py:320-379)
# ---------------------------------------------------------------------------


def objs_to_bev_boxes(objs) -> np.ndarray:
    """objs (camera frame) → (N, 7) lidar-layout boxes for BEV IoU.

    Mirrors objs_nms: (t_x, t_z, 0, l, w, h, -ry) — BEV overlap only cares
    about the (x, z) footprint and the yaw sign flip.
    """
    return np.array(
        [[o.t[0], o.t[2], 0.0, o.l, o.w, o.h, -o.ry] for o in objs], dtype=np.float32
    ).reshape(-1, 7)


def objs_nms(objs, use_score_rank=False, nms_threshold=0.1):
    """Greedy BEV NMS over seed objects.

    Rank: detection score, or BEV area (the reference ranks by the diagonal
    of the IoU matrix — self-IoU ≈ 1 for every box, i.e. fp noise; the
    intended area ranking is used here, reference pointcloud_utils.py:335).
    """
    import jax.numpy as jnp

    from ..ops.iou3d import nms_bev

    if len(objs) == 0:
        return objs
    boxes = objs_to_bev_boxes(objs)
    if use_score_rank:
        scores = np.array([o.score for o in objs], np.float32)
    else:
        scores = (boxes[:, 3] * boxes[:, 4]).astype(np.float32)
    # pad to a size bucket so XLA reuses a handful of compiled programs
    bucket = max(32, 1 << (len(objs) - 1).bit_length())
    pad = bucket - len(objs)
    boxes_p = np.concatenate([boxes, np.zeros((pad, 7), np.float32)])
    scores_p = np.concatenate([scores, np.full(pad, -np.inf, np.float32)])
    keep_idx, keep_mask = nms_bev(
        jnp.asarray(boxes_p), jnp.asarray(scores_p), nms_threshold, max_keep=bucket
    )
    keep = sorted(int(i) for i, m in zip(np.asarray(keep_idx), np.asarray(keep_mask)) if m)
    return [objs[i] for i in keep]


def is_within_fov(obj, calib, image_shape) -> bool:
    center = np.array(obj.t, dtype=np.float64).copy()
    center[1] -= obj.h / 2
    uv = calib.project_rect_to_image(center.reshape(1, -1)).squeeze()
    return bool(
        0 <= uv[0] < image_shape[1] and 0 <= uv[1] < image_shape[0] and center[2] > 0
    )


def objs2label(objs, calib, obj_type="Dynamic", with_score=False) -> str:
    lines = []
    for obj in objs:
        alpha = -np.arctan2(obj.t[0], obj.t[2]) + obj.ry
        corners_2d = kitti_io.compute_box_3d(obj, calib.P)[0]
        min_uv = corners_2d.min(axis=0)
        max_uv = corners_2d.max(axis=0)
        score = getattr(obj, "score", -1)
        line = (
            f"{obj_type} -1 -1 {alpha:.4f} "
            f"{min_uv[0]:.4f} {min_uv[1]:.4f} {max_uv[0]:.4f} {max_uv[1]:.4f} "
            f"{obj.h:.4f} {obj.w:.4f} {obj.l:.4f} "
            f"{obj.t[0]:.4f} {obj.t[1]:.4f} {obj.t[2]:.4f} {obj.ry:.4f}"
        )
        if with_score:
            line += f" {score:.4f}"
        lines.append(line)
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# self-training label fusion (reference combine_labels.py:23-60)
# ---------------------------------------------------------------------------


def predicts2objs(preds: dict) -> list:
    objs = []
    for i in range(preds["location"].shape[0]):
        o = types.SimpleNamespace()
        o.t = preds["location"][i]
        o.l = preds["dimensions"][i][0]
        o.h = preds["dimensions"][i][1]
        o.w = preds["dimensions"][i][2]
        o.ry = preds["rotation_y"][i]
        o.score = preds["score"][i]
        objs.append(o)
    return objs


def add_area_score(objs):
    for o in objs:
        o.score = -999 + o.w * o.l


def filter_by_ppscore(ptc_rect, pp_score, obj, percentile=50, threshold=0.5) -> bool:
    """Keep a detection iff its in-box PP percentile is low (ephemeral)."""
    shifted = ptc_rect[:, [0, 2]] - np.asarray(obj.t)[[0, 2]]
    c, s = np.cos(obj.ry), np.sin(obj.ry)
    u = shifted[:, 0] * c - shifted[:, 1] * s
    v = shifted[:, 0] * s + shifted[:, 1] * c
    mask = (u > -obj.l / 2) & (u < obj.l / 2) & (v > -obj.w / 2) & (v < obj.w / 2)
    mask &= (ptc_rect[:, 1] > obj.t[1] - obj.h) & (ptc_rect[:, 1] <= obj.t[1])
    if mask.sum() == 0 or np.percentile(pp_score[mask], percentile) > threshold:
        return False
    return True


def combine_labels_for_frame(det_preds: dict, gen_objs: list, ptc_rect, pp_score,
                             calib, cfg):
    """One frame of the self-training fusion: PP-filter detections, union
    with area-scored seed boxes, score-ranked NMS, optional FOV filter."""
    det_objs = [
        o
        for o in predicts2objs(det_preds)
        if filter_by_ppscore(
            ptc_rect, pp_score, o,
            percentile=cfg.det_filtering.pp_score_percentile,
            threshold=cfg.det_filtering.pp_score_threshold,
        )
        and o.score > cfg.det_filtering.score_filtering
    ]
    add_area_score(gen_objs)
    objs = det_objs + gen_objs
    if len(objs) > 0:
        objs = objs_nms(objs, nms_threshold=cfg.nms.threshold, use_score_rank=True)
    if cfg.fov_only:
        objs = [o for o in objs if is_within_fov(o, calib, cfg.image_shape)]
    return objs
