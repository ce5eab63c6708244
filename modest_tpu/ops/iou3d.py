"""Rotated BEV IoU / 3D IoU / rotated NMS — TPU-native (pure XLA, vmap-able).

Replaces the reference's CUDA extension (generate_cluster_mask/utils/iou3d_nms
and pcdet/ops/iou3d_nms, kernels in src/iou3d_nms_kernel.cu) with a fully
vectorized convex-polygon-intersection formulation:

  candidate vertices of A∩B = {A corners inside B} ∪ {B corners inside A}
                              ∪ {edge×edge intersection points}  (≤ 24)
  area = shoelace over the angle-sorted valid candidates.

Everything is static-shape and branch-free, so a (N, M) overlap matrix is one
fused XLA program on the VPU — no per-pair kernel launches.

Box layout: (x, y, z, dx, dy, dz, heading); (x, y, z) is the box center,
heading CCW around +z (same as the reference, iou3d_nms_kernel.cu:129).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

EPS = 1e-8
MARGIN = 1e-2  # corner-inside-box slack, matches reference check_in_box2d


def _bev_corners(box):
    """(7,) box → (4, 2) BEV corners, CCW starting at (-dx/2, -dy/2) rotated.

    Elementwise on purpose: a 4x2 matmul would hit the MXU in bf16 on TPU and
    lose ~3 decimal digits; the VPU keeps this exactly fp32.
    """
    cx, cy, dx, dy, ang = box[0], box[1], box[3], box[4], box[6]
    local = jnp.array([[-0.5, -0.5], [0.5, -0.5], [0.5, 0.5], [-0.5, 0.5]])
    lx = local[:, 0] * dx
    ly = local[:, 1] * dy
    c, s = jnp.cos(ang), jnp.sin(ang)
    wx = lx * c - ly * s + cx
    wy = lx * s + ly * c + cy
    return jnp.stack([wx, wy], axis=1)


def _point_in_box(box, pts):
    """pts (..., 2) inside the rotated BEV rect of box (with MARGIN slack)."""
    shift = pts - box[0:2]
    c, s = jnp.cos(-box[6]), jnp.sin(-box[6])
    rx = shift[..., 0] * c - shift[..., 1] * s
    ry = shift[..., 0] * s + shift[..., 1] * c
    return (jnp.abs(rx) < box[3] / 2 + MARGIN) & (jnp.abs(ry) < box[4] / 2 + MARGIN)


def _segment_intersections(ca, cb):
    """All 16 intersection points between edges of corner sets ca, cb (4,2).

    Returns (16, 2) points and (16,) validity. Uses the same strict
    cross-sign test as the reference (iou3d_nms_kernel.cu intersection()).
    """
    pa0 = ca  # (4,2) edge starts
    pa1 = jnp.roll(ca, -1, axis=0)  # edge ends
    pb0 = cb
    pb1 = jnp.roll(cb, -1, axis=0)

    # broadcast to (4,4,2): a-edge i × b-edge j
    p0 = pa0[:, None, :]
    p1 = pa1[:, None, :]
    q0 = pb0[None, :, :]
    q1 = pb1[None, :, :]

    def cross(o, a, b):
        return (a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1]) - (
            b[..., 0] - o[..., 0]
        ) * (a[..., 1] - o[..., 1])

    s1 = cross(p0, q0, p1)
    s2 = cross(p0, p1, q1)
    s3 = cross(q0, p0, q1)
    s4 = cross(q0, q1, p1)
    valid = (s1 * s2 > 0) & (s3 * s4 > 0)

    s5 = cross(p0, q1, p1)
    denom = s5 - s1
    safe = jnp.where(jnp.abs(denom) > EPS, denom, 1.0)
    ix = (s5 * q0[..., 0] - s1 * q1[..., 0]) / safe
    iy = (s5 * q0[..., 1] - s1 * q1[..., 1]) / safe
    # parallel-edge fallback (reference handles |s5-s1|<=EPS via line forms);
    # with the strict sign test above, truly parallel edges are never valid,
    # so masking to the midpoint is safe.
    valid = valid & (jnp.abs(denom) > EPS)
    pts = jnp.stack([ix, iy], axis=-1).reshape(16, 2)
    return pts, valid.reshape(16)


def _pair_overlap(box_a, box_b):
    """Exact BEV intersection area of two rotated boxes (scalar)."""
    ca = _bev_corners(box_a)
    cb = _bev_corners(box_b)

    ipts, ivalid = _segment_intersections(ca, cb)
    a_in_b = _point_in_box(box_b, ca)  # (4,)
    b_in_a = _point_in_box(box_a, cb)  # (4,)

    pts = jnp.concatenate([ipts, ca, cb], axis=0)  # (24, 2)
    valid = jnp.concatenate([ivalid, a_in_b, b_in_a], axis=0)  # (24,)

    cnt = valid.sum()
    center = jnp.where(
        cnt > 0, (pts * valid[:, None]).sum(0) / jnp.maximum(cnt, 1), jnp.zeros(2)
    )
    ang = jnp.arctan2(pts[:, 1] - center[1], pts[:, 0] - center[0])
    ang = jnp.where(valid, ang, jnp.inf)  # invalid points sort last
    order = jnp.argsort(ang)
    sp = pts[order]
    sv = valid[order]

    # fan triangulation from sp[0]; pad invalid points to sp[0] → zero cross
    anchor = sp[0]
    sp = jnp.where(sv[:, None], sp, anchor)
    v = sp - anchor
    crosses = v[:-1, 0] * v[1:, 1] - v[1:, 0] * v[:-1, 1]
    area = 0.5 * jnp.abs(crosses.sum())
    return jnp.where(cnt >= 3, area, 0.0)


@jax.jit
def boxes_overlap_bev(boxes_a, boxes_b):
    """(N, 7), (M, 7) → (N, M) BEV intersection areas."""
    return jax.vmap(lambda a: jax.vmap(lambda b: _pair_overlap(a, b))(boxes_b))(boxes_a)


@jax.jit
def boxes_iou_bev(boxes_a, boxes_b):
    """(N, 7), (M, 7) → (N, M) rotated BEV IoU (reference boxes_iou_bev)."""
    overlap = boxes_overlap_bev(boxes_a, boxes_b)
    sa = (boxes_a[:, 3] * boxes_a[:, 4])[:, None]
    sb = (boxes_b[:, 3] * boxes_b[:, 4])[None, :]
    return overlap / jnp.maximum(sa + sb - overlap, EPS)


@jax.jit
def boxes_iou3d(boxes_a, boxes_b):
    """(N, 7), (M, 7) → (N, M) 3D IoU (reference boxes_iou3d_gpu:54-87)."""
    overlap_bev = boxes_overlap_bev(boxes_a, boxes_b)
    a_max = (boxes_a[:, 2] + boxes_a[:, 5] / 2)[:, None]
    a_min = (boxes_a[:, 2] - boxes_a[:, 5] / 2)[:, None]
    b_max = (boxes_b[:, 2] + boxes_b[:, 5] / 2)[None, :]
    b_min = (boxes_b[:, 2] - boxes_b[:, 5] / 2)[None, :]
    overlap_h = jnp.clip(jnp.minimum(a_max, b_max) - jnp.maximum(a_min, b_min), 0, None)
    overlap_3d = overlap_bev * overlap_h
    vol_a = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vol_b = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    return overlap_3d / jnp.maximum(vol_a + vol_b - overlap_3d, 1e-6)


def _iou_bev_one_to_many(box, boxes):
    """(7,), (N, 7) → (N,) BEV IoU row."""
    overlap = jax.vmap(lambda b: _pair_overlap(box, b))(boxes)
    sa = box[3] * box[4]
    sb = boxes[:, 3] * boxes[:, 4]
    return overlap / jnp.maximum(sa + sb - overlap, EPS)


@partial(jax.jit, static_argnames=("max_keep",))
def nms_bev(boxes, scores, thresh, max_keep: int, valid_mask=None):
    """Greedy rotated-BEV NMS over padded boxes.

    Instead of materializing the full (N, N) IoU matrix (the CUDA 64-bit-mask
    formulation), runs max_keep rounds of [argmax score → suppress one IoU
    row], which is O(max_keep · N) pair overlaps — far cheaper on TPU when
    max_keep ≪ N, and fully static-shape.

    Args:
      boxes: (N, 7) padded boxes.
      scores: (N,) scores; padding rows must carry -inf (or use valid_mask).
      thresh: IoU threshold.
      max_keep: number of output slots (static).
      valid_mask: optional (N,) bool of real rows.

    Returns:
      keep_idx: (max_keep,) int32 indices into boxes (garbage past num_keep).
      keep_mask: (max_keep,) bool validity of each output slot.
    """
    neg_inf = jnp.array(-jnp.inf, dtype=scores.dtype)
    alive = jnp.where(valid_mask, scores, neg_inf) if valid_mask is not None else scores

    def body(alive, _):
        idx = jnp.argmax(alive)
        ok = alive[idx] > neg_inf
        iou_row = _iou_bev_one_to_many(boxes[idx], boxes)
        suppress = iou_row > thresh
        suppress = suppress.at[idx].set(True)
        new_alive = jnp.where(ok & suppress, neg_inf, alive)
        return new_alive, (idx.astype(jnp.int32), ok)

    _, (keep_idx, keep_mask) = jax.lax.scan(body, alive, None, length=max_keep)
    return keep_idx, keep_mask


def class_agnostic_nms(box_scores, box_preds, nms_thresh, score_thresh=None,
                       pre_maxsize=None, post_maxsize=512):
    """Score-thresholded rotated NMS (reference model_nms_utils.py:6-34).

    Works on padded inputs; returns (post_maxsize,) indices + validity mask.
    """
    valid = jnp.isfinite(box_scores)
    if score_thresh is not None:
        valid = valid & (box_scores > score_thresh)
    scores = jnp.where(valid, box_scores, -jnp.inf)
    if pre_maxsize is not None and pre_maxsize < scores.shape[0]:
        top_scores, top_idx = jax.lax.top_k(scores, pre_maxsize)
        keep_idx, keep_mask = nms_bev(box_preds[top_idx], top_scores, nms_thresh, post_maxsize)
        return top_idx[keep_idx], keep_mask
    keep_idx, keep_mask = nms_bev(box_preds, scores, nms_thresh, post_maxsize)
    return keep_idx, keep_mask
