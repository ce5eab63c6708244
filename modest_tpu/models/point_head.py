"""Stage-1 point head: per-point foreground classification + box regression.

Reference: pcdet/models/dense_heads/point_head_box.py + point_head_template.py.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.box_jax import enlarge_box3d, points_in_boxes_index
from .box_coders import PointResidualCoder
from .layers import FCHead
from .losses import sigmoid_focal_loss, weighted_smooth_l1


class PointHeadBox(nn.Module):
    num_class: int
    cls_fc: tuple
    reg_fc: tuple
    code_size: int

    @nn.compact
    def __call__(self, point_features, train: bool = False):
        """(B, N, C) → (cls_preds (B, N, num_class), box_preds (B, N, code))."""
        cls_preds = FCHead(tuple(self.cls_fc), self.num_class)(point_features, train=train)
        box_preds = FCHead(tuple(self.reg_fc), self.code_size)(point_features, train=train)
        return cls_preds, box_preds


def assign_point_targets(points_xyz, gt_boxes, box_coder: PointResidualCoder,
                         gt_extra_width=(0.2, 0.2, 0.2), num_class: int = 1):
    """Per-point cls/box targets (reference assign_stack_targets:49-129).

    points_xyz: (B, N, 3); gt_boxes: (B, M, 8) zero-padded, last col = class.
    Returns cls_labels (B, N) int32 (0 bg, -1 ignore, 1..C fg),
            box_labels (B, N, 8) (zeros off-fg).
    """
    extend = enlarge_box3d(gt_boxes[..., :7], gt_extra_width)

    def per_sample(xyz, gt, ext):
        valid = jnp.abs(gt).sum(-1) > 0
        idx = points_in_boxes_index(xyz, gt[:, :7], valid)
        ext_idx = points_in_boxes_index(xyz, ext, valid)
        fg = idx >= 0
        ignore = fg ^ (ext_idx >= 0)

        gt_of_pts = gt[jnp.clip(idx, 0, None)]  # (N, 8)
        cls_of_pts = gt_of_pts[:, -1].astype(jnp.int32)
        labels = jnp.where(
            fg, cls_of_pts if num_class > 1 else jnp.int32(1), jnp.int32(0)
        )
        labels = jnp.where(ignore, jnp.int32(-1), labels)

        box_labels = box_coder.encode(gt_of_pts[:, :7], xyz, cls_of_pts)
        box_labels = jnp.where(fg[:, None], box_labels, 0.0)
        return labels, box_labels

    return jax.vmap(per_sample)(points_xyz, gt_boxes, extend)


def point_head_loss(cls_preds, box_preds, cls_labels, box_labels, num_class: int,
                    cls_weight=1.0, box_weight=1.0, code_weights=None):
    """Focal cls + smooth-L1 reg (reference point_head_template.py:131-191)."""
    cls_preds = cls_preds.reshape(-1, num_class)
    cls_labels = cls_labels.reshape(-1)
    positives = cls_labels > 0
    negatives = cls_labels == 0
    cls_w = (negatives + 1.0 * positives).astype(jnp.float32)
    pos_norm = jnp.clip(positives.sum().astype(jnp.float32), 1.0, None)
    cls_w = cls_w / pos_norm
    one_hot = jax.nn.one_hot(jnp.clip(cls_labels, 0, None), num_class + 1)[:, 1:]
    loss_cls = sigmoid_focal_loss(cls_preds, one_hot, cls_w).sum() * cls_weight

    box_preds = box_preds.reshape(-1, box_preds.shape[-1])
    box_labels = box_labels.reshape(-1, box_labels.shape[-1])
    reg_w = positives.astype(jnp.float32)
    reg_w = reg_w / jnp.clip(reg_w.sum(), 1.0, None)
    loss_box = weighted_smooth_l1(
        box_preds[None], box_labels[None], reg_w[None], code_weights
    ).sum() * box_weight
    return loss_cls, loss_box, pos_norm
