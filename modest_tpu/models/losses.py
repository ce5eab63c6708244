"""Detection losses (jnp) — reference pcdet/utils/loss_utils.py."""
from __future__ import annotations

import jax.numpy as jnp

from ..ops.box_jax import boxes_to_corners_3d


def sigmoid_ce_with_logits(logits, targets):
    return jnp.clip(logits, 0, None) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def sigmoid_focal_loss(logits, targets, weights, gamma=2.0, alpha=0.25):
    """(..., C) logits/one-hot targets, (...,) anchor weights → weighted loss."""
    pred = jnp.clip(jnp.reciprocal(1 + jnp.exp(-logits)), 0.0, 1.0)
    alpha_w = targets * alpha + (1 - targets) * (1 - alpha)
    pt = targets * (1.0 - pred) + (1.0 - targets) * pred
    focal = alpha_w * jnp.power(pt, gamma)
    loss = focal * sigmoid_ce_with_logits(logits, targets)
    return loss * weights[..., None]


def smooth_l1(diff, beta=1.0 / 9.0):
    n = jnp.abs(diff)
    if beta < 1e-5:
        return n
    return jnp.where(n < beta, 0.5 * n * n / beta, n - 0.5 * beta)


def weighted_smooth_l1(preds, targets, weights=None, code_weights=None, beta=1.0 / 9.0):
    """(..., C) → (..., C); nan targets are ignored (reference :122)."""
    targets = jnp.where(jnp.isnan(targets), preds, targets)
    diff = preds - targets
    if code_weights is not None:
        diff = diff * jnp.asarray(code_weights, diff.dtype)
    loss = smooth_l1(diff, beta)
    if weights is not None:
        loss = loss * weights[..., None]
    return loss


def binary_cross_entropy(probs, targets):
    probs = jnp.clip(probs, 1e-7, 1 - 1e-7)
    return -(targets * jnp.log(probs) + (1 - targets) * jnp.log(1 - probs))


def corner_loss_lidar(pred_boxes, gt_boxes):
    """(N, 7) → (N,) corner loss with heading-flip min (reference :209-232)."""
    pred_c = boxes_to_corners_3d(pred_boxes)
    gt_c = boxes_to_corners_3d(gt_boxes)
    gt_flip = gt_boxes.at[:, 6].add(jnp.pi)
    gt_c_flip = boxes_to_corners_3d(gt_flip)
    dist = jnp.minimum(
        jnp.linalg.norm(pred_c - gt_c, axis=2),
        jnp.linalg.norm(pred_c - gt_c_flip, axis=2),
    )
    return smooth_l1(dist, beta=1.0).mean(axis=1)
