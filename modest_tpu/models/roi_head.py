"""Stage-2 RoI head (PointRCNN refinement).

Reference: pcdet/models/roi_heads/pointrcnn_head.py, roi_head_template.py,
target_assigner/proposal_target_layer.py. RoI sampling is re-formulated with
static shapes: pool compaction + traced-bound random indexing replaces the
reference's data-dependent nonzero()/cat() logic, with the same sampling
distribution (fg without replacement, hard/easy bg with replacement at
HARD_BG_RATIO, and the same pool-empty fallbacks).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import pointnet2 as p2
from ..ops.box_jax import rotate_points_along_z
from ..ops.iou3d import boxes_iou3d, nms_bev
from .box_coders import ResidualCoder
from .layers import FCHead, SharedMLP
from .losses import binary_cross_entropy, corner_loss_lidar, weighted_smooth_l1
from .pointnet2_backbone import SAModule

TWO_PI = 2 * jnp.pi


# ---------------------------------------------------------------------------
# proposal layer (reference roi_head_template.proposal_layer:45-99)
# ---------------------------------------------------------------------------


def proposal_layer(box_preds, cls_preds, nms_pre: int, nms_post: int, nms_thresh: float):
    """box_preds (B, N, 7), cls_preds (B, N, C) →
    rois (B, nms_post, 7), roi_scores (B, nms_post), roi_labels (B, nms_post),
    roi_valid (B, nms_post). Scores are raw logits (sigmoid is monotonic).

    Proposals are gradient-stopped like the reference's @torch.no_grad()
    proposal_layer — stage 1 learns only from its own losses, and the
    backward graph skips NMS/decode entirely."""
    box_preds = jax.lax.stop_gradient(box_preds)
    cls_preds = jax.lax.stop_gradient(cls_preds)

    def per_sample(boxes, cls):
        scores = cls.max(axis=-1)
        labels = cls.argmax(axis=-1)
        if nms_pre < scores.shape[0]:
            top_scores, top_idx = jax.lax.top_k(scores, nms_pre)
        else:
            top_scores, top_idx = scores, jnp.arange(scores.shape[0])
        keep, keep_mask = nms_bev(boxes[top_idx], top_scores, nms_thresh, nms_post)
        sel = top_idx[keep]
        rois = jnp.where(keep_mask[:, None], boxes[sel], 0.0)
        roi_scores = jnp.where(keep_mask, scores[sel], 0.0)
        roi_labels = jnp.where(keep_mask, labels[sel] + 1, 0)
        return rois, roi_scores, roi_labels, keep_mask

    return jax.vmap(per_sample)(box_preds, cls_preds)


# ---------------------------------------------------------------------------
# train-time RoI sampling (reference proposal_target_layer.py)
# ---------------------------------------------------------------------------


def _randint(key, shape, bound):
    """Uniform ints in [0, bound) with a traced bound (bound >= 1)."""
    u = jax.random.uniform(key, shape)
    return jnp.minimum((u * bound).astype(jnp.int32), bound - 1)


def _compact(mask):
    """Indices of True entries first (stable), plus the count."""
    order = jnp.argsort(~mask, stable=True)
    return order.astype(jnp.int32), mask.sum().astype(jnp.int32)


def sample_rois_for_rcnn(rng, rois, roi_scores, roi_labels, gt_boxes, cfg):
    """Subsample ROI_PER_IMAGE rois per scene with fg/bg balancing.

    rois (B, R, 7); gt_boxes (B, M, 8). Returns dict of (B, S, ...) tensors.
    """
    S = int(cfg.ROI_PER_IMAGE)
    fg_per_image = int(round(cfg.FG_RATIO * S))
    fg_thresh = min(cfg.REG_FG_THRESH, cfg.CLS_FG_THRESH)

    by_class = bool(cfg.get("SAMPLE_ROI_BY_EACH_CLASS", False))

    def per_sample(key, roi, score, label, gt):
        gt_valid = jnp.abs(gt).sum(-1) > 0
        iou = boxes_iou3d(roi, gt[:, :7])
        pair_ok = gt_valid[None, :]
        if by_class:
            # reference get_max_iou_with_same_class: a roi only matches gts
            # of its own predicted class (multi-class configs)
            pair_ok = pair_ok & (label[:, None].astype(jnp.int32)
                                 == gt[:, -1].astype(jnp.int32)[None, :])
        iou = jnp.where(pair_ok, iou, -1.0)
        max_ov = jnp.clip(iou.max(axis=1), 0.0, None)
        gt_assign = iou.argmax(axis=1)

        fg_mask = max_ov >= fg_thresh
        easy_mask = max_ov < cfg.CLS_BG_THRESH_LO
        hard_mask = (max_ov < cfg.REG_FG_THRESH) & (max_ov >= cfg.CLS_BG_THRESH_LO)
        n_fg_avail = fg_mask.sum()
        n_easy = easy_mask.sum()
        n_hard = hard_mask.sum()
        n_bg_avail = n_easy + n_hard

        n_fg = jnp.minimum(fg_per_image, n_fg_avail)
        # pool-empty fallbacks (reference subsample_rois:130-159)
        n_fg = jnp.where(n_bg_avail == 0, jnp.where(n_fg_avail > 0, S, 0), n_fg)
        n_bg = S - n_fg

        k_fg, k_hard, k_easy = jax.random.split(key, 3)
        # fg: random permutation of the fg pool (without replacement; wraps
        # via modulo in the all-fg fallback, matching randint-with-replacement
        # closely enough)
        prio = jax.random.uniform(k_fg, fg_mask.shape) + jnp.where(fg_mask, 0.0, -10.0)
        fg_order = jnp.argsort(-prio).astype(jnp.int32)
        slot = jnp.arange(S, dtype=jnp.int32)
        fg_pick = fg_order[slot % jnp.maximum(n_fg_avail, 1)]

        # bg: hard first then easy, both with replacement. The hard quota is
        # capped by the HARD POOL SIZE (reference sample_bg_inds:
        # min(int(bg*ratio), len(hard_bg_inds))) — capping by n_bg would
        # resample a tiny hard pool ~n_bg times and starve the easy pool
        hard_target = jnp.minimum(
            (n_bg.astype(jnp.float32) * cfg.HARD_BG_RATIO).astype(jnp.int32),
            n_hard,
        )
        hard_target = jnp.where(n_hard == 0, 0, jnp.where(n_easy == 0, n_bg, hard_target))
        hard_idx, _ = _compact(hard_mask)
        easy_idx, _ = _compact(easy_mask)
        hard_pick = hard_idx[_randint(k_hard, (S,), jnp.maximum(n_hard, 1))]
        easy_pick = easy_idx[_randint(k_easy, (S,), jnp.maximum(n_easy, 1))]

        bg_slot = slot - n_fg
        is_fg_slot = slot < n_fg
        is_hard_slot = (~is_fg_slot) & (bg_slot < hard_target)
        pick = jnp.where(is_fg_slot, fg_pick, jnp.where(is_hard_slot, hard_pick, easy_pick))

        s_rois = roi[pick]
        s_ov = max_ov[pick]
        s_scores = score[pick]
        s_labels = label[pick]
        s_gt = gt[jnp.clip(gt_assign[pick], 0, None)]

        reg_valid = (s_ov > cfg.REG_FG_THRESH).astype(jnp.int32)
        if cfg.get("CLS_SCORE_TYPE", "cls") == "roi_iou":
            # soft labels: IoU interpolated between bg/fg thresholds
            # (reference proposal_target_layer.py:44-53)
            soft = (s_ov - cfg.CLS_BG_THRESH) / (cfg.CLS_FG_THRESH - cfg.CLS_BG_THRESH)
            cls_labels = jnp.clip(soft, 0.0, 1.0).astype(jnp.float32)
        else:
            cls_labels = (s_ov > cfg.CLS_FG_THRESH).astype(jnp.float32)
            interval = (s_ov > cfg.CLS_BG_THRESH) & (s_ov < cfg.CLS_FG_THRESH)
            cls_labels = jnp.where(interval, -1.0, cls_labels)
        return dict(rois=s_rois, gt_of_rois=s_gt, gt_iou_of_rois=s_ov,
                    roi_scores=s_scores, roi_labels=s_labels,
                    reg_valid_mask=reg_valid, rcnn_cls_labels=cls_labels)

    keys = jax.random.split(rng, rois.shape[0])
    return jax.vmap(per_sample)(keys, rois, roi_scores, roi_labels, gt_boxes)


def canonical_transform_gt(rois, gt_of_rois):
    """Express gt boxes in each roi's canonical frame with heading flip.

    Reference roi_head_template.assign_targets:110-130.
    """
    roi_center = rois[..., 0:3]
    roi_ry = rois[..., 6] % TWO_PI
    gt = gt_of_rois.at[..., 0:3].add(-roi_center)
    gt = gt.at[..., 6].add(-roi_ry)
    gt_xyz = rotate_points_along_z(gt[..., None, 0:3], -roi_ry)[..., 0, :]
    gt = gt.at[..., 0:3].set(gt_xyz)

    heading = gt[..., 6] % TWO_PI
    opposite = (heading > jnp.pi * 0.5) & (heading < jnp.pi * 1.5)
    heading = jnp.where(opposite, (heading + jnp.pi) % TWO_PI, heading)
    heading = jnp.where(heading > jnp.pi, heading - TWO_PI, heading)
    heading = jnp.clip(heading, -jnp.pi / 2, jnp.pi / 2)
    return gt.at[..., 6].set(heading)


# ---------------------------------------------------------------------------
# the head network
# ---------------------------------------------------------------------------


class PointRCNNHead(nn.Module):
    """xyz-up + merge-down + 3-level SA tower + cls/reg heads."""

    num_class: int
    xyz_up_layer: tuple
    cls_fc: tuple
    reg_fc: tuple
    sa_npoints: tuple
    sa_radii: tuple
    sa_nsamples: tuple
    sa_mlps: tuple
    code_size: int
    use_bn: bool = False
    num_prefix_channels: int = 5  # xyz + point_score + point_depth

    @nn.compact
    def __call__(self, pooled_features, train: bool = False):
        """pooled_features (BR, ns, 5 + C) → (rcnn_cls (BR, 1), rcnn_reg (BR, code))."""
        pre = self.num_prefix_channels
        xyz_input = pooled_features[..., :pre]
        xyz_feat = SharedMLP(tuple(self.xyz_up_layer), use_bn=self.use_bn)(xyz_input, train=train)
        pt_feat = pooled_features[..., pre:]
        merged = jnp.concatenate([xyz_feat, pt_feat], axis=-1)
        merged = SharedMLP((int(self.xyz_up_layer[-1]),), use_bn=self.use_bn)(merged, train=train)

        l_xyz = pooled_features[..., 0:3]
        l_feat = merged
        for i, npoint in enumerate(self.sa_npoints):
            np_i = None if npoint == -1 else int(npoint)
            l_xyz, l_feat = SAModule(
                npoint=np_i, radius=float(self.sa_radii[i]),
                nsample=int(self.sa_nsamples[i]), mlp=tuple(self.sa_mlps[i]),
            )(l_xyz, l_feat, train=train)

        shared = l_feat[:, 0, :]  # (BR, C) after GroupAll
        rcnn_cls = FCHead(tuple(self.cls_fc), self.num_class)(shared, train=train)
        rcnn_reg = FCHead(
            tuple(self.reg_fc), self.code_size * self.num_class
        )(shared, train=train)
        return rcnn_cls, rcnn_reg


def pool_roi_features(point_coords, point_features, point_scores, rois, roi_valid,
                      num_sampled_points: int, depth_normalizer: float,
                      pool_extra_width=(0.0, 0.0, 0.0)):
    """roipool3d + canonical transform (reference pointrcnn_head.py:85-130).

    point_coords (B, N, 3); point_features (B, N, C); point_scores (B, N);
    rois (B, R, 7). Returns (B*R, ns, 5 + C).
    """
    depth = jnp.linalg.norm(point_coords, axis=-1) / depth_normalizer - 0.5
    feats_all = jnp.concatenate(
        [point_scores[..., None], depth[..., None], point_features], axis=-1
    )
    pooled, empty = p2.roipoint_pool3d(
        point_coords, feats_all, rois, num_sampled_points, pool_extra_width
    )  # (B, R, ns, 3 + (2+C)), (B, R)
    pooled = pooled.at[..., 0:3].add(-rois[:, :, None, 0:3])
    b, r, ns, c = pooled.shape
    pooled = pooled.reshape(b * r, ns, c)
    ry = rois[..., 6].reshape(-1)
    xyz = rotate_points_along_z(pooled[..., 0:3], -ry)
    pooled = pooled.at[..., 0:3].set(xyz)
    dead = (empty.reshape(-1) > 0) | ~roi_valid.reshape(-1)
    return jnp.where(dead[:, None, None], 0.0, pooled)


# ---------------------------------------------------------------------------
# losses (reference roi_head_template.py:133-228)
# ---------------------------------------------------------------------------


def roi_head_loss(rcnn_cls, rcnn_reg, targets, box_coder: ResidualCoder,
                  code_weights, cls_weight=1.0, reg_weight=1.0, corner_weight=1.0):
    code_size = box_coder.code_size
    rcnn_cls_labels = targets["rcnn_cls_labels"].reshape(-1)
    reg_valid = targets["reg_valid_mask"].reshape(-1)
    gt_ct = targets["gt_of_rois_ct"][..., :code_size].reshape(-1, code_size)
    gt_src = targets["gt_of_rois_src"][..., :code_size].reshape(-1, code_size)
    rois = targets["rois"].reshape(-1, targets["rois"].shape[-1])

    # cls: BCE over sigmoid with ignore(-1)
    probs = jax.nn.sigmoid(rcnn_cls.reshape(-1))
    cls_valid = (rcnn_cls_labels >= 0).astype(jnp.float32)
    bce = binary_cross_entropy(probs, jnp.clip(rcnn_cls_labels, 0, None).astype(jnp.float32))
    loss_cls = (bce * cls_valid).sum() / jnp.clip(cls_valid.sum(), 1.0, None) * cls_weight

    # reg: smooth-L1 on residuals encoded vs zero-centered roi anchors
    fg = reg_valid > 0
    fg_f = fg.astype(jnp.float32)
    fg_sum = jnp.clip(fg_f.sum(), 1.0, None)
    rois_anchor = rois[:, :code_size]
    rois_anchor = rois_anchor.at[:, 0:3].set(0.0).at[:, 6].set(0.0)
    reg_targets = box_coder.encode(gt_ct, rois_anchor)
    reg_l = weighted_smooth_l1(
        rcnn_reg.reshape(1, -1, code_size), reg_targets[None], code_weights=code_weights
    )[0]
    loss_reg = (reg_l.sum(-1) * fg_f).sum() / fg_sum * reg_weight

    # corner loss on decoded fg boxes in the original frame; NOTE the decode
    # anchors keep the roi heading (only xyz zeroed) — reference
    # roi_head_template.py:170-181 vs the ry=0 anchors used for reg targets
    anchors_c = rois[:, :code_size].at[:, 0:3].set(0.0)
    decoded = box_coder.decode(rcnn_reg.reshape(-1, code_size), anchors_c)
    roi_ry = rois[:, 6]
    decoded = rotate_points_along_z(decoded[:, None, :], roi_ry)[:, 0, :]
    decoded = decoded.at[:, 0:3].add(rois[:, 0:3])
    corner = corner_loss_lidar(decoded[:, :7], gt_src[:, :7])
    loss_corner = (corner * fg_f).sum() / fg_sum * corner_weight

    return loss_cls, loss_reg, loss_corner


def generate_refined_boxes(rois, cls_preds, box_preds, box_coder: ResidualCoder):
    """Decode rcnn_reg in each roi's frame (reference :230-258).

    rois (B, R, 7); cls_preds (BR, 1); box_preds (BR, code) →
    (batch_cls (B, R, 1), batch_boxes (B, R, 7)).
    """
    b, r = rois.shape[0], rois.shape[1]
    code_size = box_coder.code_size
    flat_rois = rois.reshape(-1, rois.shape[-1])
    local = flat_rois[:, :code_size].at[:, 0:3].set(0.0)
    decoded = box_coder.decode(box_preds.reshape(-1, code_size), local)
    decoded = rotate_points_along_z(decoded[:, None, :], flat_rois[:, 6])[:, 0, :]
    decoded = decoded.at[:, 0:3].add(flat_rois[:, 0:3])
    return cls_preds.reshape(b, r, -1), decoded.reshape(b, r, code_size)
