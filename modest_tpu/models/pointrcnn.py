"""PointRCNN detector — full two-stage model + loss + post-processing.

Reference: pcdet/models/detectors/point_rcnn.py (topology) together with the
config tools/cfgs/lyft_models/pointrcnn_dynamic_obj.yaml. One flax module;
train/eval behavior is selected by the static `train` flag, the RoI sampler
draws from the 'sampler' RNG stream.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.iou3d import nms_bev
from .box_coders import PointResidualCoder, ResidualCoder
from .point_head import PointHeadBox, assign_point_targets, point_head_loss
from .pointnet2_backbone import PointNet2MSG
from .roi_head import (
    PointRCNNHead,
    canonical_transform_gt,
    generate_refined_boxes,
    pool_roi_features,
    proposal_layer,
    roi_head_loss,
    sample_rois_for_rcnn,
)


def make_point_coder(model_cfg):
    from ..utils.config import Config

    cfg = Config(model_cfg)
    return PointResidualCoder(**cfg.POINT_HEAD.TARGET_CONFIG.BOX_CODER_CONFIG.to_dict())


def make_roi_coder(model_cfg):
    return ResidualCoder()


class PointRCNN(nn.Module):
    model_cfg: Any
    num_class: int
    point_cloud_range: Any = None

    def setup(self):
        from ..utils.config import Config

        cfg = Config(self.model_cfg)  # flax freezes dict fields → re-wrap
        bb = cfg.BACKBONE_3D
        self.backbone = PointNet2MSG(
            sa_npoints=tuple(bb.SA_CONFIG.NPOINTS),
            sa_radii=tuple(tuple(r) for r in bb.SA_CONFIG.RADIUS),
            sa_nsamples=tuple(tuple(s) for s in bb.SA_CONFIG.NSAMPLE),
            sa_mlps=tuple(tuple(tuple(m) for m in lvl) for lvl in bb.SA_CONFIG.MLPS),
            fp_mlps=tuple(tuple(m) for m in bb.FP_MLPS),
        )
        ph = cfg.POINT_HEAD
        self.point_coder = PointResidualCoder(**ph.TARGET_CONFIG.BOX_CODER_CONFIG.to_dict())
        self.point_head = PointHeadBox(
            num_class=self.num_class if not ph.CLASS_AGNOSTIC else 1,
            cls_fc=tuple(ph.CLS_FC),
            reg_fc=tuple(ph.REG_FC),
            code_size=self.point_coder.code_size,
        )
        rh = cfg.ROI_HEAD
        self.roi_coder = ResidualCoder()
        self.roi_head = PointRCNNHead(
            num_class=1 if rh.CLASS_AGNOSTIC else self.num_class,
            xyz_up_layer=tuple(rh.XYZ_UP_LAYER),
            cls_fc=tuple(rh.CLS_FC),
            reg_fc=tuple(rh.REG_FC),
            sa_npoints=tuple(rh.SA_CONFIG.NPOINTS),
            sa_radii=tuple(rh.SA_CONFIG.RADIUS),
            sa_nsamples=tuple(rh.SA_CONFIG.NSAMPLE),
            sa_mlps=tuple(tuple(m) for m in rh.SA_CONFIG.MLPS),
            code_size=self.roi_coder.code_size,
            use_bn=bool(rh.USE_BN),
        )

    def __call__(self, points, gt_boxes=None, train: bool = False):
        """points (B, N, 4); gt_boxes (B, M, 8) zero-padded (train only).

        Returns a dict of tensors; feed to pointrcnn_loss / post_process.
        """
        from ..utils.config import Config

        cfg = Config(self.model_cfg)
        xyz = points[..., :3]
        b, n = points.shape[0], points.shape[1]

        feats = self.backbone(points, train=train)  # (B, N, C)
        point_cls, point_box = self.point_head(feats, train=train)
        point_scores = jax.nn.sigmoid(point_cls.max(axis=-1))  # (B, N)
        pred_classes = point_cls.argmax(axis=-1) + 1

        decoded = self.point_coder.decode(
            point_box.reshape(-1, self.point_coder.code_size),
            xyz.reshape(-1, 3),
            pred_classes.reshape(-1),
        ).reshape(b, n, 7)

        nms_cfg = cfg.ROI_HEAD.NMS_CONFIG["TRAIN" if train else "TEST"]
        rois, roi_scores, roi_labels, roi_valid = proposal_layer(
            decoded, point_cls,
            nms_pre=int(nms_cfg.NMS_PRE_MAXSIZE),
            nms_post=int(nms_cfg.NMS_POST_MAXSIZE),
            nms_thresh=float(nms_cfg.NMS_THRESH),
        )

        out = {
            "point_xyz": xyz,
            "point_cls_preds": point_cls,
            "point_box_preds": point_box,
            "point_boxes_decoded": decoded,
        }

        if train:
            targets = sample_rois_for_rcnn(
                self.make_rng("sampler"), rois, roi_scores, roi_labels,
                gt_boxes, cfg.ROI_HEAD.TARGET_CONFIG,
            )
            rois = targets["rois"]
            roi_valid = jnp.ones(rois.shape[:2], bool)
            targets["gt_of_rois_src"] = targets["gt_of_rois"]
            targets["gt_of_rois_ct"] = canonical_transform_gt(rois, targets["gt_of_rois"])
            out["roi_targets"] = targets

        pooled = pool_roi_features(
            xyz, feats, point_scores, rois, roi_valid,
            num_sampled_points=int(cfg.ROI_HEAD.ROI_POINT_POOL.NUM_SAMPLED_POINTS),
            depth_normalizer=float(cfg.ROI_HEAD.ROI_POINT_POOL.DEPTH_NORMALIZER),
            pool_extra_width=tuple(cfg.ROI_HEAD.ROI_POINT_POOL.POOL_EXTRA_WIDTH),
        )
        pooled = jax.lax.stop_gradient(pooled)  # reference pools under no_grad
        rcnn_cls, rcnn_reg = self.roi_head(pooled, train=train)
        out["rcnn_cls"] = rcnn_cls
        out["rcnn_reg"] = rcnn_reg
        out["rois"] = rois
        out["roi_labels"] = roi_labels if not train else targets["roi_labels"]
        out["roi_valid"] = roi_valid

        if not train:
            batch_cls, batch_boxes = generate_refined_boxes(
                rois, rcnn_cls, rcnn_reg, self.roi_coder
            )
            out["batch_cls_preds"] = batch_cls
            out["batch_box_preds"] = batch_boxes
        return out


def pointrcnn_loss(out, gt_boxes, cfg, num_class: int = 1):
    """Total loss = point head (focal + smooth-L1) + rcnn (BCE + smooth-L1 +
    corner). Returns (loss, metrics dict)."""
    ph_cfg = cfg.POINT_HEAD
    num_class = 1 if ph_cfg.CLASS_AGNOSTIC else num_class
    point_coder = make_point_coder(cfg)
    roi_coder = make_roi_coder(cfg)
    # stage-1 targets
    # NOTE: xyz for target assignment are the raw input points (the backbone
    # preserves point order), reference point_head_box.assign_targets
    cls_labels, box_labels = assign_point_targets(
        out["point_xyz"], gt_boxes, point_coder,
        gt_extra_width=tuple(ph_cfg.TARGET_CONFIG.GT_EXTRA_WIDTH),
        num_class=num_class,
    )
    lw = ph_cfg.LOSS_CONFIG.LOSS_WEIGHTS
    loss_point_cls, loss_point_box, pos_num = point_head_loss(
        out["point_cls_preds"], out["point_box_preds"], cls_labels, box_labels,
        num_class=num_class,
        cls_weight=lw.point_cls_weight, box_weight=lw.point_box_weight,
        code_weights=list(lw.code_weights),
    )
    rw = cfg.ROI_HEAD.LOSS_CONFIG.LOSS_WEIGHTS
    targets = dict(out["roi_targets"])
    loss_rcnn_cls, loss_rcnn_reg, loss_corner = roi_head_loss(
        out["rcnn_cls"], out["rcnn_reg"], targets, roi_coder,
        code_weights=list(rw.code_weights),
        cls_weight=rw.rcnn_cls_weight, reg_weight=rw.rcnn_reg_weight,
        corner_weight=rw.rcnn_corner_weight,
    )
    total = loss_point_cls + loss_point_box + loss_rcnn_cls + loss_rcnn_reg + loss_corner
    metrics = {
        "loss": total,
        "point_loss_cls": loss_point_cls,
        "point_loss_box": loss_point_box,
        "rcnn_loss_cls": loss_rcnn_cls,
        "rcnn_loss_reg": loss_rcnn_reg + loss_corner,
        "point_pos_num": pos_num,
    }
    return total, metrics


def post_process(out, post_cfg):
    """Score-thresholded NMS over refined boxes (reference
    detector3d_template.post_processing:175-281), batched & static-shape.

    Returns dict of padded (B, K) final boxes/scores/labels + validity.
    """
    batch_cls = out["batch_cls_preds"]  # (B, R, 1)
    batch_boxes = out["batch_box_preds"]  # (B, R, 7)
    roi_valid = out["roi_valid"]
    roi_labels = out["roi_labels"]

    nms_cfg = post_cfg.NMS_CONFIG
    post_max = int(nms_cfg.NMS_POST_MAXSIZE)
    thresh = float(nms_cfg.NMS_THRESH)
    score_thresh = float(post_cfg.SCORE_THRESH)

    def per_sample(cls, boxes, valid, labels):
        scores = jax.nn.sigmoid(cls.max(axis=-1))
        ok = valid & (scores > score_thresh)
        masked = jnp.where(ok, scores, -jnp.inf)
        k = min(post_max, boxes.shape[0])
        keep, keep_mask = nms_bev(boxes, masked, thresh, k)
        return boxes[keep], scores[keep], labels[keep], keep_mask

    fb, fs, fl, fm = jax.vmap(per_sample)(batch_cls, batch_boxes, roi_valid, roi_labels)
    return {"boxes": fb, "scores": fs, "labels": fl, "valid": fm}
