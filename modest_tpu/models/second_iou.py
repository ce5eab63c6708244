"""SECOND-IoU detector (reference: pcdet/models/detectors/second_net_iou.py,
roi_heads/second_head.py; config tools/cfgs/kitti_models/second_iou.yaml —
in the D19 unused-by-MODEST set).

SECOND stage 1 plus a lightweight IoU-rectification stage: each proposal
pools 2D BEV features on a rotated G×G grid (bilinear), predicts its 3D IoU
with the ground truth, and final scoring/NMS ranks by the calibrated IoU
instead of the raw classification logit — suppressing well-classified but
badly-localized boxes.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.iou3d import boxes_iou3d
from .box_coders import ResidualCoder
from .grid_detectors import (
    AnchorHeadSingle,
    BEVBackbone,
    assign_anchor_targets,
    single_head_anchor_setup,
    decode_anchor_boxes,
    grid_detector_loss,
)
from .layers import FCHead, SharedMLP
from .losses import sigmoid_ce_with_logits
from .pv_rcnn import bilinear_bev
from .roi_head import proposal_layer
from .sparse_conv import VoxelBackBone8x
from .voxelize import point_voxel_coords, voxelize_sparse


def roi_bev_grid(rois, g: int):
    """(B, R, 7) → (B, R, g*g, 2) rotated BEV grid points inside each roi."""
    idx = jnp.stack(jnp.meshgrid(jnp.arange(g), jnp.arange(g), indexing="ij"),
                    -1).reshape(-1, 2).astype(jnp.float32)
    frac = (idx + 0.5) / g - 0.5
    local = frac[None, None] * rois[:, :, None, 3:5]  # (B, R, g^2, 2)
    c, s = jnp.cos(rois[..., 6]), jnp.sin(rois[..., 6])
    gx = local[..., 0] * c[..., None] - local[..., 1] * s[..., None]
    gy = local[..., 0] * s[..., None] + local[..., 1] * c[..., None]
    return jnp.stack([gx, gy], -1) + rois[:, :, None, :2]


class SECONDIoU(nn.Module):
    model_cfg: Any
    num_class: int
    point_cloud_range: Any
    voxel_size: Any
    grid_size: Any

    def setup(self):
        from ..utils.config import Config

        cfg = Config(self.model_cfg)
        self.cfg = cfg
        pcr = tuple(float(v) for v in self.point_cloud_range)
        vs = tuple(float(v) for v in self.voxel_size)
        gs = tuple(int(v) for v in self.grid_size)
        self._pcr, self._vs, self._gs = pcr, vs, gs

        anchors_np, na, m_thr, u_thr, a_cls = single_head_anchor_setup(
            [c.to_dict() for c in cfg.DENSE_HEAD.ANCHOR_GENERATOR_CONFIG], gs, pcr
        )
        self._anchors = jnp.asarray(anchors_np)
        self._matched_thr = m_thr
        self._unmatched_thr = u_thr
        self._anchor_cls = None if a_cls is None else jnp.asarray(a_cls)
        self.box_coder = ResidualCoder()

        self.backbone_3d = VoxelBackBone8x()
        bb = cfg.BACKBONE_2D
        self.backbone_2d = BEVBackbone(
            layer_nums=tuple(bb.LAYER_NUMS),
            layer_strides=tuple(bb.LAYER_STRIDES),
            num_filters=tuple(bb.NUM_FILTERS),
            upsample_strides=tuple(bb.UPSAMPLE_STRIDES),
            num_upsample_filters=tuple(bb.NUM_UPSAMPLE_FILTERS),
        )
        self.dense_head = AnchorHeadSingle(
            num_class=self.num_class,
            num_anchors_per_loc=na,
            code_size=self.box_coder.code_size,
            num_dir_bins=int(cfg.DENSE_HEAD.get("NUM_DIR_BINS", 2)),
            use_dir=bool(cfg.DENSE_HEAD.get("USE_DIRECTION_CLASSIFIER", True)),
        )

        rh = cfg.ROI_HEAD
        self._grid = int(rh.GRID_SIZE)
        self.iou_mlp = SharedMLP(tuple(rh.SHARED_FC), name="iou_mlp")
        self.iou_head = FCHead(hidden=tuple(rh.IOU_FC), out=1, name="iou_head")

    def __call__(self, points, gt_boxes=None, train: bool = False,
                 max_voxels: int = 16000):
        from ..utils.config import Config

        cfg = Config(self.cfg)
        pcr, vs, gs = self._pcr, self._vs, self._gs
        b = points.shape[0]

        shape_zyx = (gs[2] + 1, gs[1], gs[0])

        def prep(p):  # pure voxelization per sample
            coords, valid = point_voxel_coords(p, pcr, vs, gs)
            return voxelize_sparse(
                p, valid, coords, max_voxels, gs[0], gs[1], gs[2]
            )

        vc, vf, vv, vk = jax.vmap(prep)(points)
        bev = self.backbone_3d(vf, vc, vk, vv, shape_zyx, train=train)
        bev2d = self.backbone_2d(bev, train=train)
        cls_preds, box_preds, dir_preds = self.dense_head(bev2d)

        out = {"cls_preds": cls_preds, "box_preds": box_preds,
               "dir_cls_preds": dir_preds, "anchors": self._anchors}

        batch_cls, batch_box = decode_anchor_boxes(
            cfg, self._anchors, self.box_coder, cls_preds, box_preds, dir_preds)
        nms_cfg = cfg.ROI_HEAD.NMS_CONFIG["TRAIN" if train else "TEST"]
        rois, roi_scores, roi_labels, roi_valid = proposal_layer(
            batch_box, batch_cls.reshape(b, -1, self.num_class),
            nms_pre=int(nms_cfg.NMS_PRE_MAXSIZE),
            nms_post=int(nms_cfg.NMS_POST_MAXSIZE),
            nms_thresh=float(nms_cfg.NMS_THRESH),
        )

        if train:
            labels, reg_targets, _ = assign_anchor_targets(
                self._anchors, gt_boxes, self.box_coder,
                self._matched_thr, self._unmatched_thr,
                anchor_cls=self._anchor_cls,
            )
            out["box_cls_labels"] = labels
            out["box_reg_targets"] = reg_targets

            def iou_target(roi, gt):
                gt_valid = jnp.abs(gt).sum(-1) > 0
                iou = boxes_iou3d(roi, gt[:, :7])
                iou = jnp.where(gt_valid[None, :], iou, -1.0)
                return jnp.clip(iou.max(axis=1), 0.0, 1.0)

            out["iou_targets"] = jax.vmap(iou_target)(rois, gt_boxes)

        # IoU head: rotated BEV grid pooling + MLP
        g = self._grid
        grid_xy = roi_bev_grid(rois, g)  # (B, R, g^2, 2)
        r = rois.shape[1]
        # BEVBackbone output stride vs the dense-head feature map: the
        # dense-head anchors live at feature_map_stride; bev2d shares it
        stride = int(cfg.DENSE_HEAD.ANCHOR_GENERATOR_CONFIG[0].feature_map_stride)
        feats = bilinear_bev(bev2d, grid_xy.reshape(b, r * g * g, 2), pcr, vs,
                             stride)
        feats = feats.reshape(b, r, g * g, -1)
        pooled = self.iou_mlp(feats, train=train).max(axis=2)  # (B, R, C)
        iou_preds = self.iou_head(pooled, train=train)  # (B, R, 1)

        out.update(rcnn_iou=iou_preds, rois=rois, roi_labels=roi_labels,
                   roi_valid=roi_valid, roi_scores=roi_scores)
        if not train:
            # rank by calibrated IoU (reference second_net_iou post-processing
            # uses the iou branch as the NMS score)
            out["batch_cls_preds"] = iou_preds
            out["batch_box_preds"] = rois
        return out


def second_iou_loss(out, gt_boxes, cfg, num_class: int = 1):
    """Anchor loss + IoU-branch BCE on the normalized target
    2*iou - 0.5 clipped to [0, 1] (reference second_head.get_loss)."""
    loss1, metrics = grid_detector_loss(out, cfg, num_class)
    target = jnp.clip(2.0 * out["iou_targets"] - 0.5, 0.0, 1.0)
    per = sigmoid_ce_with_logits(out["rcnn_iou"][..., 0], target)
    w = float(cfg.ROI_HEAD.LOSS_CONFIG.LOSS_WEIGHTS.rcnn_iou_weight)
    loss_iou = per.mean() * w
    total = loss1 + loss_iou
    metrics = dict(metrics)
    metrics.update(loss=total, iou_loss=loss_iou)
    return total, metrics
