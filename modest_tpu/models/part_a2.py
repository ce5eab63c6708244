"""Part-A² detector (reference: pcdet/models/detectors/PartA2_net.py,
dense_heads/point_intra_part_head.py, roi_heads/partA2_head.py; config
tools/cfgs/kitti_models/PartA2.yaml).

Stage 1: the SparseUNet encoder feeds the usual BEV RPN; the decoder's
full-resolution voxel features drive a point-wise head predicting per-voxel
foreground score and **intra-object part location** (the canonical position
of the voxel inside its gt box, each coordinate in [0, 1]). Stage 2 pools
part locations (avg) and UNet features (max) RoI-aware onto a G^3 grid per
proposal (ops/roiaware_pool3d) and refines with a dense 3D conv tower —
at 14^3 the dense grid is tiny and XLA maps the convs straight onto the MXU
(a sparse tower would waste the hardware here).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.roiaware_pool3d import roiaware_pool3d
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
from .losses import binary_cross_entropy, sigmoid_focal_loss
from .pv_rcnn import voxel_centers
from .roi_head import (
    canonical_transform_gt,
    generate_refined_boxes,
    proposal_layer,
    roi_head_loss,
    sample_rois_for_rcnn,
)
from .sparse_conv import SparseUNet
from .voxelize import point_voxel_coords, voxelize_sparse


def intra_part_targets(centers, valid, gt_boxes):
    """Per-voxel seg label + canonical intra-part coords in [0, 1]
    (reference point_intra_part_head.assign_targets →
    roiaware_pool3d_utils + canonical transform).

    centers (V, 3); gt_boxes (M, 8). Returns (seg (V,), part (V, 3))."""
    gt_valid = jnp.abs(gt_boxes).sum(-1) > 0
    shift = centers[None, :, :] - gt_boxes[:, None, :3]  # (M, V, 3)
    c, s = jnp.cos(-gt_boxes[:, 6]), jnp.sin(-gt_boxes[:, 6])
    lx = shift[..., 0] * c[:, None] - shift[..., 1] * s[:, None]
    ly = shift[..., 0] * s[:, None] + shift[..., 1] * c[:, None]
    lz = shift[..., 2]
    half = gt_boxes[:, None, 3:6] / 2
    inb = ((jnp.abs(lx) < half[..., 0]) & (jnp.abs(ly) < half[..., 1])
           & (jnp.abs(lz) < half[..., 2]) & gt_valid[:, None])
    any_hit = inb.any(axis=0) & valid
    first = jnp.argmax(inb, axis=0)  # (V,)
    local = jnp.stack([lx, ly, lz], -1)  # (M, V, 3)
    sel = jnp.take_along_axis(local, first[None, :, None], axis=0)[0]
    dims = gt_boxes[first, 3:6]
    part = jnp.clip(sel / jnp.maximum(dims, 1e-3) + 0.5, 0.0, 1.0)
    part = jnp.where(any_hit[:, None], part, 0.0)
    return any_hit.astype(jnp.float32), part


class PartA2(nn.Module):
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
        self.roi_coder = ResidualCoder()

        self.backbone_3d = SparseUNet()
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

        ph = cfg.POINT_HEAD
        self.seg_head = FCHead(hidden=tuple(ph.CLS_FC), out=1, name="seg_head")
        self.part_head = FCHead(hidden=tuple(ph.PART_FC), out=3, name="part_head")

        rh = cfg.ROI_HEAD
        self._grid = int(rh.ROI_AWARE_POOL.POOL_SIZE)
        self._pool_ch = int(rh.ROI_AWARE_POOL.NUM_FEATURES)
        self.pool_proj = SharedMLP((self._pool_ch,), name="pool_proj")
        self.conv_tower = [
            (nn.Conv(c, (3, 3, 3), strides=(st, st, st), padding="SAME",
                     name=f"tower_conv{i}"),
             nn.BatchNorm(momentum=0.9, epsilon=1e-5, name=f"tower_bn{i}"))
            for i, (c, st) in enumerate(
                zip(rh.CONV_TOWER.NUM_FILTERS, rh.CONV_TOWER.STRIDES))
        ]
        self.shared_fc = SharedMLP(tuple(rh.SHARED_FC), name="roi_shared_fc")
        self.rcnn_cls_head = FCHead(hidden=tuple(rh.CLS_FC), out=1, name="rcnn_cls")
        self.rcnn_reg_head = FCHead(hidden=tuple(rh.REG_FC),
                                    out=self.roi_coder.code_size, name="rcnn_reg")

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
        bev, u1 = self.backbone_3d(vf, vc, vk, vv, shape_zyx, train=train)
        vcoords, vvalid = vc, vv
        bev2d = self.backbone_2d(bev, train=train)
        cls_preds, box_preds, dir_preds = self.dense_head(bev2d)

        centers = voxel_centers(vcoords, 1, pcr, vs)  # (B, V, 3)
        seg_logits = self.seg_head(u1, train=train)[..., 0]  # (B, V)
        part_reg = jax.nn.sigmoid(self.part_head(u1, train=train))  # (B, V, 3)

        out = {"cls_preds": cls_preds, "box_preds": box_preds,
               "dir_cls_preds": dir_preds, "anchors": self._anchors,
               "seg_logits": seg_logits, "part_reg": part_reg,
               "voxel_valid": vvalid}

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
            seg_t, part_t = jax.vmap(intra_part_targets)(centers, vvalid, gt_boxes)
            out["seg_targets"] = seg_t
            out["part_targets"] = part_t
            targets = sample_rois_for_rcnn(
                self.make_rng("sampler"), rois, roi_scores, roi_labels,
                gt_boxes, cfg.ROI_HEAD.TARGET_CONFIG,
            )
            rois = targets["rois"]
            roi_valid = jnp.ones(rois.shape[:2], bool)
            targets["gt_of_rois_src"] = targets["gt_of_rois"]
            targets["gt_of_rois_ct"] = canonical_transform_gt(rois, targets["gt_of_rois"])
            out["roi_targets"] = targets
            roi_labels = targets["roi_labels"]

        # RoI-aware pooling: part stream (avg), feature stream (max)
        g = self._grid
        seg_score = jax.nn.sigmoid(seg_logits)
        part_feats = jnp.concatenate([part_reg, seg_score[..., None]], -1)
        centers_m = jnp.where(vvalid[..., None], centers, 1e6)

        def pool_one(roi, ctr, pf, uf):
            part = roiaware_pool3d(roi, ctr, pf, (g, g, g), "avg")
            feat = roiaware_pool3d(roi, ctr, uf, (g, g, g), "max")
            return part, feat

        part_pool, feat_pool = jax.vmap(pool_one)(rois, centers_m, part_feats, u1)
        pooled = jnp.concatenate([part_pool, feat_pool], -1)  # (B, R, g, g, g, C)
        r = rois.shape[1]
        x = self.pool_proj(pooled, train=train).reshape(b * r, g, g, g, -1)
        for conv, bn in self.conv_tower:
            x = nn.relu(bn(conv(x), use_running_average=not train))
        x = x.reshape(b, r, -1)
        shared = self.shared_fc(x, train=train)
        rcnn_cls = self.rcnn_cls_head(shared, train=train)
        rcnn_reg = self.rcnn_reg_head(shared, train=train)

        out.update(rcnn_cls=rcnn_cls, rcnn_reg=rcnn_reg, rois=rois,
                   roi_labels=roi_labels, roi_valid=roi_valid)
        if not train:
            bcls, bboxes = generate_refined_boxes(rois, rcnn_cls, rcnn_reg,
                                                  self.roi_coder)
            out["batch_cls_preds"] = bcls
            out["batch_box_preds"] = bboxes
        return out


class PartA2Free(nn.Module):
    """Anchor-free Part-A² (reference kitti_models/PartA2_free.yaml: detector
    NAME "PointRCNN" with BACKBONE_3D UNetV2 RETURN_ENCODED_TENSOR=False,
    dense_heads/point_intra_part_head.PointIntraPartOffsetHead predicting
    box residuals, roi_heads/partA2_head.PartA2FCHead with DISABLE_PART).

    No BEV RPN: the sparse UNet's full-resolution voxel features drive a
    point-wise head (cls + intra-part + PointResidualCoder box residuals);
    proposals are the decoded per-voxel boxes, refined by the RoI-aware
    pooled tower. DISABLE_PART swaps the part stream for raw voxel centers
    (reference partA2_head.py:122)."""

    model_cfg: Any
    num_class: int
    point_cloud_range: Any
    voxel_size: Any
    grid_size: Any

    def setup(self):
        from ..utils.config import Config

        from .box_coders import PointResidualCoder
        from .point_head import PointHeadBox

        cfg = Config(self.model_cfg)
        self.cfg = cfg
        self._pcr = tuple(float(v) for v in self.point_cloud_range)
        self._vs = tuple(float(v) for v in self.voxel_size)
        self._gs = tuple(int(v) for v in self.grid_size)

        self.backbone_3d = SparseUNet()
        ph = cfg.POINT_HEAD
        self.point_coder = PointResidualCoder(
            **ph.TARGET_CONFIG.BOX_CODER_CONFIG.to_dict())
        self.point_head = PointHeadBox(
            num_class=self.num_class if not ph.get("CLASS_AGNOSTIC", False) else 1,
            cls_fc=tuple(ph.CLS_FC),
            reg_fc=tuple(ph.REG_FC),
            code_size=self.point_coder.code_size,
        )
        self.part_head = FCHead(hidden=tuple(ph.PART_FC), out=3, name="part_head")
        self.roi_coder = ResidualCoder()

        rh = cfg.ROI_HEAD
        self._grid = int(rh.ROI_AWARE_POOL.POOL_SIZE)
        self._pool_ch = int(rh.ROI_AWARE_POOL.NUM_FEATURES)
        self.pool_proj = SharedMLP((self._pool_ch,), name="pool_proj")
        self.conv_tower = [
            (nn.Conv(c, (3, 3, 3), strides=(st, st, st), padding="SAME",
                     name=f"tower_conv{i}"),
             nn.BatchNorm(momentum=0.9, epsilon=1e-5, name=f"tower_bn{i}"))
            for i, (c, st) in enumerate(
                zip(rh.CONV_TOWER.NUM_FILTERS, rh.CONV_TOWER.STRIDES))
        ]
        self.shared_fc = SharedMLP(tuple(rh.SHARED_FC), name="roi_shared_fc")
        self.rcnn_cls_head = FCHead(hidden=tuple(rh.CLS_FC), out=1, name="rcnn_cls")
        self.rcnn_reg_head = FCHead(hidden=tuple(rh.REG_FC),
                                    out=self.roi_coder.code_size, name="rcnn_reg")

    def __call__(self, points, gt_boxes=None, train: bool = False,
                 max_voxels: int = 16000):
        from ..utils.config import Config

        from .point_head import assign_point_targets

        cfg = Config(self.cfg)
        pcr, vs, gs = self._pcr, self._vs, self._gs
        b = points.shape[0]
        shape_zyx = (gs[2] + 1, gs[1], gs[0])

        def prep(p):
            coords, valid = point_voxel_coords(p, pcr, vs, gs)
            return voxelize_sparse(p, valid, coords, max_voxels, gs[0], gs[1], gs[2])

        vc, vf, vv, vk = jax.vmap(prep)(points)
        _bev, u1 = self.backbone_3d(vf, vc, vk, vv, shape_zyx, train=train)

        centers = voxel_centers(vc, 1, pcr, vs)  # (B, V, 3)
        v = u1.shape[1]
        point_cls, point_box = self.point_head(u1, train=train)
        point_cls = jnp.where(vv[..., None], point_cls, -1e9)  # pad voxels out
        part_reg = jax.nn.sigmoid(self.part_head(u1, train=train))
        point_scores = jax.nn.sigmoid(point_cls.max(axis=-1))
        pred_classes = point_cls.argmax(axis=-1) + 1

        decoded = self.point_coder.decode(
            point_box.reshape(-1, self.point_coder.code_size),
            centers.reshape(-1, 3),
            pred_classes.reshape(-1),
        ).reshape(b, v, 7)

        nms_cfg = cfg.ROI_HEAD.NMS_CONFIG["TRAIN" if train else "TEST"]
        rois, roi_scores, roi_labels, roi_valid = proposal_layer(
            decoded, point_cls,
            nms_pre=int(nms_cfg.NMS_PRE_MAXSIZE),
            nms_post=int(nms_cfg.NMS_POST_MAXSIZE),
            nms_thresh=float(nms_cfg.NMS_THRESH),
        )

        out = {"point_cls_preds": point_cls, "point_box_preds": point_box,
               "part_reg": part_reg, "voxel_valid": vv,
               "point_boxes_decoded": decoded}

        if train:
            ph = cfg.POINT_HEAD
            cls_labels, box_labels = assign_point_targets(
                centers, gt_boxes, self.point_coder,
                gt_extra_width=tuple(ph.TARGET_CONFIG.GT_EXTRA_WIDTH),
                num_class=self.num_class,
            )
            out["point_cls_labels"] = jnp.where(vv, cls_labels, -1)
            out["point_box_labels"] = box_labels
            seg_t, part_t = jax.vmap(intra_part_targets)(centers, vv, gt_boxes)
            out["seg_targets"] = seg_t
            out["part_targets"] = part_t
            targets = sample_rois_for_rcnn(
                self.make_rng("sampler"), rois, roi_scores, roi_labels,
                gt_boxes, cfg.ROI_HEAD.TARGET_CONFIG,
            )
            rois = targets["rois"]
            roi_valid = jnp.ones(rois.shape[:2], bool)
            targets["gt_of_rois_src"] = targets["gt_of_rois"]
            targets["gt_of_rois_ct"] = canonical_transform_gt(rois, targets["gt_of_rois"])
            out["roi_targets"] = targets
            roi_labels = targets["roi_labels"]

        # RoI-aware pooling; DISABLE_PART → raw centers ride the part stream
        g = self._grid
        score = jax.lax.stop_gradient(point_scores)
        if bool(cfg.ROI_HEAD.get("DISABLE_PART", False)):
            part_stream = jnp.concatenate([centers, score[..., None]], -1)
        else:
            part_stream = jnp.concatenate([part_reg, score[..., None]], -1)
        centers_m = jnp.where(vv[..., None], centers, 1e6)

        def pool_one(roi, ctr, pf, uf):
            part = roiaware_pool3d(roi, ctr, pf, (g, g, g), "avg")
            feat = roiaware_pool3d(roi, ctr, uf, (g, g, g), "max")
            return part, feat

        part_pool, feat_pool = jax.vmap(pool_one)(rois, centers_m, part_stream, u1)
        pooled = jnp.concatenate([part_pool, feat_pool], -1)
        r = rois.shape[1]
        x = self.pool_proj(pooled, train=train).reshape(b * r, g, g, g, -1)
        for conv, bn in self.conv_tower:
            x = nn.relu(bn(conv(x), use_running_average=not train))
        x = x.reshape(b, r, -1)
        shared = self.shared_fc(x, train=train)
        rcnn_cls = self.rcnn_cls_head(shared, train=train)
        rcnn_reg = self.rcnn_reg_head(shared, train=train)

        out.update(rcnn_cls=rcnn_cls, rcnn_reg=rcnn_reg, rois=rois,
                   roi_labels=roi_labels, roi_valid=roi_valid)
        if not train:
            bcls, bboxes = generate_refined_boxes(rois, rcnn_cls, rcnn_reg,
                                                  self.roi_coder)
            out["batch_cls_preds"] = bcls
            out["batch_box_preds"] = bboxes
        return out


def parta2_free_loss(out, gt_boxes, cfg, num_class: int = 1):
    """Point cls focal + box smooth-L1 + part BCE + RCNN loss (reference
    PointRCNN-free get_training_loss: point_head + roi_head, no RPN)."""
    from .point_head import point_head_loss

    lw = cfg.POINT_HEAD.LOSS_CONFIG.LOSS_WEIGHTS
    loss_cls, loss_box, _ = point_head_loss(
        out["point_cls_preds"], out["point_box_preds"],
        out["point_cls_labels"], out["point_box_labels"], num_class,
        cls_weight=float(lw.point_cls_weight),
        box_weight=float(lw.point_box_weight),
        code_weights=list(lw.code_weights),
    )

    valid = out["voxel_valid"]
    fg = (out["seg_targets"] > 0.5) & valid
    fw = fg.astype(jnp.float32)
    part_per = binary_cross_entropy(out["part_reg"], out["part_targets"]).sum(-1)
    loss_part = (part_per * fw).sum() / jnp.maximum(fw.sum(), 1.0)
    loss_part = loss_part * float(lw.get("point_part_weight", 1.0))

    rw = cfg.ROI_HEAD.LOSS_CONFIG.LOSS_WEIGHTS
    targets = dict(out["roi_targets"])
    loss_rcnn_cls, loss_rcnn_reg, loss_corner = roi_head_loss(
        out["rcnn_cls"], out["rcnn_reg"], targets, ResidualCoder(),
        code_weights=list(rw.get("code_weights", [1.0] * 7)),
        cls_weight=rw.rcnn_cls_weight, reg_weight=rw.rcnn_reg_weight,
        corner_weight=rw.rcnn_corner_weight,
    )
    total = loss_cls + loss_box + loss_part + loss_rcnn_cls + loss_rcnn_reg + loss_corner
    metrics = dict(loss=total, point_loss_cls=loss_cls, point_loss_box=loss_box,
                   part_loss=loss_part, rcnn_loss_cls=loss_rcnn_cls,
                   rcnn_loss_reg=loss_rcnn_reg + loss_corner)
    return total, metrics


def parta2_loss(out, gt_boxes, cfg, num_class: int = 1):
    """RPN anchor loss + point seg focal + part-location BCE + RCNN loss
    (reference PartA2_net.get_training_loss)."""
    loss1, metrics = grid_detector_loss(out, cfg, num_class)

    lw = cfg.POINT_HEAD.LOSS_CONFIG.LOSS_WEIGHTS
    valid = out["voxel_valid"]
    seg_t = out["seg_targets"]
    w = valid.astype(jnp.float32)
    seg_per = sigmoid_focal_loss(out["seg_logits"][..., None],
                                 seg_t[..., None], w)[..., 0]
    loss_seg = seg_per.sum() / jnp.maximum(w.sum(), 1.0)
    loss_seg = loss_seg * float(lw.point_cls_weight)

    fg = (seg_t > 0.5) & valid
    fw = fg.astype(jnp.float32)
    part_per = binary_cross_entropy(out["part_reg"], out["part_targets"]).sum(-1)
    loss_part = (part_per * fw).sum() / jnp.maximum(fw.sum(), 1.0)
    loss_part = loss_part * float(lw.point_part_weight)

    rw = cfg.ROI_HEAD.LOSS_CONFIG.LOSS_WEIGHTS
    targets = dict(out["roi_targets"])
    loss_rcnn_cls, loss_rcnn_reg, loss_corner = roi_head_loss(
        out["rcnn_cls"], out["rcnn_reg"], targets, ResidualCoder(),
        code_weights=list(rw.code_weights),
        cls_weight=rw.rcnn_cls_weight, reg_weight=rw.rcnn_reg_weight,
        corner_weight=rw.rcnn_corner_weight,
    )
    total = loss1 + loss_seg + loss_part + loss_rcnn_cls + loss_rcnn_reg + loss_corner
    metrics = dict(metrics)
    metrics.update(loss=total, seg_loss=loss_seg, part_loss=loss_part,
                   rcnn_loss_cls=loss_rcnn_cls,
                   rcnn_loss_reg=loss_rcnn_reg + loss_corner)
    return total, metrics
