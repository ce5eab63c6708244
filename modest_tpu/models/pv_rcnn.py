"""PV-RCNN detector: voxel backbone + keypoint set abstraction + RoI grid
pooling (reference: pcdet/models/detectors/pv_rcnn.py,
backbones_3d/pfe/voxel_set_abstraction.py, roi_heads/pvrcnn_head.py,
dense_heads/point_head_simple.py; config tools/cfgs/kitti_models/pv_rcnn.yaml).

Stage 1 is the SECOND pipeline (VoxelBackBone8x → HeightCompression →
BEVBackbone → AnchorHeadSingle). In parallel, 3D semantic information is
compacted into a small set of FPS keypoints by Voxel Set Abstraction (VSA):
each keypoint aggregates raw points, all four sparse-conv scales, and the
BEV map. Predicted Keypoint Weighting (PKW) downweights background
keypoints; the RoI grid head pools keypoint features onto a G^3 grid of
points per proposal and refines.

TPU notes: every neighbor aggregation is a masked ball query over padded
active sets (ops/pointnet2_stack) — the reference's ragged stack kernels —
and BEV interpolation is a gather-free bilinear blend of four static shifts.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import pointnet2 as p2
from ..ops.box_jax import points_in_boxes_index
from ..ops.pointnet2_stack import query_and_group_masked
from .box_coders import ResidualCoder
from .grid_detectors import (
    AnchorHeadSingle,
    BEVBackbone,
    assign_anchor_targets,
    single_head_anchor_setup,
    grid_detector_loss,
)
from .layers import FCHead, SharedMLP
from .losses import binary_cross_entropy
from .roi_head import (
    canonical_transform_gt,
    generate_refined_boxes,
    proposal_layer,
    roi_head_loss,
    sample_rois_for_rcnn,
)
from .sparse_conv import VoxelBackBone8x
from .voxelize import point_voxel_coords, voxelize_sparse


def bilinear_bev(bev, xy, pcr, vs, stride: int):
    """Bilinear interpolation of (B, H, W, C) BEV features at lidar (x, y).

    Reference: voxel_set_abstraction.bilinear_interpolate_torch. Grid layout
    follows HeightCompression: rows are y, cols are x, cell size vs*stride.
    """
    b, h, w, c = bev.shape
    fx = (xy[..., 0] - pcr[0]) / (vs[0] * stride)
    fy = (xy[..., 1] - pcr[1]) / (vs[1] * stride)
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, h - 2)
    tx = jnp.clip(fx - x0, 0.0, 1.0)[..., None]
    ty = jnp.clip(fy - y0, 0.0, 1.0)[..., None]

    def gather(yy, xx):
        flat = bev.reshape(b, h * w, c)
        return jnp.take_along_axis(flat, (yy * w + xx)[..., None], axis=1)

    f00 = gather(y0, x0)
    f01 = gather(y0, x0 + 1)
    f10 = gather(y0 + 1, x0)
    f11 = gather(y0 + 1, x0 + 1)
    return ((f00 * (1 - tx) + f01 * tx) * (1 - ty)
            + (f10 * (1 - tx) + f11 * tx) * ty)


def voxel_centers(coords_zyx, stride: int, pcr, vs):
    """(B, V, 3) zyx int coords at ``stride`` → lidar-frame xyz centers."""
    xyz_idx = coords_zyx[..., ::-1].astype(jnp.float32)
    return (xyz_idx + 0.5) * (jnp.asarray(vs) * stride) + jnp.asarray(pcr[:3])


def roi_grid_points(rois, g: int):
    """Dense G^3 grid of points inside each roi (reference
    pvrcnn_head.get_global_grid_points_of_roi)."""
    idx = jnp.stack(jnp.meshgrid(*([jnp.arange(g)] * 3), indexing="ij"),
                    axis=-1).reshape(-1, 3).astype(jnp.float32)  # (g^3, 3)
    frac = (idx + 0.5) / g - 0.5  # (-0.5, 0.5)
    local = frac[None, None] * rois[:, :, None, 3:6]  # (B, R, g^3, 3)
    c, s = jnp.cos(rois[..., 6]), jnp.sin(rois[..., 6])
    lx, ly, lz = local[..., 0], local[..., 1], local[..., 2]
    gx = lx * c[..., None] - ly * s[..., None]
    gy = lx * s[..., None] + ly * c[..., None]
    return jnp.stack([gx, gy, lz], -1) + rois[:, :, None, :3]


class VSASource(nn.Module):
    """One VSA aggregation source: MSG ball query into a masked point set."""

    radii: tuple
    nsamples: tuple
    mlps: tuple  # one channel tuple per radius

    @nn.compact
    def __call__(self, xyz, xyz_mask, feats, keypoints, train: bool = False):
        outs = []
        for radius, ns, mlp in zip(self.radii, self.nsamples, self.mlps):
            grouped, _ = query_and_group_masked(
                xyz, xyz_mask, feats, keypoints, float(radius), int(ns)
            )
            f = SharedMLP(tuple(mlp))(grouped, train=train)
            outs.append(f.max(axis=2))
        return jnp.concatenate(outs, axis=-1)  # (B, K, sum(mlp[-1]))


class PVRCNN(nn.Module):
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

        self.backbone_3d = VoxelBackBone8x(return_multiscale=True)
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

        pfe = cfg.PFE
        sources = {}
        for name in pfe.FEATURES_SOURCE:
            if name == "bev":
                continue
            key = "raw_points" if name == "raw_points" else name
            sp = pfe.SA_LAYER[key] if key != "raw_points" else pfe.SA_LAYER.raw_points
            sources[key] = VSASource(
                radii=tuple(float(r) for r in sp.POOL_RADIUS),
                nsamples=tuple(int(s) for s in sp.NSAMPLE),
                mlps=tuple(tuple(int(c) for c in m) for m in sp.MLPS),
                name=f"vsa_{key}",
            )
        self.vsa_sources = sources
        self.vsa_fusion = SharedMLP((int(pfe.NUM_OUTPUT_FEATURES),),
                                    name="vsa_fusion")

        self.pkw_head = FCHead(hidden=tuple(cfg.POINT_HEAD.CLS_FC), out=1,
                               name="pkw_head")

        rh = cfg.ROI_HEAD
        self._grid = int(rh.ROI_GRID_POOL.GRID_SIZE)
        gp = rh.ROI_GRID_POOL
        self.grid_pool = VSASource(
            radii=tuple(float(r) for r in gp.POOL_RADIUS),
            nsamples=tuple(int(s) for s in gp.NSAMPLE),
            mlps=tuple(tuple(int(c) for c in m) for m in gp.MLPS),
            name="roi_grid_pool",
        )
        self.roi_coder = ResidualCoder()
        self.shared_fc = SharedMLP(tuple(rh.SHARED_FC), name="roi_shared_fc")
        self.rcnn_cls_head = FCHead(hidden=tuple(rh.CLS_FC), out=1,
                                    name="rcnn_cls")
        self.rcnn_reg_head = FCHead(hidden=tuple(rh.REG_FC),
                                    out=self.roi_coder.code_size,
                                    name="rcnn_reg")

    def __call__(self, points, gt_boxes=None, train: bool = False,
                 max_voxels: int = 16000):
        from ..utils.config import Config

        cfg = Config(self.cfg)
        pcr, vs, gs = self._pcr, self._vs, self._gs
        b, n = points.shape[0], points.shape[1]
        xyz = points[..., :3]

        shape_zyx = (gs[2] + 1, gs[1], gs[0])

        def prep(p):  # pure voxelization per sample
            coords, valid = point_voxel_coords(p, pcr, vs, gs)
            return voxelize_sparse(
                p, valid, coords, max_voxels, gs[0], gs[1], gs[2]
            )

        vc, vf, vv, vk = jax.vmap(prep)(points)
        bev, multiscale = self.backbone_3d(vf, vc, vk, vv, shape_zyx, train=train)
        bev2d = self.backbone_2d(bev, train=train)
        cls_preds, box_preds, dir_preds = self.dense_head(bev2d)

        # ---- keypoints + VSA ----
        k = int(cfg.PFE.NUM_KEYPOINTS)
        kp_idx = p2.furthest_point_sample(xyz, k)
        keypoints = p2.gather_points(xyz, kp_idx)  # (B, K, 3)

        feats_list = []
        pfe = cfg.PFE
        all_mask = jnp.ones((b, n), bool)
        for name in pfe.FEATURES_SOURCE:
            if name == "raw_points":
                feats_list.append(self.vsa_sources["raw_points"](
                    xyz, all_mask, points[..., 3:], keypoints, train=train))
            elif name == "bev":
                feats_list.append(bilinear_bev(bev, keypoints[..., :2], pcr, vs, 8))
            else:
                vf, vcoords, vvalid, _ = multiscale[name]
                from .sparse_conv import BACKBONE_STRIDES

                centers = voxel_centers(vcoords, BACKBONE_STRIDES[name], pcr, vs)
                centers = jnp.where(vvalid[..., None], centers, 1e6)
                feats_list.append(self.vsa_sources[name](
                    centers, vvalid, vf, keypoints, train=train))
        kp_raw = jnp.concatenate(feats_list, axis=-1)  # before-fusion feats
        kp_feats = self.vsa_fusion(kp_raw, train=train)

        # PKW weighting: gradients flow through both factors, like the
        # reference (point_head_simple scores are not detached)
        pkw_logits = self.pkw_head(kp_raw, train=train)  # (B, K, 1)
        kp_weighted = kp_feats * jax.nn.sigmoid(pkw_logits)

        # ---- stage-1 proposals ----
        out = {"cls_preds": cls_preds, "box_preds": box_preds,
               "dir_cls_preds": dir_preds, "anchors": self._anchors,
               "keypoints": keypoints, "pkw_logits": pkw_logits}

        batch_cls, batch_box = self._decoded_boxes(cls_preds, box_preds, dir_preds)
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

        # ---- RoI grid pooling + refinement ----
        grid_pts = roi_grid_points(rois, self._grid)  # (B, R, g^3, 3)
        r = rois.shape[1]
        g3 = self._grid ** 3
        flat_grid = grid_pts.reshape(b, r * g3, 3)
        kp_mask = jnp.ones((b, keypoints.shape[1]), bool)
        pooled = self.grid_pool(keypoints, kp_mask, kp_weighted,
                                flat_grid, train=train)  # (B, R*g^3, C)
        pooled = pooled.reshape(b, r, g3 * pooled.shape[-1])
        shared = self.shared_fc(pooled, train=train)
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

    def _decoded_boxes(self, cls_preds, box_preds, dir_preds):
        from ..utils.config import Config
        from .grid_detectors import decode_anchor_boxes

        cfg = Config(self.cfg)  # flax re-freezes setup attrs
        return decode_anchor_boxes(cfg, self._anchors, self.box_coder,
                                   cls_preds, box_preds, dir_preds)


def pvrcnn_loss(out, gt_boxes, cfg, num_class: int = 1):
    """Stage-1 anchor loss + PKW segmentation BCE + RCNN refinement loss
    (reference pv_rcnn.get_training_loss)."""
    loss1, metrics = grid_detector_loss(out, cfg, num_class)

    # PKW: keypoint-in-gt-box segmentation (point_head_simple)
    kp = out["keypoints"]
    logits = out["pkw_logits"][..., 0]

    def per_sample(k, gt):
        gt_valid = jnp.abs(gt).sum(-1) > 0
        idx = points_in_boxes_index(k, gt[:, :7], gt_valid)
        return (idx >= 0).astype(jnp.float32)

    seg_target = jax.vmap(per_sample)(kp, gt_boxes)
    pkw_w = float(cfg.POINT_HEAD.LOSS_CONFIG.LOSS_WEIGHTS.point_cls_weight)
    loss_pkw = binary_cross_entropy(jax.nn.sigmoid(logits), seg_target).mean() * pkw_w

    rw = cfg.ROI_HEAD.LOSS_CONFIG.LOSS_WEIGHTS
    targets = dict(out["roi_targets"])
    roi_coder = ResidualCoder()
    loss_rcnn_cls, loss_rcnn_reg, loss_corner = roi_head_loss(
        out["rcnn_cls"], out["rcnn_reg"], targets, roi_coder,
        code_weights=list(rw.code_weights),
        cls_weight=rw.rcnn_cls_weight, reg_weight=rw.rcnn_reg_weight,
        corner_weight=rw.rcnn_corner_weight,
    )
    total = loss1 + loss_pkw + loss_rcnn_cls + loss_rcnn_reg + loss_corner
    metrics = dict(metrics)
    metrics.update(loss=total, pkw_loss=loss_pkw, rcnn_loss_cls=loss_rcnn_cls,
                   rcnn_loss_reg=loss_rcnn_reg + loss_corner)
    return total, metrics
