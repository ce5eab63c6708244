"""Voxel R-CNN detector (reference: pcdet/models/detectors/voxel_rcnn.py,
roi_heads/voxelrcnn_head.py; config tools/cfgs/kitti_models/voxel_rcnn_car.yaml).

Stage 1 is the SECOND pipeline. The RoI head skips keypoints entirely:
grid points inside each proposal aggregate features **directly from the
sparse voxel maps** (x_conv2..x_conv4) through voxel queries — the sorted
voxel keys from the gather-scatter backbone let every (2R+1)^3 neighbor
lookup run as a vectorized searchsorted (ops/pointnet2_stack.voxel_query),
the TPU equivalent of the reference's CUDA voxel hash.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.pointnet2_stack import voxel_query
from .box_coders import ResidualCoder
from .grid_detectors import (
    AnchorHeadSingle,
    BEVBackbone,
    assign_anchor_targets,
    single_head_anchor_setup,
    grid_detector_loss,
)
from .layers import FCHead, SharedMLP
from .pv_rcnn import roi_grid_points, voxel_centers
from .roi_head import (
    canonical_transform_gt,
    generate_refined_boxes,
    proposal_layer,
    roi_head_loss,
    sample_rois_for_rcnn,
)
from .sparse_conv import BACKBONE_STRIDES, VoxelBackBone8x, backbone_scale_shapes
from .voxelize import point_voxel_coords, voxelize_sparse


class VoxelQueryPool(nn.Module):
    """Neighbor aggregation from one sparse scale via voxel query
    (reference voxelrcnn_head.py NeighborVoxelSAModuleMSG)."""

    radii: tuple
    nsamples: tuple
    query_ranges: tuple  # max voxel offset per radius (static)
    mlps: tuple
    scale_shape_zyx: tuple  # (nz, ny, nx) of this scale
    stride: int
    pcr: tuple
    vs: tuple

    @nn.compact
    def __call__(self, queries, vfeats, vvalid, vkeys, centers, train: bool = False):
        """queries (B, Q, 3); voxel arrays (B, V, ...). → (B, Q, sum(mlp[-1]))."""
        nz, ny, nx = self.scale_shape_zyx
        vs_scale = tuple(v * self.stride for v in self.vs)
        outs = []
        for radius, ns, qr, mlp in zip(self.radii, self.nsamples,
                                       self.query_ranges, self.mlps):
            cnt = jnp.full((queries.shape[0],), queries.shape[1], jnp.int32)
            idx, empty = voxel_query(
                queries, cnt, vkeys, vvalid, centers,
                float(radius), int(ns), int(qr), nx, ny, nz,
                point_cloud_range=self.pcr, voxel_size=vs_scale,
            )
            b, q, k = idx.shape
            flat = idx.reshape(b, q * k)
            g_xyz = jnp.take_along_axis(centers, flat[..., None], axis=1)
            g_xyz = g_xyz.reshape(b, q, k, 3) - queries[:, :, None, :]
            g_feat = jnp.take_along_axis(vfeats, flat[..., None], axis=1)
            g_feat = g_feat.reshape(b, q, k, -1)
            grouped = jnp.concatenate([g_xyz, g_feat], -1)
            grouped = jnp.where(empty[:, :, None, None], 0.0, grouped)
            f = SharedMLP(tuple(mlp))(grouped, train=train)
            outs.append(f.max(axis=2))
        return jnp.concatenate(outs, axis=-1)


class VoxelRCNN(nn.Module):
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

        rh = cfg.ROI_HEAD
        self._grid = int(rh.ROI_GRID_POOL.GRID_SIZE)
        scale_shapes = backbone_scale_shapes(gs)
        pools = {}
        for name in rh.ROI_GRID_POOL.FEATURES_SOURCE:
            pl = rh.ROI_GRID_POOL.POOL_LAYERS[name]
            pools[name] = VoxelQueryPool(
                radii=tuple(float(r) for r in pl.POOL_RADIUS),
                nsamples=tuple(int(s) for s in pl.NSAMPLE),
                query_ranges=tuple(int(q[0]) for q in pl.QUERY_RANGES),
                mlps=tuple(tuple(int(c) for c in m) for m in pl.MLPS),
                scale_shape_zyx=scale_shapes[name],
                stride=BACKBONE_STRIDES[name],
                pcr=pcr, vs=vs,
                name=f"pool_{name}",
            )
        self.grid_pools = pools
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
        bev, multiscale = self.backbone_3d(vf, vc, vk, vv, shape_zyx, train=train)
        bev2d = self.backbone_2d(bev, train=train)
        cls_preds, box_preds, dir_preds = self.dense_head(bev2d)

        out = {"cls_preds": cls_preds, "box_preds": box_preds,
               "dir_cls_preds": dir_preds, "anchors": self._anchors}

        from .grid_detectors import decode_anchor_boxes

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

        grid_pts = roi_grid_points(rois, self._grid)  # (B, R, g^3, 3)
        r = rois.shape[1]
        g3 = self._grid ** 3
        flat_grid = grid_pts.reshape(b, r * g3, 3)
        feats = []
        for name in cfg.ROI_HEAD.ROI_GRID_POOL.FEATURES_SOURCE:
            vf, vcoords, vvalid, vkeys = multiscale[name]
            centers = voxel_centers(vcoords, BACKBONE_STRIDES[name], pcr, vs)
            feats.append(self.grid_pools[name](
                flat_grid, vf, vvalid, vkeys, centers, train=train))
        pooled = jnp.concatenate(feats, axis=-1).reshape(b, r, -1)
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


def voxelrcnn_loss(out, gt_boxes, cfg, num_class: int = 1):
    """Anchor loss + RCNN refinement loss (reference voxel_rcnn.py
    get_training_loss — no keypoint head)."""
    loss1, metrics = grid_detector_loss(out, cfg, num_class)
    rw = cfg.ROI_HEAD.LOSS_CONFIG.LOSS_WEIGHTS
    targets = dict(out["roi_targets"])
    loss_rcnn_cls, loss_rcnn_reg, loss_corner = roi_head_loss(
        out["rcnn_cls"], out["rcnn_reg"], targets, ResidualCoder(),
        code_weights=list(rw.code_weights),
        cls_weight=rw.rcnn_cls_weight, reg_weight=rw.rcnn_reg_weight,
        corner_weight=rw.rcnn_corner_weight,
    )
    total = loss1 + loss_rcnn_cls + loss_rcnn_reg + loss_corner
    metrics = dict(metrics)
    metrics.update(loss=total, rcnn_loss_cls=loss_rcnn_cls,
                   rcnn_loss_reg=loss_rcnn_reg + loss_corner)
    return total, metrics
