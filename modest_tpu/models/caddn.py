"""CaDDN — monocular 3D detection via categorical depth distributions
(reference: pcdet/models/detectors/caddn.py, backbones_3d/ffe/{ddn_deeplabv3,
depth_ffe}.py, backbones_3d/f2v/frustum_to_voxel.py; config
tools/cfgs/kitti_models/CaDDN.yaml — D19 unused-by-MODEST set).

Pipeline: an image encoder predicts per-pixel features and a categorical
depth distribution over D LID-spaced bins; their outer product forms a
frustum feature volume; every lidar voxel center projects into the frustum
and trilinearly samples it; the resulting voxel grid collapses to BEV and
runs the standard anchor head.

TPU notes: frustum sampling is 8 static corner gathers blended by weights —
the `grid_sample` equivalent XLA fuses into the surrounding elementwise ops.
Two image encoders: with cfg FFE.DDN.NAME=DDNDeepLabV3 the reference's full
DeepLabV3+ResNet101 DDN (ddn_deeplabv3.py, weight-convertible via
train/torch_convert); otherwise a compact stride-4 conv encoder for fast
CPU training tests. The depth-distribution, frustum and voxel machinery
follow the paper exactly either way.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .box_coders import ResidualCoder
from .grid_detectors import (
    AnchorHeadSingle,
    BEVBackbone,
    assign_anchor_targets,
    single_head_anchor_setup,
    decode_anchor_boxes,
    grid_detector_loss,
)
from .losses import sigmoid_focal_loss


# ---------------------------------------------------------------------------
# LID depth discretization (CaDDN paper eq. 2; reference ffe utils)
# ---------------------------------------------------------------------------


def lid_bin_from_depth(depth, d_min: float, d_max: float, num_bins: int):
    """Continuous depth → fractional LID bin index (can be sampled)."""
    delta = 2.0 * (d_max - d_min) / (num_bins * (1 + num_bins))
    idx = -0.5 + 0.5 * jnp.sqrt(1.0 + 8.0 * jnp.maximum(depth - d_min, 0.0) / delta)
    return idx


def depth_to_lid_target(depth, d_min: float, d_max: float, num_bins: int):
    """Integer bin target with the reference's out-of-range handling:
    foreground bins [0, D), depth > d_max or invalid → bin D (the extra
    'beyond' class)."""
    idx = jnp.floor(lid_bin_from_depth(depth, d_min, d_max, num_bins))
    idx = jnp.where((depth < d_min) | (depth > d_max) | (idx >= num_bins)
                    | (depth <= 0), num_bins, idx)
    return idx.astype(jnp.int32)


class ImageEncoder(nn.Module):
    """Compact stride-4 conv encoder → (H/4, W/4) image features + depth
    logits over D+1 classes (replaces the reference's DeepLabV3 DDN)."""

    channels: tuple = (32, 64)
    num_feats: int = 64
    num_depth_bins: int = 80

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, c in enumerate(self.channels):
            x = nn.Conv(c, (3, 3), strides=(2, 2), padding="SAME")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
            x = nn.relu(x)
        x = nn.Conv(self.num_feats + self.num_depth_bins + 1, (3, 3),
                    padding="SAME")(x)
        feats = x[..., : self.num_feats]
        depth_logits = x[..., self.num_feats:]
        return feats, depth_logits


def sample_frustum(frustum, u, v, dbin, h: int, w: int, d: int):
    """Trilinear sample of (B, H', W', D, C) frustum at fractional
    (u, v, dbin) — (B, N) each. Out-of-range samples → 0."""
    b, _, _, _, c = frustum.shape

    inb = ((u >= 0) & (u <= w - 1) & (v >= 0) & (v <= h - 1)
           & (dbin >= 0) & (dbin <= d - 1))
    u = jnp.clip(u, 0.0, w - 1 - 1e-4)
    v = jnp.clip(v, 0.0, h - 1 - 1e-4)
    dbin = jnp.clip(dbin, 0.0, d - 1 - 1e-4)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    d0 = jnp.floor(dbin).astype(jnp.int32)
    tu, tv, td = u - u0, v - v0, dbin - d0
    u0 = jnp.minimum(u0, w - 2)
    v0 = jnp.minimum(v0, h - 2)
    d0 = jnp.minimum(d0, d - 2)

    flat = frustum.reshape(b, h * w * d, c)

    def corner(dv, du, dd):
        idx = ((v0 + dv) * w + (u0 + du)) * d + (d0 + dd)
        g = jnp.take_along_axis(flat, idx[..., None], axis=1)
        wv = jnp.where(dv == 1, tv, 1 - tv)
        wu = jnp.where(du == 1, tu, 1 - tu)
        wd = jnp.where(dd == 1, td, 1 - td)
        return g * (wv * wu * wd)[..., None]

    out = sum(corner(dv, du, dd) for dv in (0, 1) for du in (0, 1)
              for dd in (0, 1))
    return out * inb[..., None]


class CaDDN(nn.Module):
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

        ffe = cfg.FFE
        self._d_min = float(ffe.DISC_CFG.depth_min)
        self._d_max = float(ffe.DISC_CFG.depth_max)
        self._d_bins = int(ffe.DISC_CFG.num_bins)
        self._img_stride = 4  # encoder downsampling (DeepLab layer1 = 4 too)
        ddn_cfg = ffe.get("DDN", None)
        if ddn_cfg is not None and str(ddn_cfg.get("NAME")) == "DDNDeepLabV3":
            # architecture-parity path: the reference's DeepLabV3 DDN
            # (ddn_deeplabv3.py) + 1x1 CHANNEL_REDUCE (depth_ffn.py)
            from .ddn_deeplabv3 import DDNDeepLabV3

            self.ddn = DDNDeepLabV3(
                num_classes=self._d_bins + 1,
                backbone_name=str(ddn_cfg.get("BACKBONE_NAME", "ResNet101")),
            )
            cr = ffe.get("CHANNEL_REDUCE", {"out_channels": 64})
            # BasicBlock2D = conv + BN + ReLU (model_utils/basic_block_2d.py)
            self.channel_reduce = nn.Conv(
                int(cr.get("out_channels", 64)), (1, 1),
                use_bias=bool(cr.get("bias", False)), name="channel_reduce")
            self.channel_reduce_bn = nn.BatchNorm(
                momentum=0.9, epsilon=1e-5, name="channel_reduce_bn")
            self.encoder = None
        else:
            self.ddn = None
            self.encoder = ImageEncoder(
                channels=tuple(ffe.ENCODER_CHANNELS),
                num_feats=int(ffe.NUM_FEATURES),
                num_depth_bins=self._d_bins,
            )
        self.bev_collapse = nn.Dense(int(cfg.MAP_TO_BEV.NUM_BEV_FEATURES),
                                     name="bev_collapse")
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

    def __call__(self, images, lidar_to_cam, cam_to_img, gt_boxes=None,
                 train: bool = False):
        """images (B, H, W, 3); lidar_to_cam (B, 4, 4); cam_to_img (B, 3, 4)."""
        from ..utils.config import Config

        cfg = Config(self.cfg)
        pcr, vs, gs = self._pcr, self._vs, self._gs
        b = images.shape[0]
        d = self._d_bins

        if self.ddn is not None:
            feats256, depth_logits = self.ddn(images, train=train)
            feats = nn.relu(self.channel_reduce_bn(
                self.channel_reduce(feats256), use_running_average=not train))
        else:
            feats, depth_logits = self.encoder(images, train=train)
        hf, wf = feats.shape[1], feats.shape[2]
        depth_probs = jax.nn.softmax(depth_logits, axis=-1)[..., :d]
        # frustum features: outer product (paper eq. 1) → (B, H', W', D, C)
        frustum = depth_probs[..., :, None] * feats[..., None, :]

        # voxel centers → camera → image plane
        nx, ny, nz = gs
        xs = (jnp.arange(nx) + 0.5) * vs[0] + pcr[0]
        ys = (jnp.arange(ny) + 0.5) * vs[1] + pcr[1]
        zs = (jnp.arange(nz) + 0.5) * vs[2] + pcr[2]
        gx, gy, gz = jnp.meshgrid(xs, ys, zs, indexing="ij")  # (nx, ny, nz)
        centers = jnp.stack([gx, gy, gz, jnp.ones_like(gx)], -1).reshape(-1, 4)
        n = centers.shape[0]

        def lift(l2c, c2i):
            cam = centers @ l2c.T  # (N, 4)
            img = cam[:, :3] @ c2i[:, :3].T + c2i[:, 3]
            depth = img[:, 2]
            uu = img[:, 0] / jnp.maximum(depth, 1e-4) / self._img_stride
            vv = img[:, 1] / jnp.maximum(depth, 1e-4) / self._img_stride
            db = lid_bin_from_depth(depth, self._d_min, self._d_max, d)
            db = jnp.where(depth <= 0, -1.0, db)
            return uu, vv, db

        uu, vv, db = jax.vmap(lift)(lidar_to_cam, cam_to_img)  # (B, N)
        vox = sample_frustum(frustum, uu, vv, db, hf, wf, d)  # (B, N, C)
        vox = vox.reshape(b, nx, ny, nz, -1)
        # collapse z → BEV (ny, nx, nz*C) like HeightCompression
        bev = jnp.transpose(vox, (0, 2, 1, 3, 4)).reshape(b, ny, nx, -1)
        bev = nn.relu(self.bev_collapse(bev))

        bev2d = self.backbone_2d(bev, train=train)
        cls_preds, box_preds, dir_preds = self.dense_head(bev2d)
        out = {"cls_preds": cls_preds, "box_preds": box_preds,
               "dir_cls_preds": dir_preds, "anchors": self._anchors,
               "depth_logits": depth_logits}
        if train:
            labels, reg_targets, _ = assign_anchor_targets(
                self._anchors, gt_boxes, self.box_coder,
                self._matched_thr, self._unmatched_thr,
                anchor_cls=self._anchor_cls,
            )
            out["box_cls_labels"] = labels
            out["box_reg_targets"] = reg_targets
        else:
            out["batch_cls_preds"], out["batch_box_preds"] = decode_anchor_boxes(
                cfg, self._anchors, self.box_coder, cls_preds, box_preds,
                dir_preds)
        return out


def caddn_depth_loss(depth_logits, depth_maps, d_min, d_max, num_bins,
                     stride: int = 4, gt_boxes2d=None, fg_weight: float = 13.0,
                     bg_weight: float = 1.0):
    """Focal loss on the categorical depth distribution vs lidar depth maps
    (reference ffe DDNLoss). depth_maps (B, H, W): full image resolution
    (subsampled here) or already at the logits' stride-4 resolution
    (downsample_depth_map processor); 0 = no return. gt_boxes2d (B, M, 4)
    [u1 v1 u2 v2] in full-image pixels upweights foreground pixels
    (reference fg_weight 13 / bg_weight 1)."""
    b, hf, wf, _ = depth_logits.shape
    if depth_maps.shape[1] > hf:
        dm = depth_maps[:, ::stride, ::stride][:, :hf, :wf]
    else:
        dm = depth_maps[:, :hf, :wf]
    target = depth_to_lid_target(dm, d_min, d_max, num_bins)  # (B, hf, wf)
    valid = dm > 0
    w = valid.astype(jnp.float32)
    if gt_boxes2d is not None:
        bx = gt_boxes2d / stride
        real = jnp.abs(gt_boxes2d).sum(-1) > 0  # (B, M)
        u = jnp.arange(wf, dtype=jnp.float32)[None, None, None, :]  # (1,1,1,wf)
        v = jnp.arange(hf, dtype=jnp.float32)[None, None, :, None]  # (1,1,hf,1)
        inside = ((u >= bx[..., 0, None, None]) & (u < bx[..., 2, None, None])
                  & (v >= bx[..., 1, None, None]) & (v < bx[..., 3, None, None])
                  & real[..., None, None])
        fg = inside.any(axis=1)  # (B, hf, wf)
        w = w * jnp.where(fg, fg_weight, bg_weight)
    one_hot = jax.nn.one_hot(target, num_bins + 1)
    per = sigmoid_focal_loss(depth_logits, one_hot, w)
    return per.sum() / jnp.maximum(w.sum(), 1.0)


def caddn_loss(out, gt_boxes, cfg, num_class: int = 1, depth_maps=None):
    loss1, metrics = grid_detector_loss(out, cfg, num_class)
    total = loss1
    if depth_maps is None:
        depth_maps = out.get("depth_maps")
    if depth_maps is not None:
        ffe = cfg.FFE
        lw = ffe.LOSS_CONFIG.LOSS_WEIGHTS
        ld = caddn_depth_loss(
            out["depth_logits"], depth_maps,
            float(ffe.DISC_CFG.depth_min), float(ffe.DISC_CFG.depth_max),
            int(ffe.DISC_CFG.num_bins),
            gt_boxes2d=out.get("gt_boxes2d"),
            fg_weight=float(lw.get("fg_weight", 13.0)),
            bg_weight=float(lw.get("bg_weight", 1.0)),
        ) * float(lw.ddn_loss_weight)
        total = total + ld
        metrics = dict(metrics)
        metrics.update(loss=total, depth_loss=ld)
    return total, metrics
