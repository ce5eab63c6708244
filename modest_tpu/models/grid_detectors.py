"""Grid-based detectors: PointPillars and SECOND.

Reference topology (pcdet): PillarVFE → PointPillarScatter → BaseBEVBackbone
→ AnchorHeadSingle, and MeanVFE → VoxelBackBone8x (spconv) →
HeightCompression → BaseBEVBackbone → AnchorHeadSingle.

TPU re-design notes:
  * voxelization happens on-device (models/voxelize.py); pillars never
    materialize the (num_voxels, 32, C) tensor — per-point PFN features are
    segment-maxed straight into the dense BEV grid, so every point counts
    (the reference truncates at 32 points/pillar and 16k pillars).
  * SECOND's sparse backbone is the gather-scatter formulation in
    models/sparse_conv.py.
  * anchors are generated host-side once (numpy) and closed over.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.box_jax import limit_period
from ..ops.iou3d import boxes_iou3d, boxes_iou_bev, nms_bev
from .box_coders import ResidualCoder
from .layers import MaskedBatchNorm
from .losses import sigmoid_focal_loss, weighted_smooth_l1
from .voxelize import (
    pillar_stats,
    point_voxel_coords,
    scatter_max_bev,
    voxelize_sparse,
)


# ---------------------------------------------------------------------------
# anchors (reference target_assigner/anchor_generator.py)
# ---------------------------------------------------------------------------


def generate_anchors(anchor_cfg, grid_size, point_cloud_range) -> np.ndarray:
    """(A, 7) flattened anchors + feature-map shape.

    Multiple configs (multi-class AnchorHeadSingle) interleave per LOCATION
    — (fy, fx, Σ na_c, 7) — matching the head conv's location-major output
    (reference AnchorHeadSingle concatenates class anchors along the
    per-location axis); all configs must share feature_map_stride then.
    """
    per_cfg = []
    fmaps = []
    for cfg in anchor_cfg:
        stride = cfg["feature_map_stride"]
        fx = grid_size[0] // stride
        fy = grid_size[1] // stride
        pcr = point_cloud_range
        if cfg.get("align_center", False):
            x_stride = (pcr[3] - pcr[0]) / fx
            y_stride = (pcr[4] - pcr[1]) / fy
            x_off, y_off = x_stride / 2, y_stride / 2
        else:
            x_stride = (pcr[3] - pcr[0]) / (fx - 1)
            y_stride = (pcr[4] - pcr[1]) / (fy - 1)
            x_off = y_off = 0.0
        xs = pcr[0] + x_off + x_stride * np.arange(fx)
        ys = pcr[1] + y_off + y_stride * np.arange(fy)
        sizes = np.asarray(cfg["anchor_sizes"], np.float32)
        rots = np.asarray(cfg["anchor_rotations"], np.float32)
        heights = np.asarray(cfg["anchor_bottom_heights"], np.float32)
        # [y, x, z(heights), size, rot, 7]
        out = np.zeros((fy, fx, len(heights), len(sizes), len(rots), 7), np.float32)
        out[..., 0] = xs[None, :, None, None, None]
        out[..., 1] = ys[:, None, None, None, None]
        out[..., 2] = heights[None, None, :, None, None]
        out[..., 3:6] = sizes[None, None, None, :, None, :]
        out[..., 6] = rots[None, None, None, None, :]
        out[..., 2] += out[..., 5] / 2  # bottom → center z
        per_cfg.append(out.reshape(fy, fx, -1, 7))
        fmaps.append((fy, fx))
    if len(per_cfg) == 1:
        return per_cfg[0].reshape(-1, 7), fmaps[0]
    assert len(set(fmaps)) == 1, f"mixed feature_map_stride: {fmaps}"
    return np.concatenate(per_cfg, axis=2).reshape(-1, 7), fmaps[0]


def single_head_anchor_setup(anchor_cfg, grid_size, point_cloud_range):
    """Anchors + per-anchor match metadata for a (possibly multi-class)
    AnchorHeadSingle-style head.

    Anchor configs must be listed in CLASS_NAMES order (class id = position
    + 1), the convention of every reference config. Returns
    (anchors (A, 7), na_per_loc, matched_thr, unmatched_thr, anchor_cls)
    where the last three are scalars/None for one config (the MODEST case)
    and per-anchor (A,) arrays otherwise.
    """
    anchors_np, fmap = generate_anchors(anchor_cfg, grid_size, point_cloud_range)
    na_list = [
        len(c["anchor_sizes"]) * len(c["anchor_rotations"]) * len(c["anchor_bottom_heights"])
        for c in anchor_cfg
    ]
    na = sum(na_list)
    if len(anchor_cfg) == 1:
        c = anchor_cfg[0]
        return (anchors_np, na, float(c["matched_threshold"]),
                float(c["unmatched_threshold"]), None)
    m_loc = np.concatenate([np.full(n, c["matched_threshold"], np.float32)
                            for c, n in zip(anchor_cfg, na_list)])
    u_loc = np.concatenate([np.full(n, c["unmatched_threshold"], np.float32)
                            for c, n in zip(anchor_cfg, na_list)])
    cls_loc = np.concatenate([np.full(n, i + 1, np.int32)
                              for i, n in enumerate(na_list)])
    locs = fmap[0] * fmap[1]
    return (anchors_np, na, np.tile(m_loc, locs), np.tile(u_loc, locs),
            np.tile(cls_loc, locs))


def aligned_bev_iou(boxes_a, boxes_b):
    """Nearest-axis-aligned BEV IoU (reference box_utils.py:287-313)."""

    def aligned(boxes):
        rot = jnp.abs(limit_period(boxes[:, 6], 0.5, jnp.pi))
        dims = jnp.where(
            (rot < jnp.pi / 4)[:, None], boxes[:, [3, 4]], boxes[:, [4, 3]]
        )
        return jnp.concatenate(
            [boxes[:, 0:2] - dims / 2, boxes[:, 0:2] + dims / 2], axis=1
        )

    a, b = aligned(boxes_a), aligned(boxes_b)
    x_min = jnp.maximum(a[:, None, 0], b[None, :, 0])
    x_max = jnp.minimum(a[:, None, 2], b[None, :, 2])
    y_min = jnp.maximum(a[:, None, 1], b[None, :, 1])
    y_max = jnp.minimum(a[:, None, 3], b[None, :, 3])
    inter = jnp.clip(x_max - x_min, 0) * jnp.clip(y_max - y_min, 0)
    area_a = ((a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1]))[:, None]
    area_b = ((b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1]))[None, :]
    return inter / jnp.maximum(area_a + area_b - inter, 1e-6)


def assign_anchor_targets(anchors, gt_boxes, box_coder: ResidualCoder,
                          matched_thr, unmatched_thr, anchor_cls=None):
    """AxisAlignedTargetAssigner, vectorized over the batch.

    anchors (A, 7); gt_boxes (B, M, 8). matched/unmatched_thr are scalars or
    per-anchor (A,) arrays; anchor_cls (A,) int32 restricts each anchor to
    gts of its own class (the reference assigner runs per class and
    concatenates — masking the overlap matrix is equivalent). Returns labels
    (B, A) int32 (-1 ignore / 0 bg / cls), reg_targets (B, A, 7),
    reg_weights (B, A).
    """

    def per_sample(gt):
        gt_valid = jnp.abs(gt).sum(-1) > 0
        cls = gt[:, 7].astype(jnp.int32)
        ov = aligned_bev_iou(anchors, gt[:, :7])
        pair_ok = gt_valid[None, :]
        if anchor_cls is not None:
            pair_ok = pair_ok & (cls[None, :] == anchor_cls[:, None])
        ov = jnp.where(pair_ok, ov, -1.0)
        a2g_max = ov.max(axis=1)
        a2g_arg = ov.argmax(axis=1)
        g2a_max = jnp.where(gt_valid, ov.max(axis=0), -1.0)
        g2a_max = jnp.where(g2a_max == 0, -1.0, g2a_max)  # empty gt never forces
        # force-match only against REAL (and class-matched) gt columns with a
        # positive best overlap: padded gt columns carry the -1.0 sentinel,
        # which every anchor's ov entry equals — without the pair_ok gate any
        # anchor with any positive IoU anywhere would turn foreground
        force = ((ov == g2a_max[None, :]) & pair_ok
                 & (g2a_max > 0)[None, :]).any(axis=1) & (a2g_max > 0)
        pos = a2g_max >= matched_thr
        bg = a2g_max < unmatched_thr
        cls_of_anchor = cls[a2g_arg]
        labels = jnp.where(
            force | pos, cls_of_anchor, jnp.where(bg, 0, -1)
        ).astype(jnp.int32)
        any_gt = gt_valid.any()
        labels = jnp.where(any_gt, labels, 0)
        reg_targets = box_coder.encode(gt[a2g_arg, :7], anchors)
        fg = labels > 0
        reg_targets = jnp.where(fg[:, None], reg_targets, 0.0)
        return labels, reg_targets, fg.astype(jnp.float32)

    return jax.vmap(per_sample)(gt_boxes)


def assign_targets_atss(anchors, gt_boxes, box_coder: ResidualCoder, topk: int,
                        match_height: bool = False):
    """ATSS target assigner (arXiv 1912.02424), vectorized over the batch.

    Behavioral mirror of the reference ATSSTargetAssigner
    (atss_target_assigner.py:75-141) on padded gt tensors: per gt, the
    `topk` center-closest anchors are candidates; the positive-IoU cutoff is
    adaptive (mean + std of candidate IoUs); candidates must also have their
    center inside the gt's BEV rectangle (the reference compares the local
    (x, y) offset against (dy, dx)/2 — sizes swapped; mirrored verbatim for
    parity); conflicts resolve to the max-IoU gt, and each gt force-claims
    its single best-IoU anchor (even at IoU 0). No ignore band: labels are
    0 or a class id. Returns (labels (B, A), reg_targets (B, A, code),
    reg_weights (B, A)) — the assign_anchor_targets contract.
    """
    iou_fn = boxes_iou3d if match_height else boxes_iou_bev
    num_a = anchors.shape[0]
    k = min(int(topk), num_a)
    neg_inf = jnp.float32(-jnp.inf)

    def per_sample(gt):
        gt_valid = jnp.abs(gt).sum(-1) > 0                       # (M,)
        cls = gt[:, 7].astype(jnp.int32)
        m = gt.shape[0]
        ious = iou_fn(anchors, gt[:, :7])                        # (A, M)
        ious = jnp.where(gt_valid[None, :], ious, 0.0)

        # topk center-closest anchors per gt
        dist = jnp.linalg.norm(anchors[:, None, :3] - gt[None, :, :3], axis=-1)
        _, topk_idxs = jax.lax.top_k(-dist.T, k)                 # (M, K)
        cand = jnp.take_along_axis(ious.T, topk_idxs, axis=1)    # (M, K)
        # torch.std defaults to Bessel's correction (ddof=1)
        thresh = cand.mean(1) + cand.std(1, ddof=1) + 1e-6       # (M,)
        is_pos = cand >= thresh[:, None]                         # (M, K)

        # candidate center must lie inside the gt BEV rect. The reference
        # rotates the offset into the gt frame then compares (x, y) against
        # (dy, dx)/2 (sizes swapped, atss_target_assigner.py:109) — kept.
        cand_xy = anchors[topk_idxs, :2] - gt[:, None, :2]       # (M, K, 2)
        c, s = jnp.cos(-gt[:, 6]), jnp.sin(-gt[:, 6])
        x_loc = cand_xy[..., 0] * c[:, None] - cand_xy[..., 1] * s[:, None]
        y_loc = cand_xy[..., 0] * s[:, None] + cand_xy[..., 1] * c[:, None]
        half = jnp.stack([gt[:, 4], gt[:, 3]], axis=-1)[:, None, :] / 2  # (dy, dx)/2
        in_gt = (jnp.abs(x_loc) <= half[..., 0]) & (jnp.abs(y_loc) <= half[..., 1])
        is_pos = is_pos & in_gt                                  # (M, K)

        # anchors with several positive gts keep the max-IoU one
        allowed = jnp.zeros((num_a, m), jnp.int32)
        allowed = allowed.at[topk_idxs.T, jnp.arange(m)[None, :]].max(
            is_pos.T.astype(jnp.int32))
        ious_inf = jnp.where((allowed > 0) & gt_valid[None, :], ious, neg_inf)
        a2g_val = ious_inf.max(axis=1)
        a2g_arg = ious_inf.argmax(axis=1)

        # each valid gt force-claims its best-IoU anchor (last gt wins on
        # collisions, like sequential torch index assignment)
        best_anchor = ious.argmax(axis=0)                        # (M,)
        forced_m = jnp.full((num_a,), -1, jnp.int32).at[best_anchor].max(
            jnp.where(gt_valid, jnp.arange(m, dtype=jnp.int32), -1))
        idx = jnp.where(forced_m >= 0, forced_m, a2g_arg)
        val = jnp.where(
            forced_m >= 0,
            jnp.take_along_axis(ious, jnp.clip(forced_m, 0)[:, None],
                                axis=1)[:, 0],
            a2g_val,
        )
        labels = jnp.where(val > neg_inf, cls[idx], 0)
        fg = labels > 0
        reg_targets = box_coder.encode(gt[idx, :7], anchors)
        reg_targets = jnp.where(fg[:, None], reg_targets, 0.0)
        return labels, reg_targets, fg.astype(jnp.float32)

    return jax.vmap(per_sample)(gt_boxes)


# ---------------------------------------------------------------------------
# network modules
# ---------------------------------------------------------------------------


class PillarFeatureNet(nn.Module):
    """Point-wise PFN (reference PillarVFE) + dense BEV scatter."""

    num_filters: tuple
    voxel_size: tuple
    point_cloud_range: tuple
    nx: int
    ny: int
    use_absolute_xyz: bool = True
    with_distance: bool = False

    @nn.compact
    def __call__(self, points, train: bool = False):
        """points (B, N, 4+) batched → (B, ny, nx, C) BEV features.

        The geometry (voxel coords, pillar stats, scatter) is pure and
        vmapped per sample; Dense + MaskedBatchNorm run on the full batch so
        BN statistics cover every masked point (reference BN1d semantics) and
        no variable write happens inside a vmap (tracer leak otherwise)."""
        vs = self.voxel_size
        pcr = self.point_cloud_range
        grid = (self.nx, self.ny, 1)

        def geom(points):
            coords, valid = point_voxel_coords(
                points, pcr, (vs[0], vs[1], pcr[5] - pcr[2]), grid
            )
            cnt, mean, key = pillar_stats(points, valid, coords[:, :2],
                                          self.nx, self.ny)
            f_cluster = points[:, :3] - mean
            centers_x = coords[:, 0].astype(jnp.float32) * vs[0] + (vs[0] / 2 + pcr[0])
            centers_y = coords[:, 1].astype(jnp.float32) * vs[1] + (vs[1] / 2 + pcr[1])
            centers_z = jnp.full_like(centers_x, (pcr[5] - pcr[2]) / 2 + pcr[2])
            f_center = jnp.stack(
                [points[:, 0] - centers_x, points[:, 1] - centers_y,
                 points[:, 2] - centers_z],
                axis=1,
            )
            feats = [points if self.use_absolute_xyz else points[:, 3:],
                     f_cluster, f_center]
            if self.with_distance:
                feats.append(jnp.linalg.norm(points[:, :3], axis=1, keepdims=True))
            x = jnp.concatenate(feats, axis=1)
            return jnp.where(valid[:, None], x, 0.0), valid, key

        x, valid, key = jax.vmap(geom)(points)  # (B, N, F), (B, N), (B, N)
        for c in self.num_filters:
            x = nn.Dense(c, use_bias=False)(x)
            x = MaskedBatchNorm(momentum=0.99, epsilon=1e-3)(x, valid, train=train)
            x = nn.relu(x)
        return jax.vmap(
            lambda xx, kk, vv: scatter_max_bev(xx, kk, vv, self.nx, self.ny)
        )(x, key, valid)


class BEVBackbone(nn.Module):
    """BaseBEVBackbone (reference backbones_2d/base_bev_backbone.py) —
    channel-last convs, multi-scale + upsample concat."""

    layer_nums: tuple
    layer_strides: tuple
    num_filters: tuple
    upsample_strides: tuple
    num_upsample_filters: tuple

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(y):
            return nn.BatchNorm(use_running_average=not train, momentum=0.99,
                                epsilon=1e-3)(y)

        ups = []
        for i, n_layers in enumerate(self.layer_nums):
            x = nn.Conv(self.num_filters[i], (3, 3), strides=self.layer_strides[i],
                        padding=1, use_bias=False)(x)
            x = nn.relu(bn(x))
            for _ in range(n_layers):
                x = nn.Conv(self.num_filters[i], (3, 3), padding=1, use_bias=False)(x)
                x = nn.relu(bn(x))
            s = self.upsample_strides[i]
            if s >= 1:
                up = nn.ConvTranspose(
                    self.num_upsample_filters[i], (s, s), strides=(s, s), use_bias=False
                )(x)
            else:
                inv = int(round(1 / s))
                up = nn.Conv(self.num_upsample_filters[i], (inv, inv), strides=inv,
                             use_bias=False)(x)
            ups.append(nn.relu(bn(up)))
        return jnp.concatenate(ups, axis=-1) if len(ups) > 1 else ups[0]


class AnchorHeadSingle(nn.Module):
    """1x1 conv heads over the BEV map (reference anchor_head_single.py)."""

    num_class: int
    num_anchors_per_loc: int
    code_size: int
    num_dir_bins: int = 2
    use_dir: bool = True

    @nn.compact
    def __call__(self, bev):
        na = self.num_anchors_per_loc
        cls = nn.Conv(na * self.num_class, (1, 1))(bev)
        box = nn.Conv(na * self.code_size, (1, 1))(bev)
        dir_cls = nn.Conv(na * self.num_dir_bins, (1, 1))(bev) if self.use_dir else None
        b = bev.shape[0]
        cls = cls.reshape(b, -1, self.num_class)
        box = box.reshape(b, -1, self.code_size)
        if dir_cls is not None:
            dir_cls = dir_cls.reshape(b, -1, self.num_dir_bins)
        return cls, box, dir_cls


class GridDetector(nn.Module):
    """PointPillar / SECONDNet full detector (single or multi-group head)."""

    model_cfg: Any
    num_class: int
    point_cloud_range: Any
    voxel_size: Any
    grid_size: Any
    class_names: Any = None  # required for AnchorHeadMulti

    def setup(self):
        from ..utils.config import Config

        cfg = Config(self.model_cfg)
        self.cfg = cfg
        pcr = tuple(float(v) for v in self.point_cloud_range)
        vs = tuple(float(v) for v in self.voxel_size)
        gs = tuple(int(v) for v in self.grid_size)
        self._pcr, self._vs, self._gs = pcr, vs, gs

        # multi-class anchor sets also route through the grouped head: it
        # provides the per-class thresholds + class-major anchor ordering
        # that the single-head fast path (one class, one threshold) skips
        self._use_multihead = (
            cfg.DENSE_HEAD.get("NAME", "AnchorHeadSingle") == "AnchorHeadMulti"
            or len(cfg.DENSE_HEAD.ANCHOR_GENERATOR_CONFIG) > 1
        )
        # BOX_CODER_CONFIG may live under TARGET_ASSIGNER_CONFIG (reference
        # cbgs_* configs) or directly under DENSE_HEAD
        tac = cfg.DENSE_HEAD.get("TARGET_ASSIGNER_CONFIG", None)
        bcc = (tac.get("BOX_CODER_CONFIG", None) if tac else None)             or cfg.DENSE_HEAD.get("BOX_CODER_CONFIG", None)
        code_size = int(bcc.get("code_size", 7)) if bcc else 7
        sincos = bool(bcc.get("encode_angle_by_sincos", False)) if bcc else False
        self.box_coder = ResidualCoder(code_size=code_size,
                                       encode_angle_by_sincos=sincos)
        if self._use_multihead:
            from .anchor_head_multi import AnchorHeadMulti

            assert self.class_names is not None
            self.dense_head_multi = AnchorHeadMulti(
                model_cfg=cfg.DENSE_HEAD.to_dict(),
                class_names=tuple(self.class_names),
                grid_size=gs, point_cloud_range=pcr,
                code_size=code_size,
                encode_angle_by_sincos=sincos,
            )
            anchors_np = None
        else:
            anchors_np, fmap = generate_anchors(
                [c.to_dict() for c in cfg.DENSE_HEAD.ANCHOR_GENERATOR_CONFIG],
                gs, pcr,
            )
        if anchors_np is not None:
            self._anchors = jnp.asarray(anchors_np)
            acfg = cfg.DENSE_HEAD.ANCHOR_GENERATOR_CONFIG[0]
            self._matched_thr = float(acfg.matched_threshold)
            self._unmatched_thr = float(acfg.unmatched_threshold)
            na = len(acfg.anchor_sizes) * len(acfg.anchor_rotations) * len(
                acfg.anchor_bottom_heights
            )
        # TARGET_ASSIGNER_CONFIG.NAME selects the train-time matcher
        # (reference anchor_head_template.get_target_assigner)
        self._assigner = str(tac.get("NAME", "AxisAlignedTargetAssigner")) if tac else "AxisAlignedTargetAssigner"
        self._atss_topk = int(tac.get("TOPK", 9)) if tac else 9
        self._match_height = bool(tac.get("MATCH_HEIGHT", False)) if tac else False
        if self._assigner not in ("AxisAlignedTargetAssigner", "ATSS"):
            raise NotImplementedError(self._assigner)

        if cfg.NAME == "PointPillar":
            self.vfe = PillarFeatureNet(
                num_filters=tuple(cfg.VFE.NUM_FILTERS),
                voxel_size=vs, point_cloud_range=pcr, nx=gs[0], ny=gs[1],
                use_absolute_xyz=bool(cfg.VFE.get("USE_ABSLOTE_XYZ", True)),
                with_distance=bool(cfg.VFE.get("WITH_DISTANCE", False)),
            )
        bb = cfg.BACKBONE_2D
        self.backbone_2d = BEVBackbone(
            layer_nums=tuple(bb.LAYER_NUMS),
            layer_strides=tuple(bb.LAYER_STRIDES),
            num_filters=tuple(bb.NUM_FILTERS),
            upsample_strides=tuple(bb.UPSAMPLE_STRIDES),
            num_upsample_filters=tuple(bb.NUM_UPSAMPLE_FILTERS),
        )
        if not self._use_multihead:
            self.dense_head = AnchorHeadSingle(
                num_class=self.num_class,
                num_anchors_per_loc=na,
                code_size=self.box_coder.code_size,
                num_dir_bins=int(cfg.DENSE_HEAD.get("NUM_DIR_BINS", 2)),
                use_dir=bool(cfg.DENSE_HEAD.get("USE_DIRECTION_CLASSIFIER", True)),
            )
        if cfg.NAME == "SECONDNet":
            from .sparse_conv import VoxelBackBone8x, VoxelResBackBone8x

            bb3d = cfg.get("BACKBONE_3D", None)
            if bb3d is not None and bb3d.get("NAME", "VoxelBackBone8x") == "VoxelResBackBone8x":
                self.backbone_3d = VoxelResBackBone8x()
            else:
                self.backbone_3d = VoxelBackBone8x()

    def __call__(self, points, gt_boxes=None, train: bool = False,
                 max_voxels: int = 16000):
        from ..utils.config import Config

        cfg = Config(self.cfg)  # flax re-freezes setup attrs
        if cfg.NAME == "PointPillar":
            bev = self.vfe(points, train=train)
        else:  # SECONDNet
            gs = self._gs
            shape_zyx = (gs[2] + 1, gs[1], gs[0])  # z padded like spconv

            def prep(p):  # pure voxelization per sample
                coords, valid = point_voxel_coords(p, self._pcr, self._vs, gs)
                return voxelize_sparse(
                    p, valid, coords, max_voxels, gs[0], gs[1], gs[2]
                )

            vc, vf, vv, vk = jax.vmap(prep)(points)
            bev = self.backbone_3d(vf, vc, vk, vv, shape_zyx, train=train)

        bev2d = self.backbone_2d(bev, train=train)
        if self._use_multihead:
            out = self.dense_head_multi(bev2d, gt_boxes=gt_boxes, train=train)
            if not train:
                batch_cls, batch_box = decode_anchor_boxes(
                    cfg, out["anchors"], self.box_coder,
                    out["cls_preds"], out["box_preds"], out["dir_cls_preds"],
                )
                out["batch_cls_preds"] = batch_cls
                out["batch_box_preds"] = batch_box
            return out
        cls_preds, box_preds, dir_preds = self.dense_head(bev2d)

        out = {"cls_preds": cls_preds, "box_preds": box_preds,
               "dir_cls_preds": dir_preds, "anchors": self._anchors}
        if train:
            if self._assigner == "ATSS":
                labels, reg_targets, reg_w = assign_targets_atss(
                    self._anchors, gt_boxes, self.box_coder,
                    topk=self._atss_topk, match_height=self._match_height,
                )
            else:
                labels, reg_targets, reg_w = assign_anchor_targets(
                    self._anchors, gt_boxes, self.box_coder,
                    self._matched_thr, self._unmatched_thr,
                )
            out["box_cls_labels"] = labels
            out["box_reg_targets"] = reg_targets
        else:
            batch_cls, batch_box = self.generate_predicted_boxes(
                cls_preds, box_preds, dir_preds
            )
            out["batch_cls_preds"] = batch_cls
            out["batch_box_preds"] = batch_box
        return out

    def generate_predicted_boxes(self, cls_preds, box_preds, dir_preds):
        from ..utils.config import Config

        cfg = Config(self.cfg)
        anchors = self._anchors[None]
        boxes = self.box_coder.decode(box_preds, anchors)
        if dir_preds is not None:
            dir_offset = float(cfg.DENSE_HEAD.DIR_OFFSET)
            dir_limit = float(cfg.DENSE_HEAD.DIR_LIMIT_OFFSET)
            bins = int(cfg.DENSE_HEAD.NUM_DIR_BINS)
            dir_labels = dir_preds.argmax(axis=-1)
            period = 2 * jnp.pi / bins
            dir_rot = limit_period(boxes[..., 6] - dir_offset, dir_limit, period)
            boxes = boxes.at[..., 6].set(
                dir_rot + dir_offset + period * dir_labels.astype(boxes.dtype)
            )
        return cls_preds, boxes


def grid_detector_loss(out, cfg, num_class: int = 1):
    """AnchorHeadTemplate losses (reference anchor_head_template.py:101-223)."""
    lw = cfg.DENSE_HEAD.LOSS_CONFIG.LOSS_WEIGHTS
    cls_preds = out["cls_preds"]
    box_preds = out["box_preds"]
    labels = out["box_cls_labels"]
    reg_targets = out["box_reg_targets"]
    anchors = out["anchors"][None]
    b = cls_preds.shape[0]

    positives = labels > 0
    negatives = labels == 0
    cls_w = (negatives + 1.0 * positives).astype(jnp.float32)
    reg_w = positives.astype(jnp.float32)
    pos_norm = jnp.clip(positives.sum(1, keepdims=True).astype(jnp.float32), 1.0, None)
    cls_w = cls_w / pos_norm
    reg_w = reg_w / pos_norm
    assert cls_preds.shape[-1] == num_class, (
        f"cls_preds have {cls_preds.shape[-1]} class columns but the loss "
        f"was built for num_class={num_class}: a narrower one-hot would "
        "silently broadcast targets across columns")
    one_hot = jax.nn.one_hot(jnp.clip(labels, 0, None), num_class + 1)[..., 1:]
    cls_loss = sigmoid_focal_loss(cls_preds, one_hot, cls_w).sum() / b
    cls_loss = cls_loss * lw.cls_weight

    if out.get("box_coder_sincos", False):
        # sincos coders already regress cos/sin residual channels — no trick
        bp, bt = box_preds, reg_targets
    else:
        # sin(a−b) residual trick on the heading channel
        sin_pred = jnp.sin(box_preds[..., 6:7]) * jnp.cos(reg_targets[..., 6:7])
        sin_tgt = jnp.cos(box_preds[..., 6:7]) * jnp.sin(reg_targets[..., 6:7])
        bp = jnp.concatenate(
            [box_preds[..., :6], sin_pred, box_preds[..., 7:]], axis=-1)
        bt = jnp.concatenate(
            [reg_targets[..., :6], sin_tgt, reg_targets[..., 7:]], axis=-1)
    loc_loss = weighted_smooth_l1(bp, bt, reg_w, list(lw.code_weights)).sum() / b
    loc_loss = loc_loss * lw.loc_weight
    total = cls_loss + loc_loss

    metrics = {"rpn_loss_cls": cls_loss, "rpn_loss_loc": loc_loss}
    if out.get("dir_cls_preds") is not None:
        bins = int(cfg.DENSE_HEAD.NUM_DIR_BINS)
        dir_offset = float(cfg.DENSE_HEAD.DIR_OFFSET)
        if "box_gt_heading" in out:  # sincos coders: use the raw gt heading
            rot_gt = out["box_gt_heading"]
        else:
            rot_gt = reg_targets[..., 6] + anchors[..., 6]
        offset_rot = limit_period(rot_gt - dir_offset, 0, 2 * jnp.pi)
        dir_targets = jnp.clip(
            jnp.floor(offset_rot / (2 * jnp.pi / bins)).astype(jnp.int32), 0, bins - 1
        )
        logp = jax.nn.log_softmax(out["dir_cls_preds"], axis=-1)
        ce = -jnp.take_along_axis(logp, dir_targets[..., None], axis=-1)[..., 0]
        dir_w = positives.astype(jnp.float32)
        dir_w = dir_w / jnp.clip(dir_w.sum(-1, keepdims=True), 1.0, None)
        dir_loss = (ce * dir_w).sum() / b * lw.dir_weight
        total = total + dir_loss
        metrics["rpn_loss_dir"] = dir_loss
    metrics["loss"] = total
    return total, metrics


def grid_post_process(out, post_cfg):
    """Score-thresholded NMS over decoded anchors (same contract as
    pointrcnn.post_process). MULTI_CLASSES_NMS runs per-class rotated NMS
    (reference model_nms_utils.multi_classes_nms) — the CBGS operating
    point."""
    nms_cfg = post_cfg.NMS_CONFIG
    pre_max = int(nms_cfg.NMS_PRE_MAXSIZE)
    post_max = int(nms_cfg.NMS_POST_MAXSIZE)
    thresh = float(nms_cfg.NMS_THRESH)
    score_thresh = float(post_cfg.SCORE_THRESH)
    multi = bool(nms_cfg.get("MULTI_CLASSES_NMS", False))

    if multi:
        from ..ops.iou3d import multi_classes_nms

        def per_sample_mc(cls, boxes):
            scores = jax.nn.sigmoid(cls)
            fs, fl, idx, fm = multi_classes_nms(
                scores, boxes[..., :7], thresh, score_thresh=score_thresh,
                pre_maxsize=pre_max, post_maxsize=post_max,
            )
            return boxes[idx], fs, fl, fm

        fb, fs, fl, fm = jax.vmap(per_sample_mc)(
            out["batch_cls_preds"], out["batch_box_preds"])
        return {"boxes": fb, "scores": fs, "labels": fl, "valid": fm,
                "rois": None}

    def per_sample(cls, boxes):
        scores = jax.nn.sigmoid(cls).max(axis=-1)
        labels = cls.argmax(axis=-1) + 1
        ok = scores > score_thresh
        masked = jnp.where(ok, scores, -jnp.inf)
        top_scores, top_idx = jax.lax.top_k(masked, min(pre_max, masked.shape[0]))
        keep, keep_mask = nms_bev(boxes[top_idx], top_scores, thresh, post_max)
        sel = top_idx[keep]
        return boxes[sel], scores[sel], labels[sel], keep_mask

    fb, fs, fl, fm = jax.vmap(per_sample)(out["batch_cls_preds"], out["batch_box_preds"])
    return {"boxes": fb, "scores": fs, "labels": fl, "valid": fm, "rois": None}


def decode_anchor_boxes(cfg, anchors, box_coder, cls_preds, box_preds, dir_preds):
    """Anchor-decode + direction-bin snap, shared by all anchor-head models
    (reference anchor_head_template.generate_predicted_boxes)."""
    boxes = box_coder.decode(box_preds, anchors[None])
    if dir_preds is not None:
        dir_offset = float(cfg.DENSE_HEAD.DIR_OFFSET)
        dir_limit = float(cfg.DENSE_HEAD.DIR_LIMIT_OFFSET)
        bins = int(cfg.DENSE_HEAD.NUM_DIR_BINS)
        dir_labels = dir_preds.argmax(axis=-1)
        period = 2 * jnp.pi / bins
        dir_rot = limit_period(boxes[..., 6] - dir_offset, dir_limit, period)
        boxes = boxes.at[..., 6].set(
            dir_rot + dir_offset + period * dir_labels.astype(boxes.dtype)
        )
    return cls_preds, boxes
