"""Multi-group anchor head (CBGS) — reference pcdet/models/dense_heads/
anchor_head_multi.py (411 LoC).

Grouped per-class heads over a shared BEV conv: RPN_HEAD_CFGS partitions the
classes into groups; each group gets its own cls/box/dir 1x1-conv stack, and
every class has its own anchor geometry + match thresholds
(ANCHOR_GENERATOR_CONFIG, one entry per class).

TPU layout notes: predictions are reshaped to put the class axis OUTSIDE the
location axis, so the flattened anchor order is [class][y][x][rot] — the
same order `generate_multiclass_anchors` emits — and the whole target
assignment runs as one vectorized pass with per-anchor threshold vectors
instead of the reference's per-class Python loop.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.box_jax import limit_period
from .box_coders import ResidualCoder
from .grid_detectors import aligned_bev_iou, generate_anchors
from .losses import sigmoid_focal_loss, weighted_smooth_l1


def generate_multiclass_anchors(anchor_cfgs, grid_size, point_cloud_range,
                                class_names, head_groups):
    """Anchors ordered [head][class][y][x][z·size·rot].

    Returns (anchors (A, 7), anchor_class (A,) int32 1-based global ids,
    matched_thr (A,), unmatched_thr (A,), per-head anchor counts).
    """
    by_name = {c["class_name"]: c for c in anchor_cfgs}
    anchors, cls_ids, m_thr, u_thr, head_counts = [], [], [], [], []
    for group in head_groups:
        count = 0
        for name in group:
            cfg = by_name[name]
            a, _ = generate_anchors([cfg], grid_size, point_cloud_range)
            anchors.append(a)
            gid = class_names.index(name) + 1
            cls_ids.append(np.full(len(a), gid, np.int32))
            m_thr.append(np.full(len(a), cfg["matched_threshold"], np.float32))
            u_thr.append(np.full(len(a), cfg["unmatched_threshold"], np.float32))
            count += len(a)
        head_counts.append(count)
    return (np.concatenate(anchors), np.concatenate(cls_ids),
            np.concatenate(m_thr), np.concatenate(u_thr), head_counts)


def assign_multiclass_targets(anchors, anchor_cls, matched_thr, unmatched_thr,
                              gt_boxes, box_coder):
    """Per-class axis-aligned target assignment, vectorized (reference
    target_assigner/axis_aligned_target_assigner.py:8-141 — the per-class
    loop becomes a class-equality mask on the IoU matrix).

    gt_boxes (B, M, C+1) with the class id in the LAST column. Returns
    labels (B, A) (-1 ignore / 0 bg / global class id), reg_targets
    (B, A, code), reg_weights.
    """

    def per_sample(gt):
        gt_valid = jnp.abs(gt).sum(-1) > 0
        gt_cls = gt[:, -1].astype(jnp.int32)
        ov = aligned_bev_iou(anchors, gt[:, :7])
        same_cls = anchor_cls[:, None] == gt_cls[None, :]
        pair_ok = gt_valid[None, :] & same_cls
        ov = jnp.where(pair_ok, ov, -1.0)
        a2g_max = ov.max(axis=1)
        a2g_arg = ov.argmax(axis=1)
        g2a_max = ov.max(axis=0)
        g2a_max = jnp.where(g2a_max <= 0, -1.0, g2a_max)
        # force-match only against REAL, class-matched gt columns with a
        # positive best overlap: padded columns carry the -1.0 sentinel,
        # which every anchor's masked ov entry equals — without the pair_ok
        # gate any anchor with any positive IoU turns foreground
        force = ((ov == g2a_max[None, :]) & pair_ok
                 & (g2a_max > 0)[None, :]).any(axis=1) & (a2g_max > 0)
        pos = a2g_max >= matched_thr
        bg = a2g_max < unmatched_thr
        labels = jnp.where(force | pos, anchor_cls, jnp.where(bg, 0, -1))
        any_gt = gt_valid.any()
        labels = jnp.where(any_gt, labels, 0).astype(jnp.int32)
        n_box = gt.shape[-1] - 1
        reg_targets = box_coder.encode(gt[a2g_arg, :n_box], anchors)
        fg = labels > 0
        reg_targets = jnp.where(fg[:, None], reg_targets, 0.0)
        gt_heading = jnp.where(fg, gt[a2g_arg, 6], 0.0)
        return labels, reg_targets, fg.astype(jnp.float32), gt_heading

    return jax.vmap(per_sample)(gt_boxes)


class SingleGroupHead(nn.Module):
    """One class group's conv stack (reference SingleHead without the
    separate-reg variant: one fused box conv — the REG_LIST split convs
    compute the same channels)."""

    num_class: int
    num_anchors_per_loc: int  # summed over the group's classes
    code_size: int
    num_middle_conv: int = 0
    num_middle_filter: int = 64
    num_dir_bins: int = 2
    use_dir: bool = True

    @nn.compact
    def __call__(self, bev, train: bool = False):
        def mid(x):
            for _ in range(self.num_middle_conv):
                x = nn.Conv(self.num_middle_filter, (3, 3), padding=1,
                            use_bias=False)(x)
                x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                                 epsilon=1e-3)(x)
                x = nn.relu(x)
            return x

        na = self.num_anchors_per_loc
        cls = nn.Conv(na * self.num_class, (1, 1))(mid(bev))
        box = nn.Conv(na * self.code_size, (1, 1))(mid(bev))
        dir_cls = (nn.Conv(na * self.num_dir_bins, (1, 1))(mid(bev))
                   if self.use_dir else None)
        return cls, box, dir_cls


class AnchorHeadMulti(nn.Module):
    """Shared conv + per-group heads; emits class-major flattened preds
    aligned with generate_multiclass_anchors' order."""

    model_cfg: Any
    class_names: tuple
    grid_size: tuple
    point_cloud_range: tuple
    code_size: int = 7          # raw box dims (9 = with velocity)
    encode_angle_by_sincos: bool = False

    def setup(self):
        from ..utils.config import Config

        cfg = Config(self.model_cfg)
        # Multi-class AnchorHeadSingle configs route through this head only
        # for the per-class thresholds / class-major anchor ordering; the
        # reference AnchorHeadSingle has NO shared conv (1x1 heads directly on
        # the BEV features), so only insert one when the config is a real
        # AnchorHeadMulti or explicitly sets SHARED_CONV_NUM_FILTER.
        shared = cfg.get("SHARED_CONV_NUM_FILTER", None)
        self.use_shared_conv = (
            shared is not None or cfg.get("NAME", "AnchorHeadMulti") != "AnchorHeadSingle"
        )
        self.shared_ch = int(shared) if shared is not None else 64
        groups = [tuple(h.HEAD_CLS_NAME) for h in cfg.RPN_HEAD_CFGS] \
            if cfg.get("RPN_HEAD_CFGS") else [tuple(self.class_names)]
        self.head_groups = groups
        self.box_coder = ResidualCoder(
            code_size=self.code_size,
            encode_angle_by_sincos=self.encode_angle_by_sincos,
        )
        anchor_cfgs = [c.to_dict() for c in cfg.ANCHOR_GENERATOR_CONFIG]
        by_name = {c["class_name"]: c for c in anchor_cfgs}
        self._rots = {n: len(by_name[n]["anchor_rotations"])
                      * len(by_name[n]["anchor_sizes"])
                      * len(by_name[n]["anchor_bottom_heights"])
                      for n in self.class_names}
        anchors, acls, mthr, uthr, counts = generate_multiclass_anchors(
            anchor_cfgs, self.grid_size, self.point_cloud_range,
            list(self.class_names), groups,
        )
        self._anchors = jnp.asarray(anchors)
        self._anchor_cls = jnp.asarray(acls)
        self._matched = jnp.asarray(mthr)
        self._unmatched = jnp.asarray(uthr)
        self._head_counts = counts

        if self.use_shared_conv:
            self.shared_conv = nn.Conv(self.shared_ch, (3, 3), padding=1,
                                       use_bias=False)
            self.shared_bn = nn.BatchNorm(momentum=0.99, epsilon=1e-3)
        heads = []
        for group in groups:
            na = sum(self._rots[n] for n in group)
            heads.append(SingleGroupHead(
                num_class=len(group),
                num_anchors_per_loc=na,
                code_size=self.box_coder.code_size,
                num_middle_conv=int(cfg.get("NUM_MIDDLE_CONV", 0)),
                num_middle_filter=int(cfg.get("NUM_MIDDLE_FILTER", 64)),
                num_dir_bins=int(cfg.get("NUM_DIR_BINS", 2)),
                use_dir=bool(cfg.get("USE_DIRECTION_CLASSIFIER", True)),
            ))
        self.heads = heads

    def __call__(self, bev, gt_boxes=None, train: bool = False):
        from ..utils.config import Config

        cfg = Config(self.model_cfg)
        num_dir_bins = int(cfg.get("NUM_DIR_BINS", 2))
        x = bev
        if self.use_shared_conv:
            x = nn.relu(self.shared_bn(self.shared_conv(x),
                                       use_running_average=not train))
        num_class = len(self.class_names)
        cls_list, box_list, dir_list = [], [], []
        for head, group in zip(self.heads, self.head_groups):
            cls, box, dir_cls = head(x, train=train)
            b, fy, fx, _ = cls.shape
            ncls = len(group)
            rots = {self._rots[n] for n in group}
            assert len(rots) == 1, (
                "classes sharing a head must have equal anchors/loc "
                f"(got {rots} for {group})")

            def reorder(t, ch):
                # conv channels laid out [class][rot][ch] per location →
                # class-major flat anchors [class][y][x][rot]
                t = t.reshape(b, fy, fx, ncls, -1, ch)
                t = jnp.transpose(t, (0, 3, 1, 2, 4, 5))
                return t.reshape(b, -1, ch)

            cls = reorder(cls, ncls)
            box = reorder(box, self.box_coder.code_size)
            if dir_cls is not None:
                dir_cls = reorder(dir_cls, num_dir_bins)
            # scatter group-local classes into global class columns
            full = jnp.full(cls.shape[:2] + (num_class,), -1e9, cls.dtype)
            for j, name in enumerate(group):
                gid = self.class_names.index(name)
                full = full.at[..., gid].set(cls[..., j])
            cls_list.append(full)
            box_list.append(box)
            dir_list.append(dir_cls)

        cls_preds = jnp.concatenate(cls_list, axis=1)  # (B, A, num_class)
        box_preds = jnp.concatenate(box_list, axis=1)
        dir_preds = (jnp.concatenate(dir_list, axis=1)
                     if dir_list[0] is not None else None)
        out = {
            "cls_preds": cls_preds, "box_preds": box_preds,
            "dir_cls_preds": dir_preds, "anchors": self._anchors,
            "anchor_cls": self._anchor_cls,
            "box_coder_sincos": self.encode_angle_by_sincos,
        }
        if train:
            labels, reg_targets, reg_w, gt_heading = assign_multiclass_targets(
                self._anchors, self._anchor_cls, self._matched,
                self._unmatched, gt_boxes, self.box_coder,
            )
            out["box_cls_labels"] = labels
            out["box_reg_targets"] = reg_targets
            out["box_gt_heading"] = gt_heading
        return out


def multihead_loss(out, cfg, num_class: int):
    """Focal cls + sin-residual smooth-L1 + dir CE over the class-major
    flattened anchors (reference anchor_head_multi.py:245-345 collapsed to
    one pass — per-head slices share the same math)."""
    from .grid_detectors import grid_detector_loss

    return grid_detector_loss(out, cfg, num_class=num_class)
