"""PointNet++ MSG backbone (flax) — reference pcdet/models/backbones_3d/
pointnet2_backbone.py + ops/pointnet2/pointnet2_batch/pointnet2_modules.py.

Channel-last layout: points (B, N, 3+C). The per-scale "1x1 conv" MLPs are
Dense layers over the last axis — one large MXU matmul per layer.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops import pointnet2 as p2
from .layers import SharedMLP


class SAModuleMSG(nn.Module):
    """Multi-scale-grouping set abstraction level."""

    npoint: int
    radii: tuple
    nsamples: tuple
    mlps: tuple  # tuple of channel tuples, one per scale

    @nn.compact
    def __call__(self, xyz, features, train: bool = False):
        """xyz (B, N, 3); features (B, N, C) or None →
        (new_xyz (B, npoint, 3), new_features (B, npoint, sum(mlp[-1])))."""
        fps_idx = p2.furthest_point_sample(xyz, self.npoint)
        new_xyz = p2.gather_points(xyz, fps_idx)
        if p2.exact_ops():
            d2 = p2.pairwise_dist2(new_xyz, xyz)  # shared across scales
        else:
            # one nearest-k shared by every scale (each radius slices its
            # prefix); the level's max radius bounds the candidate windows
            top_d2, top_idx = p2.nearest_neighbors(
                new_xyz, xyz, max(self.nsamples), radius=max(self.radii))

        outs = []
        for radius, nsample, mlp in zip(self.radii, self.nsamples, self.mlps):
            if p2.exact_ops():
                # reference CUDA semantics: first nsample in-radius by index
                grouped = p2.query_and_group(xyz, new_xyz, features, d2,
                                             radius, nsample)
            else:
                grouped = p2.nearest_group(xyz, new_xyz, features, top_d2,
                                           top_idx, radius, nsample)
            feat = SharedMLP(tuple(mlp))(grouped, train=train)  # (B, np, ns, C)
            outs.append(feat.max(axis=2))
        return new_xyz, jnp.concatenate(outs, axis=-1)


class SAModule(nn.Module):
    """Single-scale SA; npoint=None → GroupAll (reference PointnetSAModule)."""

    npoint: Any  # int or None
    radius: float
    nsample: int
    mlp: tuple

    @nn.compact
    def __call__(self, xyz, features, train: bool = False):
        if self.npoint is None:
            grouped = p2.group_all(xyz, features)  # (B, 1, N, 3+C)
            new_xyz = jnp.zeros((xyz.shape[0], 1, 3), xyz.dtype)
        else:
            fps_idx = p2.furthest_point_sample(xyz, self.npoint)
            new_xyz = p2.gather_points(xyz, fps_idx)
            if p2.exact_ops():
                d2 = p2.pairwise_dist2(new_xyz, xyz)
                grouped = p2.query_and_group(xyz, new_xyz, features, d2,
                                             self.radius, self.nsample)
            else:
                top_d2, top_idx = p2.nearest_neighbors(
                    new_xyz, xyz, self.nsample, radius=self.radius)
                grouped = p2.nearest_group(xyz, new_xyz, features, top_d2,
                                           top_idx, self.radius, self.nsample)
        feat = SharedMLP(tuple(self.mlp))(grouped, train=train)
        return new_xyz, feat.max(axis=2)


class FPModule(nn.Module):
    """Feature propagation (upsampling) level."""

    mlp: tuple

    @nn.compact
    def __call__(self, unknown, known, unknown_feats, known_feats, train: bool = False):
        interp = p2.interpolate_features(unknown, known, known_feats)
        if unknown_feats is not None:
            interp = jnp.concatenate([interp, unknown_feats], axis=-1)
        return SharedMLP(tuple(self.mlp))(interp, train=train)


class PointNet2MSG(nn.Module):
    """4-level SA + 4-level FP encoder-decoder over raw points.

    cfg fields mirror the reference YAML: SA_CONFIG.{NPOINTS,RADIUS,NSAMPLE,
    MLPS} and FP_MLPS (tools/cfgs/lyft_models/pointrcnn_dynamic_obj.yaml).
    """

    sa_npoints: tuple
    sa_radii: tuple
    sa_nsamples: tuple
    sa_mlps: tuple
    fp_mlps: tuple

    @nn.compact
    def __call__(self, points, train: bool = False):
        """points (B, N, 3+C) → per-point features (B, N, fp_mlps[0][-1])."""
        xyz = points[..., :3]
        features = points[..., 3:] if points.shape[-1] > 3 else None

        l_xyz, l_feats = [xyz], [features]
        for i in range(len(self.sa_npoints)):
            nx, nf = SAModuleMSG(
                npoint=self.sa_npoints[i],
                radii=tuple(self.sa_radii[i]),
                nsamples=tuple(self.sa_nsamples[i]),
                mlps=tuple(tuple(m) for m in self.sa_mlps[i]),
            )(l_xyz[i], l_feats[i], train=train)
            l_xyz.append(nx)
            l_feats.append(nf)

        for i in range(len(self.fp_mlps) - 1, -1, -1):
            l_feats[i] = FPModule(mlp=tuple(self.fp_mlps[i]))(
                l_xyz[i], l_xyz[i + 1], l_feats[i], l_feats[i + 1], train=train
            )
        return l_feats[0]
