"""CPU shims for the reference's CUDA extension modules.

Implements the exact semantics of the reference kernels in numpy so the
reference's COMPLETE torch models can run forward on this CPU-only host
for full-model golden-parity tests:

  * pointnet2_batch_cuda — ball_query_gpu.cu (strict d² < r², first
    `nsample` hits in index order, first hit replicated into unfilled
    slots, untouched rows stay 0), sampling_gpu.cu (FPS from index 0,
    first-max argmax; gather), interpolate_gpu.cu (3-NN insertion sort,
    ties keep the earlier index; inverse-distance interpolate),
    group_points_gpu.cu (fancy gather).
  * roipoint_pool3d_cuda — roipoint_pool3d_kernel.cu (strict z half-extent,
    xy within half-extent + 1e-5 margin after -heading rotation; first
    `num_sampled` in index order, cyclic duplication, empty flag).
  * iou3d_nms_cuda.nms_gpu — iou3d_nms_kernel.cu greedy NMS on pre-sorted
    boxes at STRICT rotated-BEV IoU > thresh (IoU via our native
    double-precision Sutherland–Hodgman, utils/native.py — itself
    parity-tested against the reference's overlap in tests/test_iou3d.py).

Install BEFORE importing pcdet (idempotent; upgrades the bare ModuleType
stubs test_torch_convert.py may already have registered). These are test
helpers only — the production framework never routes through them.
"""
from __future__ import annotations

import sys
import types

import numpy as np


def _np(t):
    return t.detach().numpy()


# ---------------------------------------------------------------------------
# pointnet2_batch_cuda
# ---------------------------------------------------------------------------

def ball_query_wrapper(B, N, M, radius, nsample, new_xyz, xyz, idx):
    r2 = np.float32(radius) * np.float32(radius)
    nx, x, out = _np(new_xyz), _np(xyz), _np(idx)
    for b in range(B):
        d2 = ((nx[b][:, None, :] - x[b][None, :, :]) ** 2).sum(-1)  # (M, N) f32
        mask = d2 < r2
        cnt = mask.sum(1)
        # indices of the first `nsample` True entries, in index order
        first = np.argsort(~mask, kind="stable", axis=1)[:, :nsample]
        slot = np.arange(nsample)[None, :]
        filled = np.where(slot < np.minimum(cnt, nsample)[:, None],
                          first, first[:, :1])
        out[b] = np.where(cnt[:, None] > 0, filled, 0)  # cnt==0 rows stay 0
    return 1


def furthest_point_sampling_wrapper(B, N, npoint, xyz, temp, output):
    x, tmp, out = _np(xyz), _np(temp), _np(output)
    for b in range(B):
        old = 0
        out[b, 0] = 0
        for j in range(1, npoint):
            d = ((x[b] - x[b, old]) ** 2).sum(-1).astype(np.float32)
            np.minimum(tmp[b], d, out=tmp[b])
            old = int(np.argmax(tmp[b]))
            out[b, j] = old
    return 1


def gather_points_wrapper(B, C, N, npoint, features, idx, output):
    f, i, out = _np(features), _np(idx), _np(output)
    for b in range(B):
        out[b] = f[b][:, i[b]]
    return 1


def group_points_wrapper(B, C, N, nfeatures, nsample, features, idx, output):
    f, i, out = _np(features), _np(idx), _np(output)
    for b in range(B):
        out[b] = f[b][:, i[b]]                      # (C, npoint, nsample)
    return 1


def three_nn_wrapper(B, N, M, unknown, known, dist2, idx):
    u, k, d_out, i_out = _np(unknown), _np(known), _np(dist2), _np(idx)
    for b in range(B):
        d2 = ((u[b][:, None, :] - k[b][None, :, :]) ** 2).sum(-1)  # (N, M) f32
        order = np.argsort(d2, axis=1, kind="stable")[:, :3]
        i_out[b] = order
        d_out[b] = np.take_along_axis(d2, order, axis=1)
    return 1


def three_interpolate_wrapper(B, C, M, N, features, idx, weight, output):
    f, i, w, out = _np(features), _np(idx), _np(weight), _np(output)
    for b in range(B):
        out[b] = np.einsum("cnj,nj->cn", f[b][:, i[b]], w[b])
    return 1


# ---------------------------------------------------------------------------
# roipoint_pool3d_cuda
# ---------------------------------------------------------------------------

def _pts_in_box3d(pts, box):
    """roipoint_pool3d_kernel.cu:check_pt_in_box3d on (N, 3) f32."""
    cx, cy, cz, dx, dy, dz, rz = (np.float32(v) for v in box[:7])
    zin = np.abs(pts[:, 2] - cz) <= dz / 2.0
    sx, sy = pts[:, 0] - cx, pts[:, 1] - cy
    c, s = np.cos(rz), np.sin(rz)
    lx = sx * c + sy * s
    ly = -sx * s + sy * c
    m = np.float32(1e-5)
    return zin & (np.abs(lx) < dx / 2.0 + m) & (np.abs(ly) < dy / 2.0 + m)


def roipoint_pool3d_forward(points, pooled_boxes3d, point_features,
                            pooled_features, pooled_empty_flag):
    p, bx = _np(points), _np(pooled_boxes3d)
    pf, out, flag = _np(point_features), _np(pooled_features), _np(pooled_empty_flag)
    B, M, S = out.shape[0], out.shape[1], out.shape[2]
    for b in range(B):
        for m in range(M):
            hits = np.flatnonzero(_pts_in_box3d(p[b], bx[b, m]))[:S]
            if len(hits) == 0:
                flag[b, m] = 1
                continue
            sel = hits[np.arange(S) % len(hits)]
            out[b, m] = np.concatenate([p[b][sel], pf[b][sel]], axis=1)
    return 1


# ---------------------------------------------------------------------------
# iou3d_nms_cuda
# ---------------------------------------------------------------------------

def nms_gpu(boxes, keep, thresh):
    """Greedy NMS on pre-sorted boxes; strict rotated-BEV IoU > thresh."""
    sys.path.insert(0, "/root/repo")
    from modest_tpu.utils import native

    b = _np(boxes)[:, :7].astype(np.float32)
    n = len(b)
    if n == 0:
        return 0
    iou = native.bev_iou(b, b)
    alive = np.ones(n, bool)
    kept = []
    for i in range(n):
        if not alive[i]:
            continue
        kept.append(i)
        alive &= ~(iou[i] > thresh)
        alive[i] = False
    k = keep.numpy()
    k[: len(kept)] = kept
    return len(kept)


# ---------------------------------------------------------------------------
# installation
# ---------------------------------------------------------------------------

def install():
    """Register the shim modules (upgrading any bare stubs) and patch the
    torch.cuda tensor constructors / .cuda() no-ops the wrappers rely on."""
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    if not isinstance(torch.cuda.FloatTensor, types.FunctionType):
        torch.cuda.FloatTensor = lambda *s: torch.empty(*s, dtype=torch.float32)
        torch.cuda.IntTensor = lambda *s: torch.empty(*s, dtype=torch.int32)
        torch.cuda.LongTensor = lambda *s: torch.empty(*s, dtype=torch.int64)

    def module(name, **attrs):
        mod = sys.modules.get(name) or types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod
        return mod

    module(
        "pcdet.ops.pointnet2.pointnet2_batch.pointnet2_batch_cuda",
        ball_query_wrapper=ball_query_wrapper,
        furthest_point_sampling_wrapper=furthest_point_sampling_wrapper,
        gather_points_wrapper=gather_points_wrapper,
        group_points_wrapper=group_points_wrapper,
        three_nn_wrapper=three_nn_wrapper,
        three_interpolate_wrapper=three_interpolate_wrapper,
    )
    module("pcdet.ops.roipoint_pool3d.roipoint_pool3d_cuda",
           forward=roipoint_pool3d_forward)
    module("pcdet.ops.iou3d_nms.iou3d_nms_cuda", nms_gpu=nms_gpu)
