"""Stack-variant PointNet++ ops (ragged batches) — TPU-native design.

The reference's ``pointnet2_stack`` CUDA ops (pcdet/ops/pointnet2/
pointnet2_stack/{pointnet2_utils.py,src/*.cu}, SURVEY O2) process ragged
batches as flat (sum_i N_i, C) tensors plus per-batch counts, because CUDA
kernels index freely. XLA needs static shapes, so the TPU-native layout is
**padded + masked**: (B, N_max, C) with a per-batch ``cnt``. All ops here
take that layout; :func:`stack_to_padded` / :func:`padded_to_stack` convert
at the host boundary for callers holding the reference's flat layout.

Op inventory mirrored (reference file:line):
  ball_query            pointnet2_stack/pointnet2_utils.py:*  ``ball_query_stack``
  grouping / QueryAndGroup                                   ``query_and_group_stack``
  farthest_point_sample (per-batch counts)                   ``farthest_point_sample_stack``
  three_nn / three_interpolate                               ``three_nn_stack`` (+ batch three_interpolate)
  voxel_query           pointnet2_stack/src/voxel_query_gpu.cu ``voxel_query``
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .pointnet2 import (
    _fast_top_k,
    _furthest_point_sample_xla,
    ball_query_from_dist2,
    gather_points,
    pairwise_dist2,
    three_nn,
)

BIG = 1e9


# ---------------------------------------------------------------------------
# layout conversion (host boundary)
# ---------------------------------------------------------------------------


def stack_to_padded(flat: np.ndarray, cnt: np.ndarray, n_max: int | None = None):
    """Flat stacked (sum N_i, C) + counts → padded (B, N_max, C), cnt."""
    cnt = np.asarray(cnt, np.int32)
    n_max = int(cnt.max()) if n_max is None else n_max
    out = np.zeros((len(cnt), n_max) + flat.shape[1:], flat.dtype)
    off = 0
    for i, c in enumerate(cnt):
        out[i, :c] = flat[off : off + c]
        off += c
    return out, cnt


def padded_to_stack(padded: np.ndarray, cnt: np.ndarray):
    """Padded (B, N_max, C) + counts → flat stacked (sum N_i, C)."""
    return np.concatenate([padded[i, :c] for i, c in enumerate(cnt)], axis=0)


def mask_from_counts(cnt, n: int):
    """(B,) counts → (B, n) bool validity mask."""
    return jnp.arange(n, dtype=jnp.int32)[None, :] < cnt[:, None]


# ---------------------------------------------------------------------------
# masked core ops
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("npoint",))
def farthest_point_sample_stack(xyz, cnt, npoint: int):
    """Masked FPS: (B, N, 3) + (B,) counts → (B, npoint) indices < cnt.

    Padding rows can never be selected (their running min-distance is
    pinned to -1). Matches the reference's stack_farthest_point_sample
    semantics: each batch samples from its own first cnt[b] points.
    """
    b, n, _ = xyz.shape
    mask = mask_from_counts(cnt, n)

    def single(pts, m):
        def body(i, state):
            dists, idxs, last = state
            d = ((pts - pts[last]) ** 2).sum(-1)
            dists = jnp.minimum(dists, jnp.where(m, d, -1.0))
            nxt = jnp.argmax(dists).astype(jnp.int32)
            idxs = idxs.at[i].set(nxt)
            return dists, idxs, nxt

        dists0 = jnp.where(m, 1e10, -1.0)
        idxs0 = jnp.zeros((npoint,), jnp.int32)
        _, idxs, _ = jax.lax.fori_loop(1, npoint, body, (dists0, idxs0, jnp.int32(0)))
        return idxs

    return jax.vmap(single)(xyz, mask)


def masked_pairwise_dist2(a, a_cnt, b, b_cnt):
    """(B, M, 3) vs (B, N, 3) with padding pushed to BIG distance."""
    d2 = pairwise_dist2(a, b)
    am = mask_from_counts(a_cnt, a.shape[1])
    bm = mask_from_counts(b_cnt, b.shape[1])
    return jnp.where(am[:, :, None] & bm[:, None, :], d2, BIG)


def ball_query_stack(xyz, xyz_cnt, new_xyz, new_cnt, radius: float, nsample: int):
    """Stack ball query on padded layout.

    Returns (idx (B, M, nsample) int32, empty (B, M) bool) — ``empty`` marks
    centers with no in-radius neighbor (reference returns empty_ball_mask).
    """
    d2 = masked_pairwise_dist2(new_xyz, new_cnt, xyz, xyz_cnt)
    idx, valid = ball_query_from_dist2(d2, radius, nsample)
    return idx, ~valid[..., 0]


def query_and_group_stack(xyz, xyz_cnt, features, new_xyz, new_cnt,
                          radius: float, nsample: int, use_xyz: bool = True):
    """Stack QueryAndGroup: group features around centers, empty balls zeroed
    (reference zeroes new_features[empty_ball_mask])."""
    idx, empty = ball_query_stack(xyz, xyz_cnt, new_xyz, new_cnt, radius, nsample)
    b, m, ns = idx.shape
    flat = idx.reshape(b, m * ns)
    grouped_xyz = gather_points(xyz, flat).reshape(b, m, ns, 3) - new_xyz[:, :, None, :]
    if features is not None:
        grouped_feat = gather_points(features, flat).reshape(b, m, ns, -1)
        out = (jnp.concatenate([grouped_xyz, grouped_feat], -1)
               if use_xyz else grouped_feat)
    else:
        out = grouped_xyz
    return jnp.where(empty[:, :, None, None], 0.0, out), empty


def three_nn_stack(unknown, unknown_cnt, known, known_cnt):
    """Masked 3-NN: padding in ``known`` is pushed to BIG coords so it never
    wins; rows past unknown_cnt return valid-but-meaningless neighbors the
    caller's own mask discards."""
    km = mask_from_counts(known_cnt, known.shape[1])
    known_m = jnp.where(km[..., None], known, BIG)
    return three_nn(unknown, known_m)


# ---------------------------------------------------------------------------
# voxel query (PV-RCNN VSA fast neighbor lookup)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("nsample", "max_range", "nx", "ny", "nz"))
def voxel_query(new_xyz, new_cnt, voxel_keys, voxel_valid, voxel_centers,
                radius: float, nsample: int, max_range: int,
                nx: int, ny: int, nz: int,
                point_cloud_range=None, voxel_size=None):
    """Find up to ``nsample`` active voxels within ``radius`` of each query.

    Reference: pointnet2_stack/src/voxel_query_gpu.cu — walks the dense
    (2R+1)^3 neighborhood of the query's voxel in a hash table. TPU version:
    ``voxel_keys`` are the **sorted** linear coords from voxelize_sparse
    (key = (z*ny + y)*nx + x, padding = int32.max); each static neighbor
    offset becomes one vectorized searchsorted lookup — no hash, no gather
    of dynamic extent.

    new_xyz (B, M, 3); voxel_keys/valid (B, V); voxel_centers (B, V, 3).
    Returns (idx (B, M, nsample) into V, empty (B, M)).
    """
    b, m, _ = new_xyz.shape
    v = voxel_keys.shape[1]
    pcr = jnp.asarray(point_cloud_range, jnp.float32)
    vs = jnp.asarray(voxel_size, jnp.float32)

    gx = jnp.floor((new_xyz[..., 0] - pcr[0]) / vs[0]).astype(jnp.int32)
    gy = jnp.floor((new_xyz[..., 1] - pcr[1]) / vs[1]).astype(jnp.int32)
    gz = jnp.floor((new_xyz[..., 2] - pcr[2]) / vs[2]).astype(jnp.int32)

    r = max_range
    offs = [(dz, dy, dx) for dz in range(-r, r + 1)
            for dy in range(-r, r + 1) for dx in range(-r, r + 1)]
    offs = jnp.asarray(offs, jnp.int32)  # (K, 3)
    k = offs.shape[0]

    cz = gz[..., None] + offs[None, None, :, 0]
    cy = gy[..., None] + offs[None, None, :, 1]
    cx = gx[..., None] + offs[None, None, :, 2]
    inb = ((cx >= 0) & (cx < nx) & (cy >= 0) & (cy < ny)
           & (cz >= 0) & (cz < nz))
    cand_key = (cz * ny + cy) * nx + cx  # (B, M, K)

    def lookup(keys, ck):
        pos = jnp.searchsorted(keys, ck.reshape(-1)).reshape(ck.shape)
        pos = jnp.clip(pos, 0, v - 1)
        hit = jnp.take(keys, pos) == ck
        return pos, hit

    pos, hit = jax.vmap(lookup)(voxel_keys, cand_key)
    # padding keys sit at int32.max after the sort, so a candidate key can
    # only ever match an active voxel; voxel_valid needs no separate check
    del voxel_valid
    hit = hit & inb

    centers = jnp.take_along_axis(
        jnp.broadcast_to(voxel_centers[:, None], (b, m, v, 3)),
        pos[..., None], axis=2,
    )
    d2 = ((centers - new_xyz[:, :, None, :]) ** 2).sum(-1)
    hit = hit & (d2 < radius * radius)

    col = jax.lax.broadcasted_iota(jnp.int32, (b, m, k), 2)
    score = jnp.where(hit, -col.astype(jnp.float32), -jnp.inf)
    top_scores, top_off = _fast_top_k(score, nsample)
    valid = jnp.isfinite(top_scores)
    sel = jnp.take_along_axis(pos, top_off, axis=2)
    first = sel[..., 0:1]
    any_hit = valid[..., 0:1]
    idx = jnp.where(any_hit, jnp.where(valid, sel, first), 0).astype(jnp.int32)
    qm = mask_from_counts(new_cnt, m)
    return idx, (~any_hit[..., 0]) | (~qm)


def ball_query_masked(xyz, xyz_mask, new_xyz, radius: float, nsample: int):
    """Mask-based ball query (active sets that are not front-packed, e.g.
    sparse-conv voxel lists). Returns (idx, empty)."""
    d2 = pairwise_dist2(new_xyz, xyz)
    d2 = jnp.where(xyz_mask[:, None, :], d2, BIG)
    idx, valid = ball_query_from_dist2(d2, radius, nsample)
    return idx, ~valid[..., 0]


def query_and_group_masked(xyz, xyz_mask, features, new_xyz, radius: float,
                           nsample: int, use_xyz: bool = True):
    """Mask-based QueryAndGroup; empty balls zeroed."""
    idx, empty = ball_query_masked(xyz, xyz_mask, new_xyz, radius, nsample)
    b, m, ns = idx.shape
    flat = idx.reshape(b, m * ns)
    grouped_xyz = gather_points(xyz, flat).reshape(b, m, ns, 3) - new_xyz[:, :, None, :]
    if features is not None:
        grouped_feat = gather_points(features, flat).reshape(b, m, ns, -1)
        out = (jnp.concatenate([grouped_xyz, grouped_feat], -1)
               if use_xyz else grouped_feat)
    else:
        out = grouped_xyz
    return jnp.where(empty[:, :, None, None], 0.0, out), empty
