"""PP-gated density clustering — a TPU-native DBSCAN equivalent.

Reference pipeline (clustering_utils.precompute_affinity_matrix:7-60 +
sklearn DBSCAN(metric='precomputed') in generate_mask.py:75-81):
  graph  = mutual-kNN(k) ∧ radius(r) neighbor graph over 3D points
  weight = |ΔPP| per edge
  DBSCAN(eps, min_samples) over that weighted graph:
    neighbor  = stored edge with weight ≤ eps
    core      = (#neighbors + self) ≥ min_samples
    clusters  = connected components over core-core edges;
                border points attach to a neighboring core's cluster.

TPU re-design: no sparse matrices. The kNN is a tiled distance computation
(MXU cross-term) + top_k; mutuality is the O(N·k) test
``d²(i,j) ≤ kth_nn_dist²(j)``; components run as min-label propagation with
pointer jumping (O(log N) sweeps), all static-shape under jit.

Cluster ids match sklearn's ordering (assigned by first core point in index
order) because components are labeled by their minimum core index.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

BIG = jnp.inf


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("k", "row_chunk"))
def _knn(xyz, valid, k: int, row_chunk: int = 1024):
    """k nearest neighbors (excluding self) among valid points.

    Returns (idx (N,k) int32, d2 (N,k) f32 with inf on invalid slots).
    """
    n = xyz.shape[0]
    sq = (xyz * xyz).sum(-1)

    def chunk_body(start):
        q = jax.lax.dynamic_slice(xyz, (start, 0), (row_chunk, 3))
        q_sq = jax.lax.dynamic_slice(sq, (start,), (row_chunk,))
        cross = jax.lax.dot_general(
            q, xyz, dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        d2 = q_sq[:, None] + sq[None, :] - 2.0 * cross
        d2 = jnp.maximum(d2, 0.0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (row_chunk, n), 1)
        rows = start + jax.lax.broadcasted_iota(jnp.int32, (row_chunk, n), 0)
        d2 = jnp.where((cols == rows) | ~valid[None, :], BIG, d2)
        if jax.default_backend() == "cpu" or k >= n:
            neg_top, top_idx = jax.lax.top_k(-d2, k)
        else:
            # TPU: exact top_k lowers to a full sort; the hardware approx
            # top-k at 0.98 recall only perturbs the outermost neighbors,
            # which the radius and |dPP| gates prune anyway
            neg_top, top_idx = jax.lax.approx_max_k(-d2, k, recall_target=0.98)
        return -neg_top, top_idx.astype(jnp.int32)

    starts = jnp.arange(n // row_chunk) * row_chunk
    d2k, idxk = jax.lax.map(chunk_body, starts)
    return idxk.reshape(n, k), d2k.reshape(n, k)


@functools.partial(jax.jit, static_argnames=("min_samples",))
def _cluster_from_knn(idx, d2, pp, valid, radius2, eps, min_samples: int):
    n = idx.shape[0]
    kth_d2 = jnp.where(valid, jnp.max(jnp.where(jnp.isfinite(d2), d2, -1.0), axis=1), -1.0)

    finite = jnp.isfinite(d2)
    mutual = finite & (d2 <= kth_d2[idx] + 0.0)  # i ∈ kNN(j) test
    within_r = finite & (d2 <= radius2)
    pp_ok = jnp.abs(pp[:, None] - pp[idx]) <= eps
    edge = mutual & within_r & pp_ok & valid[:, None] & valid[idx]

    degree = edge.sum(axis=1)
    core = valid & ((degree + 1) >= min_samples)

    # min-label propagation over core-core edges with pointer jumping
    core_edge = edge & core[:, None] & core[idx]
    init = jnp.where(core, jnp.arange(n, dtype=jnp.int32), jnp.int32(n))

    def step(labels):
        ext = jnp.concatenate([labels, jnp.int32(n)[None]])
        nbr = jnp.where(core_edge, ext[idx], jnp.int32(n))
        new = jnp.minimum(labels, nbr.min(axis=1))
        # pointer jumping: labels index other labels (roots self-reference)
        ext2 = jnp.concatenate([new, jnp.int32(n)[None]])
        new = jnp.where(core, jnp.minimum(new, ext2[new]), new)
        ext3 = jnp.concatenate([new, jnp.int32(n)[None]])
        new = jnp.where(core, jnp.minimum(new, ext3[new]), new)
        return new

    def cond(state):
        labels, prev_changed = state
        return prev_changed

    def body(state):
        labels, _ = state
        new = step(labels)
        return new, jnp.any(new != labels)

    labels, _ = jax.lax.while_loop(cond, body, (init, jnp.bool_(True)))

    # border points: non-core valid points adjacent to a core point
    ext = jnp.concatenate([labels, jnp.int32(n)[None]])
    border_nbr = jnp.where(edge & core[idx], ext[idx], jnp.int32(n))
    border_label = border_nbr.min(axis=1)
    out = jnp.where(core, labels, jnp.where(border_label < n, border_label, jnp.int32(-1)))
    out = jnp.where(valid, out, jnp.int32(-1))
    return out, core


def dbscan_pp(xyz: np.ndarray, pp: np.ndarray, *, n_neighbors: int = 70,
              radius: float = 2.0, eps: float = 0.1, min_samples: int = 10,
              row_chunk: int = 1024) -> np.ndarray:
    """Cluster labels (-1 noise, 0..K-1 clusters, sklearn-compatible ids).

    Host wrapper with padding to static shapes.
    """
    n = xyz.shape[0]
    if n == 0:
        return np.zeros(0, np.int64)
    # pad to power-of-two buckets: each distinct shape costs a full XLA
    # compile (minutes via the remote compile helper), so cap the bucket set
    n_pad = max(row_chunk, 1 << (n - 1).bit_length())
    x = np.zeros((n_pad, 3), np.float32)
    x[:n] = xyz[:, :3]
    # scatter padded rows far away so they never enter any neighborhood
    x[n:] = 1e6
    p = np.zeros(n_pad, np.float32)
    p[:n] = pp
    valid = np.zeros(n_pad, bool)
    valid[:n] = True

    k = min(n_neighbors, max(n - 1, 1))
    idx, d2 = _knn(jnp.asarray(x), jnp.asarray(valid), k, row_chunk=row_chunk)
    raw, _core = _cluster_from_knn(
        idx, d2, jnp.asarray(p), jnp.asarray(valid),
        np.float32(radius * radius), np.float32(eps), min_samples,
    )
    raw = np.asarray(raw[:n]).astype(np.int64)

    # compact ids in order of first (minimum) core index — sklearn ordering
    uniq = np.unique(raw[raw >= 0])
    out = np.where(raw >= 0, np.searchsorted(uniq, raw), -1)
    return out.astype(np.int64)
