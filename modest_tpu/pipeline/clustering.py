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


def _bucket(n: int, row_chunk: int) -> int:
    """Quarter-power-of-two size bucket (≥ n, multiple of row_chunk): each
    distinct shape costs a full XLA compile (minutes via the remote compile
    helper), so the bucket set stays bounded (4 per octave) while wasting
    ≤25% of the O(N·k) work."""
    p2 = 1 << max((n - 1).bit_length(), 3)
    b = next(b for q in (4, 5, 6, 7, 8) if (b := p2 // 8 * q) >= n)
    return max(row_chunk, _round_up(b, row_chunk))


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


@functools.partial(jax.jit, static_argnames=("k", "row_chunk", "w"))
def _knn_windowed(xyz_sorted, valid, k: int, row_chunk: int, w: int,
                  radius: float):
    """kNN over x-sorted points with a per-chunk candidate window.

    Each chunk of ``row_chunk`` consecutive (x-sorted) queries only scores
    the ``w`` candidates starting at searchsorted(x, chunk_min − radius) —
    w is chosen by the caller to cover [chunk_min − r, chunk_max + r].

    EXACT for the mutual-kNN ∧ radius(r) graph: an edge needs d ≤ r, and
    every point within r of a query is inside its window; for the mutuality
    test, if j's true k-th NN lies within r the window holds all k of them
    (identical k-th distance), and if it lies beyond r then both the
    windowed and true k-th distances exceed r², so any within-r pair passes
    the test either way.
    """
    n = xyz_sorted.shape[0]
    xs = xyz_sorted[:, 0]
    sq = (xyz_sorted * xyz_sorted).sum(-1)

    def chunk_body(start):
        q = jax.lax.dynamic_slice(xyz_sorted, (start, 0), (row_chunk, 3))
        q_sq = jax.lax.dynamic_slice(sq, (start,), (row_chunk,))
        qx0 = q[0, 0]
        lo = jnp.searchsorted(xs, qx0 - radius).astype(jnp.int32)
        lo = jnp.clip(lo, 0, n - w)
        cand = jax.lax.dynamic_slice(xyz_sorted, (lo, 0), (w, 3))
        c_sq = jax.lax.dynamic_slice(sq, (lo,), (w,))
        c_val = jax.lax.dynamic_slice(valid, (lo,), (w,))
        cross = jax.lax.dot_general(
            q, cand, dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        d2 = jnp.maximum(q_sq[:, None] + c_sq[None, :] - 2.0 * cross, 0.0)
        cols = lo + jax.lax.broadcasted_iota(jnp.int32, (row_chunk, w), 1)
        rows = start + jax.lax.broadcasted_iota(jnp.int32, (row_chunk, w), 0)
        d2 = jnp.where((cols == rows) | ~c_val[None, :], BIG, d2)
        if jax.default_backend() == "cpu" or k >= w:
            neg_top, top_idx = jax.lax.top_k(-d2, min(k, w))
        else:
            neg_top, top_idx = jax.lax.approx_max_k(-d2, k, recall_target=0.98)
        return -neg_top, (lo + top_idx).astype(jnp.int32)

    starts = jnp.arange(n // row_chunk) * row_chunk
    d2k, idxk = jax.lax.map(chunk_body, starts)
    return idxk.reshape(n, -1), d2k.reshape(n, -1)


@functools.partial(jax.jit, static_argnames=("min_samples",))
def _cluster_from_knn(idx, d2, pp, valid, radius2, eps, min_samples: int):
    # TPU cost model: the dominant op here is the (N, k) gather from the
    # N-element label/score tables (~35 ms per 4.6M-index gather on v5e
    # through XLA's gather). The layout below keeps it to TWO setup gathers
    # (kth_d2 and pp packed in one complex64 pull) + one per neighbor round
    # + one for borders; validity/core-ness of the *neighbor* ride along as
    # sentinels (-1 kth distance, label==n) instead of extra bool gathers.
    n = idx.shape[0]
    kth_d2 = jnp.where(valid, jnp.max(jnp.where(jnp.isfinite(d2), d2, -1.0), axis=1), -1.0)

    packed = jax.lax.complex(kth_d2, pp)[idx]  # one gather for two tables
    finite = jnp.isfinite(d2)
    mutual = finite & (d2 <= jnp.real(packed))  # i ∈ kNN(j); pad j ⇒ -1 ⇒ false
    within_r = finite & (d2 <= radius2)
    pp_ok = jnp.abs(pp[:, None] - jnp.imag(packed)) <= eps
    edge = mutual & within_r & pp_ok  # pad rows self-exclude: d2 > r² there

    degree = edge.sum(axis=1)
    core = valid & ((degree + 1) >= min_samples)

    # min-label propagation over core-core edges: non-core points carry the
    # sentinel label n (identity for min), so "neighbor is core" needs no
    # gather of `core`; pointer jumping runs to a fixpoint between neighbor
    # rounds (N-sized gathers are ~k× cheaper than the (N, k) one).
    init = jnp.where(core, jnp.arange(n, dtype=jnp.int32), jnp.int32(n))

    def compress(labels):
        def jcond(state):
            _, changed = state
            return changed

        def jbody(state):
            lab, _ = state
            ext = jnp.concatenate([lab, jnp.int32(n)[None]])
            new = jnp.minimum(lab, ext[lab])
            return new, jnp.any(new != lab)

        out, _ = jax.lax.while_loop(jcond, jbody, (labels, jnp.bool_(True)))
        return out

    def cond(state):
        labels, prev_changed = state
        return prev_changed

    def body(state):
        labels, _ = state
        ext = jnp.concatenate([labels, jnp.int32(n)[None]])
        nbr = jnp.where(edge, ext[idx], jnp.int32(n))  # non-core j ⇒ n
        new = jnp.where(core, jnp.minimum(labels, nbr.min(axis=1)), labels)
        new = compress(new)
        return new, jnp.any(new != labels)

    labels, _ = jax.lax.while_loop(cond, body, (init, jnp.bool_(True)))

    # border points: non-core valid points adjacent to a core point; a core
    # neighbor is exactly one whose converged label is < n
    ext = jnp.concatenate([labels, jnp.int32(n)[None]])
    border_nbr = jnp.where(edge, ext[idx], jnp.int32(n))
    border_label = border_nbr.min(axis=1)
    out = jnp.where(core, labels, jnp.where(border_label < n, border_label, jnp.int32(-1)))
    out = jnp.where(valid, out, jnp.int32(-1))
    return out, core


@functools.partial(jax.jit, static_argnames=("num_iterations",))
def _smooth_iterate(idx, d2, pp, valid, keep, num_iterations: int):
    w = jnp.where(keep, jnp.exp(-d2 / 2.0), 0.0)
    w = w / jnp.maximum(w.sum(axis=1, keepdims=True), 1e-30)

    def body(_, cur):
        return jnp.where(valid, (w * cur[idx]).sum(axis=1), cur)

    return jax.lax.fori_loop(0, num_iterations, body, pp)


def smooth_pp_score(ptc: np.ndarray, pp_score: np.ndarray, *,
                    neighbor_type: str = "knn", n_neighbors: int = 50,
                    radius: float = 1.0, num_iterations: int = 10,
                    row_chunk: int = 1024) -> np.ndarray:
    """Graph-smooth a PP score field (reference clustering_utils.smoothing:63-93,
    dormant there): Gaussian edge weights exp(-d²/2) over the kNN graph,
    row-normalized, iterated ``num_iterations`` times.

    ``radius`` mode deviates from the reference's unbounded
    radius_neighbors_graph: neighbors are the k nearest within the radius
    (k = n_neighbors cap) — the kernel weights beyond ~3σ are negligible, and
    a bounded neighbor set keeps the shape static for the device.
    """
    n = ptc.shape[0]
    if n == 0:
        return pp_score.copy()
    n_pad = _bucket(n, row_chunk)
    x = np.full((n_pad, 3), 1e6, np.float32)
    x[:n] = ptc[:, :3]
    x[n:, 0] += np.arange(n_pad - n, dtype=np.float32) * max(4.0, 2.1 * radius)
    p = np.zeros(n_pad, np.float32)
    p[:n] = pp_score
    valid = np.zeros(n_pad, bool)
    valid[:n] = True
    k = min(n_neighbors, max(n - 1, 1))
    idx, d2 = _knn(jnp.asarray(x), jnp.asarray(valid), k, row_chunk=row_chunk)
    keep = jnp.isfinite(d2)
    if neighbor_type == "radius":
        keep = keep & (d2 <= radius * radius)
    elif neighbor_type != "knn":
        raise NotImplementedError(neighbor_type)
    out = _smooth_iterate(idx, d2, jnp.asarray(p), jnp.asarray(valid), keep,
                          num_iterations)
    return np.asarray(out[:n]).astype(pp_score.dtype)


def dbscan_pp(xyz: np.ndarray, pp: np.ndarray, *, n_neighbors: int = 70,
              radius: float = 2.0, eps: float = 0.1, min_samples: int = 10,
              row_chunk: int = 1024) -> np.ndarray:
    """Cluster labels (-1 noise, 0..K-1 clusters, sklearn-compatible ids).

    Host wrapper with padding to static shapes.
    """
    n = xyz.shape[0]
    if n == 0:
        return np.zeros(0, np.int64)
    # x-sort so the kNN can score only a contiguous candidate window per
    # query chunk instead of all N points (exactness: see _knn_windowed)
    order = np.argsort(xyz[:, 0], kind="stable")
    xyz_s = xyz[order]
    pp_s = pp[order]
    n_pad = _bucket(n, row_chunk)
    x = np.zeros((n_pad, 3), np.float32)
    x[:n] = xyz_s[:, :3]
    # pad rows sit far away AND spread out (> radius apart): co-located pads
    # would otherwise count as one chunk's candidate window and blow `w` up
    # to the whole pad tail
    x[n:, 0] = 1e6 + np.arange(n_pad - n, dtype=np.float32) * max(4.0, 2.1 * radius)
    p = np.zeros(n_pad, np.float32)
    p[:n] = pp_s
    valid = np.zeros(n_pad, bool)
    valid[:n] = True

    k = min(n_neighbors, max(n - 1, 1))
    # window width: max candidates any chunk can see within ±radius in x,
    # rounded to a power of two (bounded bucket set)
    xs = x[:, 0]
    c_min = xs[0:n_pad:row_chunk]
    c_max = xs[row_chunk - 1 : n_pad : row_chunk]
    need = int(np.max(np.searchsorted(xs, c_max + radius, side="right")
                      - np.searchsorted(xs, c_min - radius, side="left")))
    w = max(1 << (max(need, k + 1, 512) - 1).bit_length(), row_chunk)
    if w >= n_pad:
        idx, d2 = _knn(jnp.asarray(x), jnp.asarray(valid), k, row_chunk=row_chunk)
    else:
        idx, d2 = _knn_windowed(jnp.asarray(x), jnp.asarray(valid), k,
                                row_chunk, w, float(radius))
    raw, _core = _cluster_from_knn(
        idx, d2, jnp.asarray(p), jnp.asarray(valid),
        np.float32(radius * radius), np.float32(eps), min_samples,
    )
    raw_sorted = np.asarray(raw[:n]).astype(np.int64)
    # raw labels are min-core indices in SORTED order; map back to original
    # positions, then re-rank by the minimum ORIGINAL index per component so
    # cluster ids keep sklearn's first-core ordering
    raw = np.full(n, -1, np.int64)
    raw[order] = raw_sorted

    # compact ids by first occurrence in ORIGINAL index order — sklearn
    # assigns cluster ids by the first core point it expands
    mask = raw >= 0
    out = np.full(n, -1, np.int64)
    if mask.any():
        vals, first_pos = np.unique(raw[mask], return_index=True)
        rank = np.empty(len(vals), np.int64)
        rank[np.argsort(first_pos, kind="stable")] = np.arange(len(vals))
        out[mask] = rank[np.searchsorted(vals, raw[mask])]
    return out
