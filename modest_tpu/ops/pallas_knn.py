"""Fused windowed k-nearest-neighbors as a Pallas TPU kernel.

The backbone's SA grouping and FP interpolation both reduce to "k nearest
of M queries among N candidates" (reference CUDA: ball_query_gpu.cu +
interpolate_gpu.cu scan all N per query). The dense XLA path pays for the
(B, M, N) d² generation: the cross-term matmul has K=3, so the 128×128 MXU
runs at 3/128 utilization, and f32 coordinates need HIGHEST (multi-pass) —
measured 6-9 ms per SA level in every XLA formulation (BENCH.md round 3).

This kernel exploits that lidar neighbors are local: candidates x-sorted,
each chunk of QC x-sorted queries scans one W-wide window of the sorted
order. Inside the kernel:

  * d² is built DIFF-FORM on the VPU — (qx−cx)² + … — so f32 exactness is
    free (no a²+b²−2ab cancellation; the round-3 bf16-coordinate regression
    class cannot occur) and no MXU pass is wasted on a K=3 contraction.
  * selection packs each d² into ONE int32 — the f32 bit pattern of a
    non-negative float is order-preserving, so (d2_bits & ~(W-1)) | lane
    ranks by distance with the window-local index riding in the low bits —
    and extracts the k winners with k iterations of {lane-min, mask} over
    the VMEM-resident (QC, W) buffer: 2 VPU sweeps per neighbor instead of
    a full sort or a 4-sweep argmin dance.
  * winner d² is recomputed exactly elementwise by the caller (three_nn
    precedent, ops/pointnet2.py) — the packed value's low bits perturbed it
    by ≤ 2^-12 relative.

Exactness: the window is an exact superset of the true k-NN whenever the
coverage certificate holds — for radius-bounded queries (SA grouping) the
window covers [min_q x − r, max_q x + r]; for unbounded queries (three_nn)
the post-hoc test (x_q − window_edge)² ≥ d²_k certifies no closer point
exists outside. When any chunk's certificate fails (ultra-dense near-field
exceeding W), the caller falls back to the dense path via lax.cond — the
kernel is never silently truncated (the round-3 windowed-XLA mistake).

Frames stack along the sorted-entry axis (the pallas_dbscan batching
discipline): windows are clamped inside each frame by the XLA-side start
computation, so one kernel serves the whole batch.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QC = 32          # queries per grid step (chunk)
_IREMOVED = np.int32(0x7F7FFFFF)  # > any packed finite d² (f32max bits)


def _knn_kernel(lo_ref, qx_ref, qy_ref, qz_ref, x_ref, y_ref, z_ref,
                out_ref, buf_ref, *, w, k):
    """One chunk: QC queries vs the W candidates at window rows lo.

    lo_ref (nchunk,) i32 scalar-prefetch: window start in 128-entry rows.
    qx/qy/qz_ref (QC, 1) f32 query coords (sublane-major, lane-broadcast);
    x/y/z_ref (BN/128, 128) planar sorted candidate coords.
    out_ref (QC, k) i32: packed (d2_bits & ~(w-1)) | window_local_idx,
    ascending by distance. buf_ref (QC, W) i32 scratch.

    Rank-2 ops only (Mosaic's layout inference rejects the rank-3
    reshape/broadcast forms); the W/128 build loop is a static unroll
    (≤ 16 tiny iterations) so every lane-dim slice offset is static.
    """
    c = pl.program_id(0)
    lo = lo_ref[c]
    w128 = w // 128

    qx = qx_ref[:]  # (QC, 1) — lane-broadcasts against candidate rows
    qy = qy_ref[:]
    qz = qz_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (QC, 128), 1)
    for g in range(w128):  # static unroll: lane-slice writes need static offsets
        wx = x_ref[pl.ds(lo + g, 1), :]  # (1, 128)
        wy = y_ref[pl.ds(lo + g, 1), :]
        wz = z_ref[pl.ds(lo + g, 1), :]
        d2 = (qx - wx) ** 2 + (qy - wy) ** 2 + (qz - wz) ** 2  # (QC, 128)
        p = jax.lax.bitcast_convert_type(d2, jnp.int32)
        p = jnp.bitwise_or(jnp.bitwise_and(p, ~jnp.int32(w - 1)),
                           lane + g * 128)
        buf_ref[:, g * 128:(g + 1) * 128] = p

    kiota = jax.lax.broadcasted_iota(jnp.int32, (QC, k), 1)

    def body(j, out):
        p = buf_ref[:]
        m = jnp.min(p, axis=1, keepdims=True)           # (QC, 1)
        out = jnp.where(kiota == j, m, out)
        buf_ref[:] = jnp.where(p == m, _IREMOVED, p)    # remove winner
        return out

    out_ref[:] = jax.lax.fori_loop(
        0, k, body, jnp.zeros((QC, k), jnp.int32))


@functools.partial(jax.jit, static_argnames=("w", "k", "interpret"))
def _knn_windows(qx, qy, qz, xs, ys, zs, lo, *, w, k, interpret=False):
    """(B·M, 1) sorted query coords + planar sorted coords (B·N/128, 128) +
    per-chunk start rows (B·M/QC,) → packed winners (B·M, k) i32."""
    bm = qx.shape[0]
    nchunk = bm // QC
    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nchunk,),
        in_specs=[
            pl.BlockSpec((QC, 1), lambda c, lo: (c, 0)),
            pl.BlockSpec((QC, 1), lambda c, lo: (c, 0)),
            pl.BlockSpec((QC, 1), lambda c, lo: (c, 0)),
            pl.BlockSpec(xs.shape, lambda c, lo: (0, 0)),
            pl.BlockSpec(ys.shape, lambda c, lo: (0, 0)),
            pl.BlockSpec(zs.shape, lambda c, lo: (0, 0)),
        ],
        out_specs=pl.BlockSpec((QC, k), lambda c, lo: (c, 0)),
        scratch_shapes=[pltpu.VMEM((QC, w), jnp.int32)],
    )
    return pl.pallas_call(
        functools.partial(_knn_kernel, w=w, k=k),
        grid_spec=grid,
        out_shape=jax.ShapeDtypeStruct((bm, k), jnp.int32),
        interpret=interpret,
    )(lo, qx, qy, qz, xs, ys, zs)


def _pick_window(n: int) -> int:
    """Static window width per candidate-set size: ≥8× the average
    32-query x-span at uniform density, so the coverage certificate holds
    except in pathological near-field pile-ups (which fall back dense)."""
    if n >= 8192:
        return 2048
    if n >= 2048:
        return 1024
    return 512


def knn_supported(m: int, n: int, k: int) -> bool:
    w = _pick_window(n)
    return m % QC == 0 and n % 128 == 0 and n >= 2 * w and 0 < k <= w // 4


@functools.partial(jax.jit, static_argnames=("k", "w", "radius"))
def _prep_and_run(new_xyz, xyz, k: int, w: int, radius):
    """Sort, window, run the kernel, map indices back, recompute exact d².

    Returns (td2 (B,M,k) ascending f32 exact, idx (B,M,k) i32 original
    candidate order, cover_ok () bool — the radius-window certificate;
    NaN-free only when cover_ok (callers lax.cond to dense otherwise)).
    radius=None (three_nn mode): cover_ok is the post-hoc kth-distance
    certificate instead.
    """
    b, n = xyz.shape[0], xyz.shape[1]
    m = new_xyz.shape[1]
    nchunk_pf = m // QC

    perm = jnp.argsort(xyz[..., 0], axis=-1).astype(jnp.int32)    # (B, N)
    sxyz = jnp.take_along_axis(xyz, perm[..., None], axis=1)
    sx = sxyz[..., 0]

    cperm = jnp.argsort(new_xyz[..., 0], axis=-1).astype(jnp.int32)
    scq = jnp.take_along_axis(new_xyz, cperm[..., None], axis=1)   # (B, M, 3)

    # per-chunk needed span (sorted-rank units), frame-local
    qlo = scq[..., 0].reshape(b, nchunk_pf, QC)[:, :, 0]
    qhi = scq[..., 0].reshape(b, nchunk_pf, QC)[:, :, -1]
    r = np.float32(0.0 if radius is None else radius)
    lo_t = jax.vmap(jnp.searchsorted)(sx, qlo - r)                 # (B, nc)
    hi_t = jax.vmap(lambda a, v: jnp.searchsorted(a, v, side="right"))(
        sx, qhi + r)
    # center the W window on the needed span, 128-row aligned, in-frame
    start = jnp.clip((lo_t + hi_t - w) // 2, 0, n - w)
    start = (start // 128).astype(jnp.int32)                       # row units

    if radius is not None:
        # coverage certificate: window ⊇ [qlo − r, qhi + r] per chunk
        e_lo = jnp.take_along_axis(sx, start * 128, axis=1)
        e_hi = jnp.take_along_axis(sx, start * 128 + (w - 1), axis=1)
        ok_lo = (start == 0) | (e_lo <= qlo - r)
        ok_hi = (start * 128 + w >= n) | (e_hi >= qhi + r)
        cover_ok = jnp.all(ok_lo & ok_hi)

    # flatten batch along the entry axis (frame f’s rows offset by f·N/128)
    row_off = (jnp.arange(b, dtype=jnp.int32) * (n // 128))[:, None]
    lo_flat = (start + row_off).reshape(b * nchunk_pf)
    planar = sxyz.reshape(b * (n // 128), 128, 3)
    xs, ys, zs = planar[..., 0], planar[..., 1], planar[..., 2]
    q_flat = scq.reshape(b * m, 3)

    packed = _knn_windows(q_flat[:, 0:1], q_flat[:, 1:2], q_flat[:, 2:3],
                          xs, ys, zs, lo_flat, w=w, k=k,
                          interpret=jax.default_backend() == "cpu")
    packed = packed.reshape(b, m, k)

    # window-local → frame-sorted → original candidate index
    local = jnp.bitwise_and(packed, w - 1)
    srt = local + start.repeat(QC, axis=1)[..., None] * 128        # (B, M, k)
    idx = jnp.take_along_axis(perm, srt.reshape(b, m * k), axis=1)
    idx = idx.reshape(b, m, k)

    # exact winner distances (the packed value's low bits held the index),
    # then re-sort the k winners by the EXACT values: the packed ranking
    # quantizes d² to ~2^-12 relative (low bits carry the index), which can
    # swap near-ties — membership at a quantum boundary is arbitrary-tie
    # territory (far finer than approx_max_k's 0.95 recall), but the
    # RETURNED order must be truly ascending for prefix-slicing consumers
    nbr = jnp.take_along_axis(
        sxyz, srt.reshape(b, m * k)[..., None], axis=1).reshape(b, m, k, 3)
    td2 = ((nbr - scq[:, :, None, :]) ** 2).sum(-1)
    order = jnp.argsort(td2, axis=-1).astype(jnp.int32)
    td2 = jnp.take_along_axis(td2, order, axis=-1)
    idx = jnp.take_along_axis(idx, order, axis=-1)

    if radius is None:
        # post-hoc certificate: no point outside the window can beat the
        # kth winner — its x alone is farther than sqrt(d²_k)
        e_lo = jnp.take_along_axis(sx, start * 128, axis=1)
        e_hi = jnp.take_along_axis(sx, start * 128 + (w - 1), axis=1)
        dk = td2[..., -1].reshape(b, nchunk_pf, QC)
        qx = scq[..., 0].reshape(b, nchunk_pf, QC)
        ok_lo = (start == 0)[..., None] | ((qx - e_lo[..., None]) ** 2 >= dk)
        ok_hi = (start * 128 + w >= n)[..., None] | \
            ((e_hi[..., None] - qx) ** 2 >= dk)
        cover_ok = jnp.all(ok_lo & ok_hi)

    # back to the caller's query order
    inv = jnp.argsort(cperm, axis=-1)
    td2 = jnp.take_along_axis(td2, inv[..., None], axis=1)
    idx = jnp.take_along_axis(idx, inv[..., None], axis=1)
    return td2, idx, cover_ok


def nearest_k(new_xyz, xyz, k: int, radius=None, *, dense_fn=None):
    """(B, M, 3), (B, N, 3) → (td2 (B,M,k) ascending exact-f32, idx i32).

    Windowed Pallas kernel with certificate; falls back to ``dense_fn``
    (required) for the whole batch under lax.cond when coverage fails.

    Shapes must satisfy knn_supported(): if n < 2w the window-start
    jnp.clip(x, 0, n-w) has min>max and yields negative starts, so the
    kernel would read out-of-range rows while the clamped-gather
    certificate can still pass on garbage (ADVICE r4) — enforce here, not
    in callers.
    """
    if not knn_supported(new_xyz.shape[1], xyz.shape[1], k):
        raise ValueError(
            f"nearest_k: unsupported shapes m={new_xyz.shape[1]} "
            f"n={xyz.shape[1]} k={k} (need m%{QC}==0, n%128==0, n>=2*window, "
            f"k<=window//4); use the dense path instead")
    w = _pick_window(xyz.shape[1])
    td2, idx, ok = _prep_and_run(new_xyz, xyz, k, w, radius=radius)
    if dense_fn is None:
        return td2, idx, ok
    return jax.lax.cond(
        ok,
        lambda: (td2, idx),
        lambda: dense_fn(new_xyz, xyz, k),
    )
