"""DBSCAN label propagation as Pallas TPU kernels.

The XLA formulation of the PP-gated DBSCAN (pipeline/clustering.py)
spends ~240 ms/frame in its while_loop: every propagation round pays a
(N, k) gather from the N-entry label table through XLA's generic gather
(~7.5 ns/element on v5e — a dynamic-slice loop), and ~10 rounds are
needed. Mosaic's `tpu.dynamic_gather` shuffles within one vreg along
lanes, so a gather from a big table decomposes — after x-sorting — into
a BANDED gather: all neighbor indices of a 1024-point chunk fall inside
a W-entry window of the sorted order. Scanning the window's 128-entry
rows one at a time turns the 2-D lookup into, per row, ONE lane-shuffle
+ row-match select over the whole chunk's neighbor stack.

Layout: neighbor tensors ride as (S·8, C·128) "slot stacks" — row
t·8 + j holds slot t of the 128 points j·128..j·128+127 of each chunk,
so every (8, 128) vreg of the stack gathers from the SAME broadcast
window row in one `take_along_axis`, and the per-point reduction over
slots is a free (S, 8, 128) sublane-split + cross-vreg min/sum. The
window scan is a `lax.fori_loop`, NOT a Python unroll: trace+lower time
is what dominates cold start on a 1-core host (a w/128-way unroll costs
~25 s of Python per bucket shape, paid before any compilation cache).

Two kernels:

* `_edge_kernel` — one window sweep gathering the kth-NN-dist²/PP tables,
  then gating each neighbor slot by mutuality (d² ≤ kth²(j)) and PP
  (|ΔPP| ≤ eps), emitting the edge-masked local index stack and
  per-point degree. Replaces the two (N, k) setup gathers.
* `_prop_kernel` — grid (rounds+1, chunks+1). Rounds r < rounds run a
  Gauss-Seidel min-label sweep over chunks (direction alternating per
  round so minima flow both ways along the sorted axis) with labels
  resident in VMEM, then one pointer-jumping compress pass over the
  whole table (phase B). The final round computes border-point labels
  into scratch (gathering only from the still-clean core table) and
  merges. A `changed` output says whether the LAST propagation round
  changed anything — the host re-runs the kernel in the (rare) case the
  fixed round budget was too small, so results are exact, not
  truncated-iteration approximations (a sweep with zero changes is a
  fixpoint certificate: adjacent core labels are then pairwise equal, so
  pointer jumps are no-ops too).

Semantics match `_cluster_from_knn_impl` exactly (same edge graph, same
min-core-index labels, same border rule); reference semantics:
generate_cluster_mask/utils/clustering_utils.py:7-135 + sklearn DBSCAN
(metric='precomputed') in generate_mask.py:75-81.

i16 local indices (window ≤ 16k entries) halve the VMEM traffic; slot
rows k..SLOTS-1 are sentinel padding. Batched frames stack along the
entry axis — windows never cross frame boundaries (host clamps them
inside each frame) and sentinels keep the graphs independent, so one
kernel converges all frames together.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SENT = np.int32(0x3FFFFFFF)     # label sentinel: non-core / no-edge / noise
ISENT = np.int16(0x7FFF)        # i16 local-index sentinel (≥ any window)
SLOTS = 72                      # stored neighbor-slot rows (≥ k=70; 72·8 % 16 = 0)
SROWS = SLOTS * 8               # stacked rows per chunk block


def _bcast_row(row, rows):
    """(1, 128) → (rows, 128): one window row as the gather table for
    every vreg of a slot stack."""
    return jnp.broadcast_to(row, (rows, 128))


def _edge_kernel(lo_ref, lidx_ref, d2_ref, kth_ref, pp_ref,
                 out_ref, deg_ref, *, w128, eps):
    """Per chunk: gate each neighbor slot by mutuality + |ΔPP|, emit the
    edge-masked local index stack and per-point degree.

    lidx_ref (SROWS, 128) i16 local idx (ISENT = out-of-radius/invalid),
    d2_ref (SROWS, 128) f32, kth/pp (B·N/128, 128) f32 resident tables,
    out_ref (SROWS, 128) i16, deg_ref (8, 128) i32.
    """
    c = pl.program_id(0)
    lo = lo_ref[c]
    lidx = lidx_ref[:].astype(jnp.int32)          # (SROWS, 128)
    rv = jnp.right_shift(lidx, 7)
    cc = jnp.bitwise_and(lidx, 127)

    def body(g, carry):
        # aligned 8-row window group (lo is a multiple of 8), then a static
        # 8-way inner unroll: one lane-shuffle + row-match select per row
        g_kth, g_pp = carry
        win_k = kth_ref[pl.ds(lo + g * 8, 8), :]
        win_p = pp_ref[pl.ds(lo + g * 8, 8), :]
        for i in range(8):
            hit = rv == g * 8 + i
            rk = _bcast_row(win_k[i:i + 1], SROWS)
            rp = _bcast_row(win_p[i:i + 1], SROWS)
            g_kth = jnp.where(hit, jnp.take_along_axis(rk, cc, axis=1), g_kth)
            g_pp = jnp.where(hit, jnp.take_along_axis(rp, cc, axis=1), g_pp)
        return g_kth, g_pp

    g_kth, g_pp = jax.lax.fori_loop(
        0, w128 // 8,
        body,
        (jnp.full((SROWS, 128), -1.0, jnp.float32),
         jnp.full((SROWS, 128), 1e9, jnp.float32)),
    )
    pp_own = jnp.broadcast_to(pp_ref[pl.ds(c * 8, 8), :][None],
                              (SLOTS, 8, 128)).reshape(SROWS, 128)
    edge = (d2_ref[:] <= g_kth) & (jnp.abs(pp_own - g_pp) <= eps)
    out_ref[:] = jnp.where(edge, lidx, jnp.int32(ISENT)).astype(jnp.int16)
    deg_ref[:] = jnp.sum(edge.astype(jnp.int32).reshape(SLOTS, 8, 128), axis=0)


def _prop_kernel(lo_ref, lidx_ref, init_ref, lab_ref, chg_ref, border_ref,
                 *, w128, rounds, n2r, b):
    """See module docstring. Grid (rounds+1, C+1)."""
    r = pl.program_id(0)
    c = pl.program_id(1)
    C = pl.num_programs(1) - 1

    @pl.when((r == 0) & (c == 0))
    def _init():
        lab_ref[:] = init_ref[:]

    @pl.when((c == 0) & (r < rounds))
    def _reset():
        chg_ref[:] = jnp.zeros_like(chg_ref)

    @pl.when(c < C)
    def _sweep():
        c_eff = jnp.where(r % 2 == 1, C - 1 - c, c)
        lo = lo_ref[c_eff]
        lidx = lidx_ref[:].astype(jnp.int32)      # (SROWS, 128)
        rv = jnp.right_shift(lidx, 7)
        cc = jnp.bitwise_and(lidx, 127)

        def body(g, acc):
            win = lab_ref[pl.ds(lo + g * 8, 8), :]
            for i in range(8):
                rep = _bcast_row(win[i:i + 1], SROWS)
                gt = jnp.take_along_axis(rep, cc, axis=1)
                acc = jnp.where(rv == g * 8 + i, jnp.minimum(acc, gt), acc)
            return acc

        acc = jax.lax.fori_loop(
            0, w128 // 8, body, jnp.full((SROWS, 128), SENT, jnp.int32))
        nbr8 = jnp.min(acc.reshape(SLOTS, 8, 128), axis=0)   # (8, 128)
        old8 = lab_ref[pl.ds(c_eff * 8, 8), :]
        is_core = old8 < SENT

        @pl.when(r < rounds)
        def _update():
            new8 = jnp.where(is_core, jnp.minimum(old8, nbr8), old8)
            lab_ref[pl.ds(c_eff * 8, 8), :] = new8
            chg_ref[:] = chg_ref[:] | (new8 != old8).astype(jnp.int32)

        @pl.when(r == rounds)
        def _border():
            # non-core points adjacent to a core point adopt the min core
            # label; nbr8 was gathered from the still-clean core table
            border_ref[pl.ds(c_eff * 8, 8), :] = jnp.where(is_core, old8, nbr8)

    @pl.when((c == C) & (r < rounds))
    def _compress():
        # Jacobi pointer-jump over each frame's table: lab ← min(lab,
        # lab[lab]). Labels are min-core indices, so lab[i] ≤ i for core
        # rows and the source scan can run over the whole frame cheaply.
        for f in range(b):
            fbase = f * n2r

            def body(s8, acc, fbase=fbase):
                blk = lab_ref[pl.ds(fbase + s8 * 8, 8), :]
                for i in range(8):
                    rep = _bcast_row(blk[i:i + 1], n2r)
                    g = jnp.take_along_axis(
                        rep, jnp.bitwise_and(acc, 127), axis=1)
                    srow = fbase + s8 * 8 + i
                    acc = jnp.where(jnp.right_shift(acc, 7) == srow,
                                    jnp.minimum(acc, g), acc)
                return acc

            lab_ref[pl.ds(fbase, n2r), :] = jax.lax.fori_loop(
                0, n2r // 8, body, lab_ref[pl.ds(fbase, n2r), :])

    @pl.when((c == C) & (r == rounds))
    def _merge():
        lab_ref[:] = jnp.where(lab_ref[:] < SENT, lab_ref[:], border_ref[:])


def _next_kib(need: int) -> int:
    """Smallest quarter-pow2 multiple of 1024 ≥ need (bounded compile set)."""
    k = (need + 1023) // 1024
    if k <= 8:
        return k * 1024
    p2 = 1 << (k - 1).bit_length()
    kq = next(b for q in (4, 5, 6, 7, 8) if (b := p2 // 8 * q) >= k)
    return kq * 1024


def window_rows(xs_sorted: np.ndarray, n_pad: int, radius: float,
                row_chunk: int = 1024) -> tuple[np.ndarray, int]:
    """Per-chunk window start rows (128-entry units, multiples of 8) and a
    bucketed window width W (entries) covering every chunk's in-radius span."""
    c_min = xs_sorted[0:n_pad:row_chunk]
    c_max = xs_sorted[row_chunk - 1:n_pad:row_chunk]
    lo = np.searchsorted(xs_sorted, c_min - radius, side="left")
    hi = np.searchsorted(xs_sorted, c_max + radius, side="right")
    lo_al = (lo // 1024) * 1024
    need = int(np.max(hi - lo_al))
    w = min(_next_kib(need), n_pad)
    lo_al = np.minimum(lo_al, n_pad - w)
    return (lo_al // 128).astype(np.int32), int(w)


def dbscan_device_impl(ppb, validb, lob, idxb, d2b, *, n_pad, w,
                       min_samples, eps, radius2, rounds=12, interpret=False):
    """Batched TPU DBSCAN from precomputed kNN: (B, N, k) idx/d2 →
    packed (B, N) int32 (see return note), all frames converged together.

    lob: (B, C_pf) per-chunk window start rows (units of 128 entries,
    multiples of 8, clamped to [0, N/128 - w/128]) — frame-local.

    Unjitted so callers can fuse it into a larger program (the pipeline
    fuses the kNN graph build + this into ONE dispatch per frame group —
    each separate jitted call through the axon relay costs a full
    dispatch round trip); `_dbscan_device` below is the standalone entry.
    """
    b, n, k = idxb.shape
    assert n == n_pad and n % 1024 == 0 and k <= SLOTS
    # i16 local indices: window entries must stay below ISENT (0x7FFF) —
    # at w == 32768 a real local index collides with the sentinel and
    # larger values wrap negative, silently corrupting the edge graph.
    # Callers (_labels_via_pallas) fall back to the XLA path instead.
    assert w < 32768, f"window {w} overflows i16 local indices"
    cpf = n // 1024
    n2r = n // 128
    w128 = w // 128

    # ---- flatten the batch: frames stack along the entry axis ----
    off = (jnp.arange(b, dtype=jnp.int32) * n)[:, None, None]
    idx_g = idxb.astype(jnp.int32) + off                       # global entries
    lo_g = lob.astype(jnp.int32) + (jnp.arange(b, dtype=jnp.int32) * n2r)[:, None]
    lo_flat = lo_g.reshape(b * cpf)
    lo_rows = jnp.repeat(lo_flat, 1024)[:, None]               # per point

    d2 = d2b.reshape(b * n, k)
    finite = jnp.isfinite(d2)
    within = finite & (d2 <= radius2)
    local = idx_g.reshape(b * n, k) - lo_rows * 128
    lidx_raw = jnp.where(within, local, jnp.int32(ISENT)).astype(jnp.int16)

    def to_stack(a, fill):
        """(B·N, k) → (SLOTS·8, B·N/8): row t·8 + j, lane column c·128 + l
        holds slot t of point c·1024 + j·128 + l (the kernel's vreg-aligned
        slot-stack layout, one transpose on device)."""
        pad = jnp.full((a.shape[0], SLOTS - k), fill, a.dtype)
        full = jnp.concatenate([a, pad], axis=1)               # (B·N, SLOTS)
        return (full.reshape(b * cpf, 8, 128, SLOTS)
                .transpose(3, 1, 0, 2).reshape(SROWS, b * cpf * 128))

    lidx_t = to_stack(lidx_raw, ISENT)                         # i16
    d2_t = to_stack(jnp.where(within, d2, jnp.inf).astype(jnp.float32),
                    np.float32(np.inf))

    kth = jnp.where(validb,
                    jnp.max(jnp.where(finite.reshape(b, n, k), d2b, -1.0),
                            axis=2), -1.0)
    kth2d = kth.astype(jnp.float32).reshape(b * n2r, 128)
    pp2d = ppb.astype(jnp.float32).reshape(b * n2r, 128)

    C = b * cpf
    grid_edge = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(C,),
        in_specs=[
            pl.BlockSpec((SROWS, 128), lambda c, lo: (0, c)),
            pl.BlockSpec((SROWS, 128), lambda c, lo: (0, c)),
            pl.BlockSpec((b * n2r, 128), lambda c, lo: (0, 0)),
            pl.BlockSpec((b * n2r, 128), lambda c, lo: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((SROWS, 128), lambda c, lo: (0, c)),
            pl.BlockSpec((8, 128), lambda c, lo: (c, 0)),
        ],
    )
    lidx_m, deg2d = pl.pallas_call(
        functools.partial(_edge_kernel, w128=w128, eps=np.float32(eps)),
        grid_spec=grid_edge,
        out_shape=[jax.ShapeDtypeStruct((SROWS, b * cpf * 128), jnp.int16),
                   jax.ShapeDtypeStruct((b * n2r, 128), jnp.int32)],
        interpret=interpret,
    )(lo_flat, lidx_t, d2_t, kth2d, pp2d)

    core2d = validb.reshape(b * n2r, 128) & (deg2d + 1 >= min_samples)
    entry = (jax.lax.broadcasted_iota(jnp.int32, (b * n2r, 128), 0) * 128
             + jax.lax.broadcasted_iota(jnp.int32, (b * n2r, 128), 1))
    init2d = jnp.where(core2d, entry, SENT)

    grid_prop = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(rounds + 1, C + 1),
        in_specs=[
            pl.BlockSpec((SROWS, 128),
                         lambda r, c, lo: (0, jnp.clip(
                             jnp.where(r % 2 == 1, C - 1 - c, c), 0, C - 1))),
            pl.BlockSpec((b * n2r, 128), lambda r, c, lo: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((b * n2r, 128), lambda r, c, lo: (0, 0)),
            pl.BlockSpec((8, 128), lambda r, c, lo: (0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((b * n2r, 128), jnp.int32)],
    )
    lab2d, chg = pl.pallas_call(
        functools.partial(_prop_kernel, w128=w128, rounds=rounds, n2r=n2r,
                          b=b),
        grid_spec=grid_prop,
        out_shape=[jax.ShapeDtypeStruct((b * n2r, 128), jnp.int32),
                   jax.ShapeDtypeStruct((8, 128), jnp.int32)],
        interpret=interpret,
    )(lo_flat, lidx_m, init2d)

    lab = lab2d.reshape(b, n)
    labels = jnp.where(lab >= SENT, jnp.int32(n),
                       lab - (jnp.arange(b, dtype=jnp.int32) * n)[:, None])
    # pack (label, core, changed) into ONE i32 download: device→host moves
    # at ~0.02 GB/s through the axon relay, and every extra fetch costs a
    # full round trip. label == n ⇒ noise; bit1 = core; bit0 = changed.
    changed = jnp.any(chg != 0).astype(jnp.int32)
    packed = (labels << 2) | (core2d.reshape(b, n).astype(jnp.int32) << 1) \
        | changed
    return packed


_dbscan_device = functools.partial(jax.jit, static_argnames=(
    "n_pad", "w", "min_samples", "eps", "radius2", "rounds", "interpret"))(
        dbscan_device_impl)
