"""Furthest point sampling as a Pallas TPU kernel.

The XLA while_loop formulation costs ~22 µs per sequential step on v5e
(dispatch + layout overhead dominates the 12k-lane VPU work). This kernel
keeps the running min-distance matrix (B, N) resident in VMEM and runs all
npoint steps inside one launch. The selected point's coordinates are
extracted with a masked reduction (no dynamic lane gathers), and the output
indices accumulate into a (B, npoint) buffer with a one-hot select (no
dynamic stores) — every intermediate stays 2-D for Mosaic.

Matches the CUDA kernel's semantics exactly (sampling_gpu.cu): start at
index 0, iteratively take argmax of the min-distance vector.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel3d(xt_ref, out_ref, dists_ref, *, unroll: int):
    """3-D layout variant: points live as (B, 8, W) with W = N/8 so every
    f32 vreg uses all 8 sublanes (the 2-D (B, N) layout fills only B of
    them). argmax becomes a max-reduce plus a masked min over the flat
    index iota — both full-array vector ops; tie → lowest flat index, which
    is the original index order (row-major split), matching the CUDA
    kernel's first-max semantics (sampling_gpu.cu)."""
    b, _, s, w = xt_ref.shape
    npoint = out_ref.shape[2]

    x = xt_ref[:, 0]
    y = xt_ref[:, 1]
    z = xt_ref[:, 2]  # (B, 8, W)

    dists_ref[:] = jnp.full((b, s, w), 1e10, jnp.float32)
    out_ref[:] = jnp.zeros((b, 1, npoint), jnp.int32)

    flat = (
        jax.lax.broadcasted_iota(jnp.int32, (b, s, w), 1) * w
        + jax.lax.broadcasted_iota(jnp.int32, (b, s, w), 2)
    )
    slot = jax.lax.broadcasted_iota(jnp.int32, (b, 1, npoint), 2)

    def _reduce(op, v):
        # (B, 8, W) → (B, 8, 1), replicated across sublanes. Mosaic cannot
        # broadcast sublanes+lanes in one op, so reduce lane axis, reduce the
        # sublane axis, and re-broadcast sublanes — downstream arithmetic
        # then only lane-broadcasts.
        r = op(op(v, axis=2, keepdims=True), axis=1, keepdims=True)
        return jnp.broadcast_to(r, (v.shape[0], v.shape[1], 1))

    def body(i, carry):
        lx, ly, lz = carry  # (B, 8, 1) coords of the previously selected point
        d = (x - lx) ** 2 + (y - ly) ** 2 + (z - lz) ** 2
        dists = jnp.minimum(dists_ref[:], d)
        dists_ref[:] = dists
        m = _reduce(jnp.max, dists)  # (B, 8, 1)
        idx = _reduce(jnp.min, jnp.where(dists == m, flat, jnp.int32(2**30)))
        out_ref[:] = jnp.where(slot == i, idx[:, 0:1], out_ref[:])
        sel = flat == idx
        nx = _reduce(jnp.sum, jnp.where(sel, x, 0.0))
        ny = _reduce(jnp.sum, jnp.where(sel, y, 0.0))
        nz = _reduce(jnp.sum, jnp.where(sel, z, 0.0))
        return (nx, ny, nz)

    first = lambda v: jnp.broadcast_to(v[:, 0:1, 0:1], (b, s, 1))
    init = (first(x), first(y), first(z))
    # Mosaic's fori_loop lowering only supports unroll=1/full; unroll by hand
    # (chunks of `unroll` bodies per step) to amortize loop overhead. A
    # single-trip chunk loop crashes the Mosaic compiler, so tiny npoint
    # runs the plain loop.
    if (npoint - 1) // unroll < 2:
        jax.lax.fori_loop(1, npoint, body, init)
        return
    n_main = ((npoint - 1) // unroll) * unroll

    def chunk(c, carry):
        i0 = 1 + c * unroll
        for k in range(unroll):
            carry = body(i0 + k, carry)
        return carry

    carry = jax.lax.fori_loop(0, n_main // unroll, chunk, init)
    jax.lax.fori_loop(1 + n_main, npoint, body, carry)


def _fps_kernel(xt_ref, out_ref, dists_ref):
    b, _, n = xt_ref.shape
    npoint = out_ref.shape[1]

    x = xt_ref[:, 0, :]
    y = xt_ref[:, 1, :]
    z = xt_ref[:, 2, :]

    dists_ref[:] = jnp.full((b, n), 1e10, jnp.float32)
    out_ref[:] = jnp.zeros((b, npoint), jnp.int32)

    lane = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    slot = jax.lax.broadcasted_iota(jnp.int32, (b, npoint), 1)

    def body(i, carry):
        lx, ly, lz = carry  # (B, 1) coords of the previously selected point
        d = (x - lx) ** 2 + (y - ly) ** 2 + (z - lz) ** 2
        dists = jnp.minimum(dists_ref[:], d)
        dists_ref[:] = dists
        idx = jnp.argmax(dists, axis=1, keepdims=True).astype(jnp.int32)  # (B, 1)
        out_ref[:] = jnp.where(slot == i, idx, out_ref[:])
        sel = lane == idx
        nx = jnp.sum(jnp.where(sel, x, 0.0), axis=1, keepdims=True)
        ny = jnp.sum(jnp.where(sel, y, 0.0), axis=1, keepdims=True)
        nz = jnp.sum(jnp.where(sel, z, 0.0), axis=1, keepdims=True)
        return (nx, ny, nz)

    jax.lax.fori_loop(1, npoint, body, (x[:, 0:1], y[:, 0:1], z[:, 0:1]))


def _batch_chunk(b: int, n: int, npoint: int) -> int:
    """Largest batch chunk whose VMEM working set stays within ~4 MB —
    large effective batches (e.g. the RoI head's B·R sub-clouds) otherwise
    exceed the 16 MB scoped-vmem limit. The per-sample estimate counts the
    3 coord rows, the dists scratch, ~6 live elementwise temporaries, the
    (8, 128)-tile padding of small dims, and the output slots."""
    bytes_per = 4 * (12 * max(n, 128) + 4 * max(npoint, 128))
    bc = max(8, ((4 << 20) // bytes_per) // 8 * 8)
    # Mosaic requires the blocked second-to-last dim to be a multiple of 8
    # (the (bc, npoint) output block), so chunks step by 8; tiny batches run
    # as a single block
    while bc > 0 and b % bc:
        bc -= 8
    return bc if 0 < bc <= b else b


@functools.partial(jax.jit, static_argnames=("npoint", "interpret"))
def furthest_point_sample_pallas(xyz, npoint: int, interpret: bool = False):
    """(B, N, 3) → (B, npoint) int32; gridded over batch chunks."""
    b, n, _ = xyz.shape
    bc = _batch_chunk(b, n, npoint)
    grid = (b // bc,)
    if n % 1024 == 0:
        # full-sublane layout: (B, 3, 8, N/8); row-major flat index == original
        xt = jnp.transpose(xyz, (0, 2, 1)).astype(jnp.float32)
        xt = xt.reshape(b, 3, 8, n // 8)
        out = pl.pallas_call(
            functools.partial(_fps_kernel3d, unroll=4),
            grid=grid,
            out_shape=jax.ShapeDtypeStruct((b, 1, npoint), jnp.int32),
            in_specs=[pl.BlockSpec((bc, 3, 8, n // 8), lambda i: (i, 0, 0, 0))],
            out_specs=pl.BlockSpec((bc, 1, npoint), lambda i: (i, 0, 0)),
            scratch_shapes=[pltpu.VMEM((bc, 8, n // 8), jnp.float32)],
            interpret=interpret,
        )(xt)
        return out[:, 0]
    xt = jnp.transpose(xyz, (0, 2, 1)).astype(jnp.float32)  # (B, 3, N)
    return pl.pallas_call(
        _fps_kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((b, npoint), jnp.int32),
        in_specs=[pl.BlockSpec((bc, 3, n), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((bc, npoint), lambda i: (i, 0)),
        scratch_shapes=[pltpu.VMEM((bc, n), jnp.float32)],
        interpret=interpret,
    )(xt)
