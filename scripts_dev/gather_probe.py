"""Dev: probe TPU gather strategies for the DBSCAN label-propagation round.

The propagation round is `min over masked labels[idx]` with idx (N, k) banded
(|idx - row| < w after x-sorting). Candidates:
  A. XLA fancy gather            labels[idx]
  B. XLA take_along_axis         (same lowering check)
  C. one-hot matmul per chunk    (banded window, f32 dot)
  D. pallas: dynamic mosaic gather probe (jnp.take inside kernel)
  E. host roundtrip bandwidth    (device->host for (N,k) int16 offsets)
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from modest_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()

N = 131072
K = 70
W = 4096
rng = np.random.RandomState(0)
rows = np.arange(N)[:, None]
off = rng.randint(-W // 2, W // 2, size=(N, K))
idx_h = np.clip(rows + off, 0, N - 1).astype(np.int32)
labels_h = rng.permutation(N).astype(np.int32)
mask_h = rng.rand(N, K) < 0.5

idx = jnp.asarray(idx_h)
labels = jnp.asarray(labels_h)
mask = jnp.asarray(mask_h)


def timeit(name, fn, iters=10):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:42s} {dt*1e3:8.2f} ms", flush=True)
    return out


@jax.jit
def xla_gather_min(labels, idx, mask):
    g = labels[idx]
    return jnp.where(mask, g, N).min(axis=1)


@jax.jit
def xla_take_min(labels, idx, mask):
    g = jnp.take(labels, idx, axis=0)
    return jnp.where(mask, g, N).min(axis=1)


@jax.jit
def xla_gather_only(labels, idx):
    return labels[idx]


@jax.jit
def compress_once(labels):
    return labels[labels]


ref = np.where(mask_h, labels_h[idx_h], N).min(axis=1)

a = timeit("A xla fancy gather+min (N,k)", lambda: xla_gather_min(labels, idx, mask))
assert np.array_equal(np.asarray(a), ref)
timeit("B xla take+min (N,k)", lambda: xla_take_min(labels, idx, mask))
timeit("A' xla gather only (N,k)", lambda: xla_gather_only(labels, idx))
timeit("compress labels[labels] (N,)", lambda: compress_once(labels))

# C: banded one-hot matmul, chunked
T = 1024  # rows per chunk
los_h = np.clip(np.arange(0, N, T)[:, None] - W // 2, 0, N - W).reshape(-1)
# rebuild idx to be in-window for this variant
idx_w = np.clip(idx_h, los_h.repeat(T)[:, None], (los_h + W - 1).repeat(T)[:, None]).astype(np.int32)
idxw = jnp.asarray(idx_w)
los = jnp.asarray(los_h.astype(np.int32))


@jax.jit
def onehot_min(labels, idxw, mask, los):
    ext = labels.astype(jnp.float32)

    def chunk(c):
        lo = los[c]
        win = jax.lax.dynamic_slice(ext, (lo,), (W,))
        ic = jax.lax.dynamic_slice(idxw, (c * T, 0), (T, K)) - lo
        mc = jax.lax.dynamic_slice(mask, (c * T, 0), (T, K))
        oh = (ic[:, :, None] == jax.lax.broadcasted_iota(jnp.int32, (T, K, W), 2))
        g = jnp.einsum("tkw,w->tk", oh.astype(jnp.bfloat16), win.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        return jnp.where(mc, g, N).min(axis=1).astype(jnp.int32)

    return jax.lax.map(chunk, jnp.arange(N // T)).reshape(N)


timeit("C onehot bf16 matmul banded", lambda: onehot_min(labels, idxw, mask, los), iters=3)

# D: pallas mosaic dynamic gather probe
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _probe_kernel(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)


def pallas_take(labels, idx):
    return pl.pallas_call(
        _probe_kernel,
        out_shape=jax.ShapeDtypeStruct(idx.shape, labels.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(labels, idx)


try:
    small_tab = jnp.asarray(labels_h[:1024])
    small_idx = jnp.asarray(idx_h[:256, :] % 1024)
    out = pallas_take(small_tab, small_idx)
    ok = np.array_equal(np.asarray(out), labels_h[:1024][idx_h[:256, :] % 1024])
    print(f"D pallas jnp.take(tab(1024,), idx(256,70)): compiles, correct={ok}")
    big = jax.jit(pallas_take)(labels, idx)
    ok = np.array_equal(np.asarray(big), labels_h[idx_h])
    print(f"D pallas jnp.take full (131072 tab): correct={ok}")
    timeit("D pallas take (N,k)", lambda: jax.jit(pallas_take)(labels, idx))
except Exception as e:  # noqa: BLE001
    print(f"D pallas jnp.take: FAILED: {type(e).__name__}: {str(e)[:300]}")


def _probe_kernel2(tab_ref, idx_ref, out_ref):
    # take_along_axis along lanes: tab (8, W), idx (8, M)
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)


def pallas_taa(tab, idx):
    return pl.pallas_call(
        _probe_kernel2,
        out_shape=jax.ShapeDtypeStruct(idx.shape, tab.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, idx)


try:
    tab8 = jnp.asarray(np.tile(labels_h[None, :4096], (8, 1)))
    idx8 = jnp.asarray(idx_h[:8, :] % 4096)
    out = pallas_taa(tab8, idx8)
    ok = np.array_equal(np.asarray(out), np.take_along_axis(np.asarray(tab8), idx_h[:8, :] % 4096, 1))
    print(f"D2 pallas take_along_axis(tab(8,4096), idx(8,70)) lanes: compiles, correct={ok}")
    # bigger: (256, 4096) tab rows gathered per-row
    tabB = jnp.asarray(np.tile(labels_h[None, :4096], (256, 1)))
    idxB = jnp.asarray(idx_h[:256, :] % 4096)
    out = jax.jit(pallas_taa)(tabB, idxB)
    ok = np.array_equal(np.asarray(out), np.take_along_axis(np.asarray(tabB), np.asarray(idxB), 1))
    print(f"D2 bigger (256,4096)x(256,70): correct={ok}")
    timeit("D2 pallas taa (256,4096)", lambda: jax.jit(pallas_taa)(tabB, idxB))
except Exception as e:  # noqa: BLE001
    print(f"D2 pallas take_along_axis: FAILED: {type(e).__name__}: {str(e)[:300]}")

# E: device->host bandwidth
big_dev = jax.device_put(np.zeros((N, K), np.int16))
t0 = time.perf_counter()
_ = np.asarray(big_dev)
dt = time.perf_counter() - t0
mb = N * K * 2 / 1e6
print(f"E device->host {mb:.1f} MB in {dt*1e3:.1f} ms = {mb/dt/1e3:.2f} GB/s")
up = np.zeros((N, K), np.int16)
t0 = time.perf_counter()
jax.block_until_ready(jax.device_put(up))
dt = time.perf_counter() - t0
print(f"E host->device {mb:.1f} MB in {dt*1e3:.1f} ms = {mb/dt/1e3:.2f} GB/s")
