"""Pallas DBSCAN kernels vs the XLA reference path (interpret mode on CPU).

The kernel must reproduce `_cluster_from_knn_impl` exactly: same edge
graph (mutual-kNN ∧ radius ∧ |ΔPP| ≤ eps), same min-core-index component
labels, same border rule (reference: clustering_utils.py:7-135 + sklearn
DBSCAN(metric='precomputed') in generate_mask.py:75-81).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from modest_tpu.pipeline import clustering as C
from modest_tpu.ops import pallas_dbscan as PD


def _make_frame(rng, n, n_pad, radius):
    """Synthetic clustered frame, x-sorted and padded like _dbscan_prep."""
    centers = rng.uniform(-30, 30, size=(6, 3))
    pts = np.concatenate([
        c + rng.normal(scale=0.5, size=(n // 8, 3)) for c in centers
    ] + [rng.uniform(-35, 35, size=(n - 6 * (n // 8), 3))])
    pp = rng.uniform(0, 1, n).astype(np.float32)
    pp[: n // 2] *= 0.05  # tight PP block → big clusters
    order = np.argsort(pts[:, 0], kind="stable")
    x = np.zeros((n_pad, 3), np.float32)
    x[:n] = pts[order]
    x[n:, 0] = 1e6 + np.arange(n_pad - n) * max(4.0, 2.1 * radius)
    p = np.zeros(n_pad, np.float32)
    p[:n] = pp[order]
    valid = np.zeros(n_pad, bool)
    valid[:n] = True
    return x, p, valid


@pytest.mark.parametrize("b,n,n_pad", [(1, 1900, 2048), (2, 3000, 3072)])
def test_pallas_matches_xla_path(b, n, n_pad):
    rng = np.random.RandomState(0)
    radius, eps, min_samples, k = 2.0, 0.1, 10, 48

    frames = [_make_frame(rng, n - 37 * i, n_pad, radius) for i in range(b)]
    xb = jnp.asarray(np.stack([f[0] for f in frames]))
    ppb = jnp.asarray(np.stack([f[1] for f in frames]))
    vb = jnp.asarray(np.stack([f[2] for f in frames]))

    idx, d2 = C._knn_batch(xb, vb, k, row_chunk=1024)

    los, ws = [], []
    for f in frames:
        lo, w = PD.window_rows(f[0][:, 0], n_pad, radius)
        los.append(lo)
        ws.append(w)
    w = max(ws)
    lob = np.minimum(np.stack(los), n_pad // 128 - w // 128)

    packed = np.asarray(PD._dbscan_device(
        ppb, vb, jnp.asarray(lob), idx, d2,
        n_pad=n_pad, w=w, min_samples=min_samples,
        eps=np.float32(eps), radius2=np.float32(radius * radius),
        rounds=12, interpret=True))
    assert not (packed.flat[0] & 1), "fixed round budget insufficient"

    labels = packed >> 2
    core = ((packed >> 1) & 1).astype(bool)
    for i in range(b):
        ref_raw, ref_core = C._cluster_from_knn(
            idx[i], d2[i], ppb[i], vb[i],
            np.float32(radius * radius), np.float32(eps), min_samples)
        ref_raw = np.asarray(ref_raw)
        got = np.where(labels[i] >= n_pad, -1, labels[i])
        want = np.where(ref_raw >= n_pad, -1, ref_raw)
        np.testing.assert_array_equal(got, want)
        np.testing.assert_array_equal(core[i], np.asarray(ref_core))


def test_window_rows_covers_band():
    rng = np.random.RandomState(1)
    n_pad = 4096
    xs = np.sort(np.concatenate([
        rng.uniform(-50, 50, 3000),
        1e6 + np.arange(n_pad - 3000) * 4.2,
    ])).astype(np.float32)
    lo, w = PD.window_rows(xs, n_pad, 2.0)
    assert w % 1024 == 0 and w <= n_pad
    assert np.all(lo % 8 == 0) and np.all(lo >= 0)
    assert np.all(lo + w // 128 <= n_pad // 128)
    # every in-radius candidate of every chunk falls inside its window
    for c in range(n_pad // 1024):
        qlo, qhi = xs[c * 1024], xs[c * 1024 + 1023]
        a = np.searchsorted(xs, qlo - 2.0, side="left")
        z = np.searchsorted(xs, qhi + 2.0, side="right")
        assert lo[c] * 128 <= a and z <= lo[c] * 128 + w
