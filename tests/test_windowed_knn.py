"""Windowed nearest-k (x-sorted candidate windows) vs the dense exact path.

The windowed path only ever feeds radius-masked consumers (nearest_group
keeps td2 < r²), so correctness = every in-radius member of the exact
k-nearest set is recovered whenever the window covers the chunk span — it
does by construction on these clouds (W ≫ points within chunk-span + 2r).
On CPU _fast_top_k is exact, so the comparison is deterministic.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from modest_tpu.ops import pointnet2 as p2


def _make(b, m, n, seed=0):
    rng = np.random.RandomState(seed)
    xyz = rng.uniform([0, -40, -2], [80, 40, 1], (b, n, 3)).astype(np.float32)
    # FPS-like spread centers: a random subset of the cloud
    sel = np.stack([rng.choice(n, m, replace=False) for _ in range(b)])
    new_xyz = np.take_along_axis(xyz, sel[..., None], axis=1)
    return jnp.asarray(new_xyz), jnp.asarray(xyz)


@pytest.mark.parametrize("b,m,n,k,r", [(2, 1024, 4096, 32, 0.9),
                                       (1, 2048, 16384, 16, 2.0)])
def test_windowed_matches_exact_within_radius(b, m, n, k, r):
    new_xyz, xyz = _make(b, m, n)
    td2, idx = p2._windowed_nearest(new_xyz, xyz, k, r)
    td2, idx = np.asarray(td2), np.asarray(idx)

    d2 = np.asarray(p2.pairwise_dist2(new_xyz, xyz))
    exact_idx = np.argsort(d2, axis=-1, kind="stable")[..., :k]
    exact_d2 = np.take_along_axis(d2, exact_idx, -1)

    r2 = r * r
    for bi in range(b):
        for ci in range(0, m, 37):
            want = set(exact_idx[bi, ci][exact_d2[bi, ci] < r2].tolist())
            got = set(idx[bi, ci][td2[bi, ci] < r2].tolist())
            assert want <= got, (bi, ci, want - got)
    # returned distances are true squared distances to the returned indices
    # (f64 diff form; the dense matmul form carries ~3e-3 absolute
    # cancellation error at this coordinate scale and can't serve as truth)
    nx = np.asarray(new_xyz, np.float64)
    px = np.asarray(xyz, np.float64)
    nbr = np.take_along_axis(px, idx.reshape(b, m * k)[..., None], axis=1
                             ).reshape(b, m, k, 3)
    true_d2 = ((nbr - nx[:, :, None, :]) ** 2).sum(-1)
    np.testing.assert_allclose(td2, true_d2, rtol=1e-4, atol=1e-5)


def test_windowed_gate_and_dispatch(monkeypatch):
    # windowed is opt-in (MODEST_WINDOWED_KNN=1): measured slower end-to-end
    # than dense d² + approx top-k even with correct numerics (BENCH.md r4)
    assert not p2.windowed_supports(4096, 12288)
    monkeypatch.setattr(p2, "_WINDOWED_KNN", True)
    assert p2.windowed_supports(4096, 12288)
    assert p2.windowed_supports(1024, 4096)
    assert not p2.windowed_supports(256, 1024)   # small level → dense path
    assert not p2.windowed_supports(1000, 12288)  # non-chunk-aligned M

    # CPU always takes the dense exact path regardless of radius
    new_xyz, xyz = _make(1, 128, 1024, seed=3)
    td2, idx = p2.nearest_neighbors(new_xyz, xyz, 8, radius=0.9)
    d2 = np.asarray(p2.pairwise_dist2(new_xyz, xyz))
    want_idx = np.argsort(d2, axis=-1, kind="stable")[..., :8]
    np.testing.assert_array_equal(np.asarray(idx), want_idx)
    np.testing.assert_allclose(
        np.asarray(td2), np.take_along_axis(d2, want_idx, -1), rtol=1e-6)
