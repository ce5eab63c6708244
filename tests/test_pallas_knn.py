"""Pallas windowed kNN kernel vs brute-force oracle (interpret mode on CPU;
the on-chip Mosaic check lives in scripts_dev/dist_kernel_bench.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modest_tpu.ops import pallas_knn as pk


def _brute(new_xyz, xyz, k):
    d2 = ((new_xyz[:, :, None, :] - xyz[:, None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d2, axis=-1, kind="stable")[..., :k]
    return np.take_along_axis(d2, idx, axis=-1), idx


@pytest.mark.parametrize("b,m,n,k", [(2, 512, 4096, 16), (1, 1024, 8192, 32)])
def test_windowed_matches_brute_within_radius(b, m, n, k):
    rng = np.random.RandomState(0)
    xyz = rng.uniform([0, -40, -2], [80, 40, 1], (b, n, 3)).astype(np.float32)
    new_xyz = xyz[:, rng.choice(n, m, replace=False), :]
    radius = 1.0

    td2, idx, ok = pk.nearest_k(jnp.asarray(new_xyz), jnp.asarray(xyz), k,
                                radius=radius)
    assert bool(ok), "coverage certificate must hold on uniform clouds"
    td2, idx = np.asarray(td2), np.asarray(idx)
    bd2, bidx = _brute(new_xyz, xyz, k)

    # within the radius the kernel must return the true k-NN set up to
    # packed-ranking quantum ties (~2^-12 relative — the kernel ranks by
    # d² bits with the low bits carrying the index)
    r2 = radius * radius
    mask = bd2 < r2
    assert np.allclose(np.where(mask, td2, 0), np.where(mask, bd2, 0),
                       rtol=3e-3, atol=1e-6)
    # ascending order (exact: winners re-sorted by recomputed d²)
    assert np.all(np.diff(td2, axis=-1) >= -1e-7)
    # exact winner distances: recomputed elementwise, must equal the
    # direct diff-form at f32 exactly
    gath = np.take_along_axis(
        xyz[:, None, :, :].repeat(m, 1).reshape(b, m, n, 3),
        idx[..., None].repeat(3, -1), axis=2)
    ref = ((gath - new_xyz[:, :, None, :]) ** 2).sum(-1)
    assert np.allclose(td2, ref, rtol=1e-6, atol=1e-7)


def test_three_nn_mode_certificate_and_values():
    rng = np.random.RandomState(1)
    b, n, m, k = 2, 2048, 4096, 3
    xyz = rng.uniform([0, -40, -2], [80, 40, 1], (b, n, 3)).astype(np.float32)
    queries = rng.uniform([0, -40, -2], [80, 40, 1], (b, m, 3)).astype(np.float32)

    td2, idx, ok = pk.nearest_k(jnp.asarray(queries), jnp.asarray(xyz), k,
                                radius=None)
    td2, idx = np.asarray(td2), np.asarray(idx)
    bd2, bidx = _brute(queries, xyz, k)
    if bool(ok):
        assert np.allclose(td2, bd2, rtol=3e-3, atol=1e-6)
    else:
        # certificate correctly refuses — flag rows must be the mismatches
        good = np.isclose(td2, bd2, rtol=0, atol=1e-5).all(axis=-1)
        assert not good.all()


def test_dense_fallback_wiring():
    """When the certificate fails, nearest_k must return dense_fn's result."""
    rng = np.random.RandomState(2)
    b, n, m, k = 1, 1024, 128, 8
    # pathological pile-up: nearly all points in one 10cm x-slab so any
    # window covering a chunk + radius cannot certify coverage
    xyz = np.zeros((b, n, 3), np.float32)
    xyz[..., 0] = 40.0 + rng.uniform(-0.05, 0.05, (b, n))
    xyz[..., 1] = rng.uniform(-40, 40, (b, n))
    queries = xyz[:, :m, :].copy()

    marker_d2 = np.full((b, m, k), -123.0, np.float32)
    marker_idx = np.zeros((b, m, k), np.int32)

    def dense(q, c, kk):
        return jnp.asarray(marker_d2), jnp.asarray(marker_idx)

    w = pk._pick_window(n)
    _, _, ok = pk._prep_and_run(jnp.asarray(queries), jnp.asarray(xyz), k, w,
                                radius=30.0)
    td2, idx = pk.nearest_k(jnp.asarray(queries), jnp.asarray(xyz), k,
                            radius=30.0, dense_fn=dense)
    if not bool(ok):
        assert np.allclose(np.asarray(td2), marker_d2)
    else:
        pytest.skip("cloud unexpectedly certified; fallback untested")
