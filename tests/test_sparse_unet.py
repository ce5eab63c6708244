"""SparseInverseConv3d vs brute-force dense transposed conv; UNet smoke."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _active_set(rng, shape_zyx, density=0.4):
    nz, ny, nx = shape_zyx
    act = rng.rand(nz, ny, nx) < density
    act[0, 0, 0] = True
    zz, yy, xx = np.nonzero(act)
    coords = np.stack([zz, yy, xx], 1).astype(np.int32)
    keys = coords[:, 0] * ny * nx + coords[:, 1] * nx + coords[:, 2]
    order = np.argsort(keys)
    return coords[order], keys[order].astype(np.int32), act


def test_sparse_inverse_conv_matches_bruteforce(rng):
    from modest_tpu.models.sparse_conv import SparseInverseConv3d

    cs = (3, 4, 4)   # coarse (nz, ny, nx)
    fs = (5, 8, 8)   # fine
    stride, padding = (2, 2, 2), (1, 1, 1)
    c_coords, c_keys, _ = _active_set(rng, cs, 0.5)
    f_coords, f_keys, _ = _active_set(rng, fs, 0.5)
    cin, cout = 3, 4
    c_feats = rng.randn(len(c_coords), cin).astype(np.float32)
    c_valid = np.ones(len(c_coords), bool)
    f_valid = np.ones(len(f_coords), bool)

    m = SparseInverseConv3d(cout, stride, padding)
    # modules are batched: add a singleton batch dim
    b1 = lambda a: jnp.asarray(a)[None]
    variables = m.init(jax.random.PRNGKey(0), b1(c_feats), b1(c_keys),
                       b1(c_valid), cs, b1(f_coords), b1(f_valid), fs)
    out = np.asarray(m.apply(variables, b1(c_feats), b1(c_keys),
                             b1(c_valid), cs, b1(f_coords),
                             b1(f_valid), fs))[0]
    w = np.asarray(variables["params"]["kernel"])  # (27, cin, cout)

    # brute force: out[f] = sum over coarse c with f in window(c) of
    # W[tap(f, c)] . in[c], tap = f - (s*c - p) in [0, 2]^3
    s, p = np.array(stride), np.array(padding)
    for fi in range(len(f_coords)):
        acc = np.zeros(cout, np.float32)
        for ci in range(len(c_coords)):
            tap = f_coords[fi] - (s * c_coords[ci] - p)
            if ((tap >= 0) & (tap <= 2)).all():
                tid = (tap[0] * 3 + tap[1]) * 3 + tap[2]
                acc += c_feats[ci] @ w[tid]
        np.testing.assert_allclose(out[fi], acc, rtol=1e-4, atol=1e-5)


def test_sparse_unet_shapes(rng):
    from modest_tpu.models.sparse_conv import SparseUNet
    from modest_tpu.models.voxelize import point_voxel_coords, voxelize_sparse

    gs = (16, 16, 32)  # nx, ny, nz
    pcr = [0, -4, -2, 8, 4, 2]
    vs = [0.5, 0.5, 0.125]
    pts = np.concatenate([
        rng.uniform([0, -4, -2], [8, 4, 2], (256, 3)),
        rng.rand(256, 1)], 1).astype(np.float32)
    coords, valid = point_voxel_coords(jnp.asarray(pts), pcr, vs, gs)
    vc, vf, vv, vk = voxelize_sparse(jnp.asarray(pts), valid, coords, 256,
                                     gs[0], gs[1], gs[2])
    shape_zyx = (gs[2] + 1, gs[1], gs[0])
    m = SparseUNet()
    vf, vc, vk, vv = vf[None], vc[None], vk[None], vv[None]  # batched modules
    variables = m.init(jax.random.PRNGKey(0), vf, vc, vk, vv, shape_zyx)
    bev, u1 = m.apply(variables, vf, vc, vk, vv, shape_zyx,
                      mutable=["batch_stats"])[0]
    bev, u1, vv = bev[0], u1[0], vv[0]
    assert bev.shape[:2] == (2, 2) and bev.shape[2] % 128 == 0  # ny/8, nx/8, nz'*128
    assert u1.shape == (256, 16)
    # active full-res voxels get features, padding rows stay zero
    u1 = np.asarray(u1)
    vv = np.asarray(vv)
    assert np.abs(u1[vv]).sum() > 0
    assert np.abs(u1[~vv]).sum() == 0


def test_voxel_res_backbone_shapes(rng):
    from modest_tpu.models.sparse_conv import VoxelResBackBone8x
    from modest_tpu.models.voxelize import point_voxel_coords, voxelize_sparse

    gs = (16, 16, 32)  # nx, ny, nz
    pcr = [0, -4, -2, 8, 4, 2]
    vs = [0.5, 0.5, 0.125]
    pts = np.concatenate([
        rng.uniform([0, -4, -2], [8, 4, 2], (256, 3)),
        rng.rand(256, 1)], 1).astype(np.float32)
    coords, valid = point_voxel_coords(jnp.asarray(pts), pcr, vs, gs)
    vc, vf, vv, vk = voxelize_sparse(jnp.asarray(pts), valid, coords, 256,
                                     gs[0], gs[1], gs[2])
    shape_zyx = (gs[2] + 1, gs[1], gs[0])
    m = VoxelResBackBone8x()
    vf, vc, vk, vv = vf[None], vc[None], vk[None], vv[None]
    variables = m.init(jax.random.PRNGKey(0), vf, vc, vk, vv, shape_zyx)
    bev = m.apply(variables, vf, vc, vk, vv, shape_zyx,
                  mutable=["batch_stats"])[0]
    # same BEV contract as VoxelBackBone8x: (ny/8, nx/8, nz'*128)
    assert bev.shape[:3] == (1, 2, 2) and bev.shape[3] % 128 == 0
    assert np.isfinite(np.asarray(bev)).all()
    assert np.abs(np.asarray(bev)).sum() > 0
