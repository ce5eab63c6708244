"""Stack-variant pointnet2 ops + roiaware voxel pooling vs numpy oracles."""
import numpy as np
import pytest

import jax.numpy as jnp


def _ragged(rng, cnts, c=3, scale=10.0):
    flat = (rng.rand(int(np.sum(cnts)), c) * scale).astype(np.float32)
    return flat, np.asarray(cnts, np.int32)


def test_stack_padded_roundtrip():
    from modest_tpu.ops.pointnet2_stack import padded_to_stack, stack_to_padded

    rng = np.random.RandomState(0)
    flat, cnt = _ragged(rng, [5, 9, 2])
    padded, cnt2 = stack_to_padded(flat, cnt)
    assert padded.shape == (3, 9, 3)
    assert np.array_equal(padded_to_stack(padded, cnt2), flat)
    assert np.all(padded[2, 2:] == 0)


def test_fps_stack_respects_counts():
    from modest_tpu.ops.pointnet2_stack import farthest_point_sample_stack, stack_to_padded

    rng = np.random.RandomState(1)
    cnts = [40, 17, 64]
    flat, cnt = _ragged(rng, cnts)
    padded, _ = stack_to_padded(flat, cnt)
    idx = np.asarray(farthest_point_sample_stack(jnp.asarray(padded), jnp.asarray(cnt), 8))
    for b, c in enumerate(cnts):
        assert idx[b].max() < c, f"batch {b} sampled a padding row"
        # FPS spreads: 8 samples from >=17 points are all distinct
        assert len(set(idx[b].tolist())) == 8


def test_ball_query_stack_oracle():
    from modest_tpu.ops.pointnet2_stack import ball_query_stack, stack_to_padded

    rng = np.random.RandomState(2)
    flat, cnt = _ragged(rng, [120, 80], scale=5.0)
    q_flat, q_cnt = _ragged(rng, [30, 30], scale=5.0)
    xyz, _ = stack_to_padded(flat, cnt)
    new, _ = stack_to_padded(q_flat, q_cnt)
    r, ns = 1.0, 16
    idx, empty = ball_query_stack(jnp.asarray(xyz), jnp.asarray(cnt),
                                  jnp.asarray(new), jnp.asarray(q_cnt), r, ns)
    idx, empty = np.asarray(idx), np.asarray(empty)
    for b in range(2):
        for m in range(30):
            d = np.linalg.norm(xyz[b, : cnt[b]] - new[b, m], axis=1)
            inball = np.where(d < r)[0]
            if len(inball) == 0:
                assert empty[b, m]
                continue
            assert not empty[b, m]
            got = set(idx[b, m].tolist())
            assert got <= set(inball.tolist())
            assert len(got) == min(ns, len(inball)) or len(inball) > ns


def test_query_and_group_stack_zeroes_empty():
    from modest_tpu.ops.pointnet2_stack import query_and_group_stack

    xyz = jnp.asarray(np.array([[[0.0, 0, 0], [0.1, 0, 0]]], np.float32))
    cnt = jnp.asarray([2], jnp.int32)
    new = jnp.asarray(np.array([[[0.0, 0, 0], [50.0, 0, 0]]], np.float32))
    feats = jnp.ones((1, 2, 4), jnp.float32)
    out, empty = query_and_group_stack(xyz, cnt, feats, new, jnp.asarray([2], jnp.int32),
                                       radius=1.0, nsample=4)
    out, empty = np.asarray(out), np.asarray(empty)
    assert not empty[0, 0] and empty[0, 1]
    assert np.all(out[0, 1] == 0)
    assert np.any(out[0, 0] != 0)


def test_three_nn_stack_ignores_padding():
    from modest_tpu.ops.pointnet2_stack import three_nn_stack, stack_to_padded

    rng = np.random.RandomState(3)
    known_flat, kcnt = _ragged(rng, [10, 6])
    unk_flat, ucnt = _ragged(rng, [20, 20])
    known, _ = stack_to_padded(known_flat, kcnt)
    unk, _ = stack_to_padded(unk_flat, ucnt)
    d, idx = three_nn_stack(jnp.asarray(unk), jnp.asarray(ucnt),
                            jnp.asarray(known), jnp.asarray(kcnt))
    idx = np.asarray(idx)
    assert idx[0].max() < 10 and idx[1].max() < 6
    # exact check vs brute force for batch 1 (6 known pts)
    d2 = ((unk[1][:, None] - known[1, :6][None]) ** 2).sum(-1)
    ref = np.sort(d2, axis=1)[:, :3]
    np.testing.assert_allclose(np.sort(np.asarray(d)[1] ** 2, axis=1), ref,
                               rtol=1e-4, atol=1e-5)


def test_voxel_query_matches_brute_force():
    from modest_tpu.models.voxelize import point_voxel_coords, voxelize_sparse
    from modest_tpu.ops.pointnet2_stack import voxel_query

    rng = np.random.RandomState(4)
    pcr = np.array([0, -8, -2, 16, 8, 2], np.float32)
    vs = np.array([0.5, 0.5, 0.5], np.float32)
    nx, ny, nz = 32, 32, 8
    pts = np.concatenate(
        [rng.uniform(pcr[:3], pcr[3:], (400, 3)).astype(np.float32),
         np.zeros((112, 3), np.float32)], 0)
    valid = np.ones((512,), bool)
    valid[400:] = False
    coords, cvalid = point_voxel_coords(jnp.asarray(pts), pcr, vs, (nx, ny, nz))
    vc, feats, vvalid, vkeys = voxelize_sparse(
        jnp.asarray(pts), jnp.asarray(valid) & cvalid, coords, 256, nx, ny, nz)
    centers = (vc[:, ::-1].astype(jnp.float32) + 0.5) * vs[None] + pcr[:3]
    centers = jnp.where(vvalid[:, None], centers, 1e6)
    vkeys, vvalid, centers = vkeys[None], vvalid[None], centers[None]

    q = rng.uniform(pcr[:3] + 1, pcr[3:] - 1, (1, 16, 3)).astype(np.float32)
    radius, ns, mr = 1.2, 8, 3
    idx, empty = voxel_query(jnp.asarray(q), jnp.asarray([16], jnp.int32),
                             vkeys, vvalid, centers, radius, ns, mr, nx, ny, nz,
                             point_cloud_range=pcr, voxel_size=vs)
    idx, empty = np.asarray(idx), np.asarray(empty)
    cn = np.asarray(centers)[0]
    vv = np.asarray(vvalid)[0]
    for m in range(16):
        d = np.linalg.norm(cn[vv] - q[0, m], axis=1)
        true_hits = np.where(d < radius)[0]
        vmap_idx = np.where(vv)[0]
        if len(true_hits) == 0:
            assert empty[0, m]
            continue
        assert not empty[0, m]
        got = set(idx[0, m].tolist())
        assert got <= set(vmap_idx[true_hits].tolist())


@pytest.mark.parametrize("method", ["max", "avg"])
def test_roiaware_pool3d_oracle(method):
    from modest_tpu.ops.roiaware_pool3d import roiaware_pool3d

    rng = np.random.RandomState(5)
    rois = np.array([[0, 0, 0, 4.0, 2.0, 1.5, 0.3],
                     [6, 3, 0.5, 3.0, 1.6, 1.4, -1.1]], np.float32)
    pts = rng.uniform([-3, -3, -2], [9, 6, 2], (500, 3)).astype(np.float32)
    feats = rng.randn(500, 6).astype(np.float32)
    gx = gy = gz = 4
    out = np.asarray(roiaware_pool3d(jnp.asarray(rois), jnp.asarray(pts),
                                     jnp.asarray(feats), (gx, gy, gz), method))
    assert out.shape == (2, gx, gy, gz, 6)

    for n, roi in enumerate(rois):
        cx, cy, cz, dx, dy, dz, ry = roi
        local = pts - [cx, cy, cz]
        c, s = np.cos(-ry), np.sin(-ry)
        lx = local[:, 0] * c - local[:, 1] * s
        ly = local[:, 0] * s + local[:, 1] * c
        lz = local[:, 2]
        inb = (np.abs(lx) < dx / 2) & (np.abs(ly) < dy / 2) & (np.abs(lz) < dz / 2)
        ref = np.zeros((gx, gy, gz, 6), np.float32)
        cntg = np.zeros((gx, gy, gz), np.int32)
        for p in np.where(inb)[0]:
            ix = min(int((lx[p] + dx / 2) / dx * gx), gx - 1)
            iy = min(int((ly[p] + dy / 2) / dy * gy), gy - 1)
            iz = min(int((lz[p] + dz / 2) / dz * gz), gz - 1)
            if method == "max":
                ref[ix, iy, iz] = (feats[p] if cntg[ix, iy, iz] == 0
                                   else np.maximum(ref[ix, iy, iz], feats[p]))
            else:
                ref[ix, iy, iz] += feats[p]
            cntg[ix, iy, iz] += 1
        if method == "avg":
            ref = ref / np.maximum(cntg, 1)[..., None]
        np.testing.assert_allclose(out[n], ref, rtol=1e-4, atol=1e-5)


def test_roiaware_pool3d_grad():
    import jax
    from modest_tpu.ops.roiaware_pool3d import roiaware_pool3d

    rng = np.random.RandomState(6)
    rois = jnp.asarray([[0, 0, 0, 4.0, 2.0, 1.5, 0.0]], jnp.float32)
    pts = jnp.asarray(rng.uniform(-2, 2, (64, 3)), jnp.float32)
    feats = jnp.asarray(rng.randn(64, 4), jnp.float32)

    g = jax.grad(lambda f: roiaware_pool3d(rois, pts, f, (3, 3, 3), "max").sum())(feats)
    assert np.isfinite(np.asarray(g)).all()
    assert np.asarray(g).sum() > 0  # some points flow gradient
