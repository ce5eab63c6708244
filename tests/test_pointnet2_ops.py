"""PointNet++ op tests vs brute-force numpy oracles (reference kernel semantics)."""
import numpy as np
import jax.numpy as jnp

from modest_tpu.ops import pointnet2 as p2


def fps_oracle(pts, npoint):
    n = pts.shape[0]
    dists = np.full(n, 1e10)
    idxs = np.zeros(npoint, np.int32)
    last = 0
    for i in range(1, npoint):
        d = ((pts - pts[last]) ** 2).sum(-1)
        dists = np.minimum(dists, d)
        last = int(np.argmax(dists))
        idxs[i] = last
    return idxs


def test_fps_matches_oracle(rng):
    pts = rng.randn(2, 200, 3).astype(np.float32)
    got = np.asarray(p2.furthest_point_sample(jnp.asarray(pts), 32))
    for b in range(2):
        want = fps_oracle(pts[b], 32)
        np.testing.assert_array_equal(got[b], want)


def test_fps_spreads_points(rng):
    # FPS of a uniform square should cover it much better than the first-k
    pts = rng.uniform(0, 10, (1, 1000, 3)).astype(np.float32)
    idx = np.asarray(p2.furthest_point_sample(jnp.asarray(pts), 64))[0]
    sampled = pts[0, idx]
    from scipy.spatial import cKDTree

    d, _ = cKDTree(sampled).query(pts[0])
    assert d.max() < 2.5  # coverage radius of 64 FPS samples on 10x10x... cube


def ball_query_oracle(centers, pts, radius, nsample):
    m = centers.shape[0]
    out = np.zeros((m, nsample), np.int32)
    for i in range(m):
        d2 = ((pts - centers[i]) ** 2).sum(-1)
        hits = np.where(d2 < radius**2)[0]
        if len(hits) == 0:
            continue
        take = hits[:nsample]
        out[i, : len(take)] = take
        out[i, len(take):] = take[0]
    return out


def test_ball_query_matches_oracle(rng):
    pts = rng.uniform(-3, 3, (300, 3)).astype(np.float32)
    centers = pts[rng.choice(300, 40, replace=False)]
    d2 = np.asarray(p2.pairwise_dist2(jnp.asarray(centers), jnp.asarray(pts)))
    idx, valid = p2.ball_query_from_dist2(jnp.asarray(d2), 0.8, 16)
    want = ball_query_oracle(centers, pts, 0.8, 16)
    np.testing.assert_array_equal(np.asarray(idx), want)


def test_query_and_group_shapes(rng):
    xyz = rng.randn(2, 100, 3).astype(np.float32)
    new_xyz = xyz[:, :10]
    feats = rng.randn(2, 100, 7).astype(np.float32)
    d2 = p2.pairwise_dist2(jnp.asarray(new_xyz), jnp.asarray(xyz))
    g = p2.query_and_group(jnp.asarray(xyz), jnp.asarray(new_xyz), jnp.asarray(feats),
                           d2, 1.0, 8)
    assert g.shape == (2, 10, 8, 10)
    # every grouped offset lies within the query radius (hits are real points)
    off = np.asarray(g)[..., :3]
    assert (np.linalg.norm(off, axis=-1) <= 1.0 + 1e-5).all()
    # center 0 is point 0 → its first index-ordered hit is itself (offset 0)
    np.testing.assert_allclose(off[:, 0, 0], 0.0, atol=1e-6)


def test_three_interpolate_exact_at_known_points(rng):
    known = rng.randn(1, 50, 3).astype(np.float32)
    feats = rng.randn(1, 50, 4).astype(np.float32)
    out = p2.interpolate_features(jnp.asarray(known), jnp.asarray(known), jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(out), feats, atol=1e-4)


def test_three_interpolate_inverse_distance(rng):
    known = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0], [5, 5, 5]]], np.float32)
    feats = np.array([[[1.0], [2.0], [3.0], [100.0]]], np.float32)
    unknown = np.array([[[0.5, 0.0, 0.0]]], np.float32)
    out = float(p2.interpolate_features(jnp.asarray(unknown), jnp.asarray(known),
                                        jnp.asarray(feats))[0, 0, 0])
    # 3 NN are points 0,1,2 with d = .5, .5, sqrt(1.25)
    w = np.array([2.0, 2.0, 1 / np.sqrt(1.25)])
    w /= w.sum()
    want = (w * [1, 2, 3]).sum()
    np.testing.assert_allclose(out, want, rtol=1e-4)


def test_roipoint_pool3d(rng):
    pts = rng.uniform(-10, 10, (1, 500, 3)).astype(np.float32)
    pts[0, :100] = rng.uniform(-0.9, 0.9, (100, 3)) * [2, 1, 0.7]  # inside box 0
    feats = rng.randn(1, 500, 4).astype(np.float32)
    boxes = np.array([[[0, 0, 0, 4, 2, 1.5, 0.0], [50, 50, 0, 2, 2, 2, 0.3]]], np.float32)
    pooled, empty = p2.roipoint_pool3d(jnp.asarray(pts), jnp.asarray(feats),
                                       jnp.asarray(boxes), num_sampled_points=128)
    assert pooled.shape == (1, 2, 128, 7)
    assert int(empty[0, 0]) == 0
    assert int(empty[0, 1]) == 1  # far box has no points
    # all pooled points for box 0 lie inside it
    p = np.asarray(pooled)[0, 0, :, :3]
    assert (np.abs(p[:, 0]) <= 2.0 + 1e-5).all()
    assert (np.abs(p[:, 1]) <= 1.0 + 1e-5).all()
    assert (np.abs(p[:, 2]) <= 0.75 + 1e-5).all()
    # wrap-fill: with ~100 in-box points, slot 100+ repeats from the start
    np.testing.assert_allclose(np.asarray(pooled)[0, 0, 0], np.asarray(pooled)[0, 0, 100], atol=0)


def test_pallas_fps_matches_xla(rng):
    """Pallas kernel (interpret mode on CPU) == XLA reference implementation."""
    from modest_tpu.ops.pallas_fps import furthest_point_sample_pallas
    from modest_tpu.ops.pointnet2 import _furthest_point_sample_xla

    x = jnp.asarray(rng.randn(3, 256, 3).astype(np.float32) * 10)
    want = np.asarray(_furthest_point_sample_xla(x, 64))
    got = np.asarray(furthest_point_sample_pallas(x, 64, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_pallas_fps3d_matches_xla(rng):
    """Full-sublane (B, 8, N/8) kernel variant (N % 1024 == 0 path)."""
    from modest_tpu.ops.pallas_fps import furthest_point_sample_pallas
    from modest_tpu.ops.pointnet2 import _furthest_point_sample_xla

    x = jnp.asarray(rng.randn(2, 1024, 3).astype(np.float32) * 10)
    want = np.asarray(_furthest_point_sample_xla(x, 130))  # not a multiple of unroll
    got = np.asarray(furthest_point_sample_pallas(x, 130, interpret=True))
    np.testing.assert_array_equal(got, want)
