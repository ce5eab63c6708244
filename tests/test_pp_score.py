"""PP score parity tests against scipy cKDTree (the reference's backend)."""
import numpy as np
import pytest
from scipy.spatial import cKDTree

from modest_tpu.pipeline import pp_score


def kdtree_counts(query, traversals, radius):
    out = np.zeros((query.shape[0], len(traversals)), np.int64)
    for i, t in enumerate(traversals):
        out[:, i] = cKDTree(t).query_ball_point(query[:, :3], r=radius, return_length=True)
    return out


@pytest.mark.parametrize("seed", [0, 1])
def test_radius_counts_match_kdtree(seed):
    rng = np.random.RandomState(seed)
    query = rng.uniform(-20, 20, (1500, 3)).astype(np.float32)
    traversals = [
        rng.uniform(-20, 20, (rng.randint(3000, 9000), 3)).astype(np.float32)
        for _ in range(4)
    ]
    got = pp_score.radius_counts(query, traversals, radius=0.3, chunk=2048)
    want = kdtree_counts(query, traversals, 0.3)
    # fp32 matmul boundary flips: allow <=1 count difference on <0.5% of entries
    diff = np.abs(got - want)
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.005


def test_entropy_formula():
    counts = np.array([[4, 4, 4, 4], [8, 0, 0, 0], [0, 0, 0, 0], [1, 2, 3, 4]])
    H = pp_score.compute_ephe_score(counts)
    np.testing.assert_allclose(H[0], 1.0, atol=1e-6)  # uniform → max entropy
    np.testing.assert_allclose(H[1], 0.0, atol=1e-6)  # persistent → 0
    np.testing.assert_allclose(H[2], 0.0, atol=1e-6)  # empty → 0
    # matches the reference's exact expression incl. its epsilons
    P = counts / (counts.sum(1, keepdims=True) + 1e-8)
    want = (-P * np.log(P + 1e-8)).sum(1) / np.log(4)
    np.testing.assert_allclose(H, want, atol=1e-9)


def test_remove_center():
    pts = np.array([[0.0, 0.0, 0.0], [5.0, 5.0, 0.0], [-1.0, 0.5, 2.0]])
    kept = pp_score.remove_center(pts)
    np.testing.assert_array_equal(kept, [[5.0, 5.0, 0.0]])


def test_pp_score_end_to_end_synthetic(tmp_path, rng):
    """Build a tiny synthetic multi-traversal dataset on disk and check that
    ephemeral points (present in one traversal only) score higher than
    persistent structure (present in all)."""
    import os

    from modest_tpu.utils import kitti_io
    from modest_tpu.utils.pose import KITTI2NU_LYFT

    root = tmp_path / "data"
    for sub in ["velodyne", "oxts", "l2e"]:
        os.makedirs(root / sub)

    # static background points (a wall) + one "car" that exists only in seq 0
    wall = np.stack([np.linspace(5, 15, 200), np.full(200, 3.0), np.zeros(200)], 1)
    car = rng.uniform(0, 1, (50, 3)) + np.array([8.0, -2.0, 0.0])

    track_list = [[0], [1], [2]]
    for gid, seq in [(0, 0), (1, 1), (2, 2)]:
        pts = wall if seq != 0 else np.concatenate([wall, car])
        pts = pts + rng.randn(*pts.shape) * 0.01
        scan = np.concatenate([pts, np.zeros((len(pts), 1))], 1).astype(np.float32)
        kitti_io.save_velo_scan(root / "velodyne" / f"{gid:06d}.bin", scan)
        with open(root / "oxts" / f"{gid:06d}.txt", "w") as f:
            f.write("0 0 0 0 0 0\n")  # identity poses
        np.save(root / "l2e" / f"{gid:06d}.npy", np.eye(4, dtype=np.float32))

    valid_idx = {0: (0, 0, [(0, [0]), (1, [0]), (2, [0])])}
    index = pp_score.TraversalIndex(root, track_list, valid_idx)
    H = pp_score.pp_score_for_frame(index, 0, radius=0.3)

    assert H.shape == (250,)
    wall_score = H[:200].mean()
    car_score = H[200:].mean()
    assert wall_score > 0.9  # appears in all 3 traversals → high count entropy
    assert car_score < 0.1  # only own traversal → near-zero entropy


def test_q16_upload_bound_and_counts(rng):
    """The uint16 fixed-point query upload (VERDICT r4 item 5): the
    dequantized coordinates are within 1/(2·RES) per axis, and the sorted-
    pool counts computed from them match the f32-upload counts except for
    boundary flips within the quantization shell."""
    import jax.numpy as jnp

    from modest_tpu.ops.pallas_radius_count import BN

    n = 1500
    pts = rng.uniform(-60, 80, (n, 3)).astype(np.float32)
    n_pad = ((n + BN - 1) // BN) * BN
    qi, off = pp_score.quantize_queries_u16(pts, n_pad)
    deq = qi[:n].astype(np.float32) / pp_score.PP_Q16_RES + off
    assert np.abs(deq - pts).max() <= 0.5 / pp_score.PP_Q16_RES + 1e-5

    # one traversal of frames; compare q16 vs f32 sorted-pool counts and the
    # kdtree oracle (interpret mode runs the Pallas kernel on CPU)
    radius = np.float32(0.3)
    m_pad = 2048
    fr = rng.uniform(-60, 80, (2, m_pad, 3)).astype(np.float32)
    fmask = np.ones((2, m_pad), bool)
    rot = np.tile(np.eye(3, dtype=np.float32), (2, 1, 1))
    trans = np.zeros((2, 3), np.float32)

    q32 = np.full((n_pad, 3), 1e9, np.float32)
    q32[:n] = pts
    want = np.asarray(pp_score._sorted_pool_counts(
        jnp.asarray(q32), jnp.asarray(fr), jnp.asarray(fmask), jnp.asarray(rot),
        jnp.asarray(trans), radius, t_count=1, fmax=2, interpret=True))[:n]
    got = np.asarray(pp_score._sorted_pool_counts_q16(
        jnp.asarray(qi), jnp.asarray(off), jnp.int32(n), jnp.asarray(fr),
        jnp.asarray(fmask), jnp.asarray(rot), jnp.asarray(trans), radius,
        t_count=1, fmax=2, interpret=True))[:n]

    oracle = kdtree_counts(pts, [fr.reshape(-1, 3)], float(radius))
    assert np.abs(want - oracle).max() <= 1
    diff = np.abs(got - want)
    assert diff.max() <= 2  # only quantization-shell boundary flips
    assert (diff > 0).mean() < 0.01


def test_cached_pp_score_matches_uncached(tmp_path, rng):
    """The device-frame-cache path computes the same entropies as the
    combined-cloud path."""
    import os

    from modest_tpu.utils import kitti_io

    root = tmp_path / "data"
    for sub in ["velodyne", "oxts", "l2e"]:
        os.makedirs(root / sub)
    track_list = [[0, 1], [2, 3], [4, 5]]
    for gid in range(6):
        pts = rng.uniform(-20, 20, (3000, 3)).astype(np.float32)
        scan = np.concatenate([pts, np.zeros((3000, 1), np.float32)], 1)
        kitti_io.save_velo_scan(root / "velodyne" / f"{gid:06d}.bin", scan)
        (root / "oxts" / f"{gid:06d}.txt").write_text(
            f"{rng.randn()*0.5} {rng.randn()*0.5} 0 0 0 {rng.randn()*0.05}\n"
        )
        np.save(root / "l2e" / f"{gid:06d}.npy", np.eye(4, dtype=np.float32))

    valid_idx = {0: (0, 0, [(1, [0, 1]), (2, [0, 1])])}
    index = pp_score.TraversalIndex(root, track_list, valid_idx)

    want = pp_score.pp_score_for_frame(index, 0, radius=0.3)

    cache = pp_score.DeviceFrameCache(index._velo, chunk=1024)
    got = pp_score.pp_score_for_frame_cached(index, cache, 0, radius=0.3)
    np.testing.assert_allclose(got, want, atol=2e-5)
