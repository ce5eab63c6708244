"""Seed-label generation tests: RANSAC plane, PP-gated DBSCAN (vs sklearn),
rectangle fitting, cluster filters, NMS, end-to-end mask generation."""
import numpy as np
import pytest

from modest_tpu.pipeline import box_fit, clustering, ground_plane, seed_labels
from modest_tpu.utils.config import Config


def test_estimate_plane_flat_ground(rng):
    ground = np.stack(
        [rng.uniform(-20, 60, 4000), rng.uniform(-15, 15, 4000),
         rng.normal(-1.8, 0.02, 4000)], 1
    )
    clutter = np.stack(
        [rng.uniform(-20, 60, 500), rng.uniform(-15, 15, 500), rng.uniform(-1.0, 2.0, 500)], 1
    )
    ptc = np.concatenate([ground, clutter])
    plane = ground_plane.estimate_plane(ptc, max_hs=-1.5)
    # plane ~ z = -1.8 → normalized (0, 0, 1, 1.8) after the reference negation
    np.testing.assert_allclose(plane[:3], [0, 0, 1], atol=0.01)
    np.testing.assert_allclose(plane[3], 1.8, atol=0.05)
    # above_plane: ground removed, clutter kept
    mask = ground_plane.above_plane(ptc, plane, offset=0.1, only_range=((-70, 70), (-20, 20)))
    assert mask[:4000].mean() < 0.05
    assert mask[4000:].mean() > 0.9


def test_distance_to_plane_directional():
    plane = np.array([0.0, 0.0, 1.0, 1.8])
    pts = np.array([[0, 0, 0.2], [0, 0, -1.8], [0, 0, -3.0]])
    d = ground_plane.distance_to_plane(pts, plane, directional=True)
    np.testing.assert_allclose(d, [2.0, 0.0, -1.2], atol=1e-9)


def _sklearn_dbscan(xyz, pp, k, radius, eps, min_samples):
    import scipy.sparse as sp
    from sklearn import cluster, neighbors

    graph = neighbors.kneighbors_graph(xyz, n_neighbors=k)
    graph = graph.multiply(graph.T)
    graph = graph.multiply(neighbors.radius_neighbors_graph(xyz, radius=radius))
    graph.eliminate_zeros()
    graph = graph.tocsr()
    data = graph.data.copy()
    for r in range(graph.indptr.shape[0] - 1):
        sl = slice(graph.indptr[r], graph.indptr[r + 1])
        data[sl] = np.abs(pp[r] - pp[graph.indices[sl]])
    dist = sp.csr_matrix((data, graph.indices, graph.indptr), shape=graph.shape)
    return cluster.DBSCAN(metric="precomputed", eps=eps, min_samples=min_samples).fit(dist).labels_


def _pair_agreement(a, b):
    """Fraction of point pairs on which two clusterings agree (co-clustered
    incl. noise-vs-cluster distinctions)."""
    n = len(a)
    same_a = (a[:, None] == a[None, :]) & (a[:, None] >= 0)
    same_b = (b[:, None] == b[None, :]) & (b[:, None] >= 0)
    return (same_a == same_b).mean()


@pytest.mark.parametrize("seed", [0, 1])
def test_dbscan_matches_sklearn_on_blobs(seed):
    rng = np.random.RandomState(seed)
    blobs = []
    pps = []
    for i in range(4):
        center = rng.uniform(-25, 25, 3) * np.array([1, 1, 0.05])
        blobs.append(center + rng.randn(80, 3) * 0.4)
        pps.append(np.full(80, 0.1 + 0.02 * rng.rand(80)))
    # scattered background with high PP variance → mostly noise
    blobs.append(rng.uniform(-30, 30, (150, 3)) * np.array([1, 1, 0.1]))
    pps.append(rng.rand(150))
    xyz = np.concatenate(blobs).astype(np.float32)
    pp = np.concatenate(pps).astype(np.float32)

    ours = clustering.dbscan_pp(xyz, pp, n_neighbors=20, radius=2.0, eps=0.1, min_samples=10)
    ref = _sklearn_dbscan(xyz, pp, 20, 2.0, 0.1, 10)
    assert _pair_agreement(ours, ref) > 0.995
    # the 4 dense blobs must come out as 4 clusters
    assert len(set(ours[:320]) - {-1}) == 4


def test_dbscan_pp_gate_splits_touching_clusters(rng):
    """Two spatially-adjacent blobs with different PP must split."""
    a = rng.randn(100, 3) * 0.3 + [0, 0, 0]
    b = rng.randn(100, 3) * 0.3 + [1.2, 0, 0]
    xyz = np.concatenate([a, b]).astype(np.float32)
    pp = np.concatenate([np.full(100, 0.1), np.full(100, 0.9)]).astype(np.float32)
    labels = clustering.dbscan_pp(xyz, pp, n_neighbors=15, radius=2.0, eps=0.1, min_samples=5)
    la = set(labels[:100]) - {-1}
    lb = set(labels[100:]) - {-1}
    assert la and lb and not (la & lb)


def test_rectangle_fitters_axis_aligned(rng):
    pts = rng.uniform(0, 1, (500, 2)) * np.array([4.0, 1.6]) + np.array([10.0, 5.0])
    for name in ["closeness_to_edge", "variance_to_edge", "PCA", "min_zx_area_fit"]:
        corners, angle, area = box_fit.FIT_METHODS[name](pts)
        assert area < 4.0 * 1.6 * 1.15, name
        ext = corners.max(0) - corners.min(0)
        np.testing.assert_allclose(sorted(ext), [1.6, 4.0], atol=0.4)


def test_rectangle_fitters_rotated(rng):
    raw = rng.uniform(0, 1, (800, 2)) * np.array([4.0, 1.6])
    theta = 0.5
    R = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    pts = raw @ R.T + np.array([3.0, -2.0])
    corners, angle, area = box_fit.closeness_rectangle(pts)
    assert abs(area - 4 * 1.6) < 0.8
    # recovered angle ≈ theta modulo 90°
    d = (angle - theta) % (np.pi / 2)
    assert min(d, np.pi / 2 - d) < 0.05
    # l >= w convention after the 90° flip
    l = np.linalg.norm(corners[0] - corners[1])
    w = np.linalg.norm(corners[0] - corners[-1])
    assert l >= w


def test_get_obj_geometry(rng):
    """A synthetic box-shaped cluster in rect camera coords (y down)."""
    n = 600
    x = rng.uniform(-2, 2, n) + 5.0
    z = rng.uniform(-0.9, 0.9, n) + 20.0
    y = rng.uniform(-1.5, 0.0, n)  # bottom at y=0
    cluster = np.stack([x, y, z], 1)
    obj = box_fit.get_obj(cluster, cluster)
    np.testing.assert_allclose(obj.t[0], 5.0, atol=0.1)
    np.testing.assert_allclose(obj.t[2], 20.0, atol=0.1)
    np.testing.assert_allclose(obj.t[1], 0.0, atol=0.05)  # bottom = max y
    np.testing.assert_allclose(obj.h, 1.5, atol=0.1)
    np.testing.assert_allclose(sorted([obj.l, obj.w]), [1.8, 4.0], atol=0.15)


def test_filter_labels_matches_cluster_loop():
    """Vectorized filter_labels ≡ the per-cluster is_valid_cluster loop."""
    rng = np.random.RandomState(3)
    n = 4000
    ptc = np.stack([rng.uniform(-40, 40, n), rng.uniform(-40, 40, n),
                    rng.uniform(-1.9, 1.0, n), np.zeros(n)], 1).astype(np.float32)
    # dense low-z slab so estimate_plane finds the ground
    ptc[:2000, 2] = rng.normal(-1.8, 0.02, 2000)
    pp = rng.uniform(0, 1, n).astype(np.float32)
    labels = rng.randint(-1, 25, n).astype(np.int64)
    labels[rng.rand(n) < 0.3] = -1
    # a couple of empty / tiny cluster ids
    labels[labels == 7] = -1
    labels[np.where(labels == 9)[0][5:]] = -1

    kwargs = dict(min_points=10, max_volume=40, min_volume=0.5,
                  max_min_height=1.0, min_max_height=0.2,
                  percentile=20, min_percentile_pp_score=0.7)
    got = seed_labels.filter_labels(ptc, pp, labels, **kwargs)

    from modest_tpu.pipeline.ground_plane import estimate_plane

    ref = labels.copy()
    plane = estimate_plane(ptc, max_hs=-1.5, ptc_range=((-70, 70), (-50, 50)))
    for i in range(ref.max() + 1):
        sel = ref == i
        if not seed_labels.is_valid_cluster(ptc[sel, :3], pp[sel], plane, **kwargs):
            ref[sel] = -1
    keys = np.unique(ref)
    ref = np.searchsorted(keys, ref)
    np.testing.assert_array_equal(got, ref)


def test_is_valid_cluster_filters():
    plane = np.array([0.0, 0.0, 1.0, 1.8])
    grounded = np.stack([np.zeros(50), np.zeros(50), np.linspace(-1.7, 0.0, 50)], 1)
    low_pp = np.full(50, 0.1)
    assert seed_labels.is_valid_cluster(grounded, low_pp, plane,
                                        max_min_height=1.0, min_max_height=0.5,
                                        percentile=20, min_percentile_pp_score=0.7)
    # floating cluster fails max_min_height
    floating = grounded + [0, 0, 2.0]
    assert not seed_labels.is_valid_cluster(floating, low_pp, plane,
                                            max_min_height=1.0, min_max_height=0.5,
                                            percentile=20, min_percentile_pp_score=0.7)
    # flat cluster fails min_max_height
    flat = grounded.copy()
    flat[:, 2] = -1.75
    assert not seed_labels.is_valid_cluster(flat, low_pp, plane,
                                            max_min_height=1.0, min_max_height=0.5,
                                            percentile=20, min_percentile_pp_score=0.7)
    # persistent (high PP) cluster fails the ephemerality gate
    assert not seed_labels.is_valid_cluster(grounded, np.full(50, 0.9), plane,
                                            max_min_height=1.0, min_max_height=0.5,
                                            percentile=20, min_percentile_pp_score=0.7)
    # too few points
    assert not seed_labels.is_valid_cluster(grounded[:5], low_pp[:5], plane, min_points=10,
                                            max_min_height=1.0, min_max_height=0.5,
                                            percentile=20, min_percentile_pp_score=0.7)


def _mk_obj(x, z, l, w, ry=0.0, h=1.5, score=None):
    import types

    o = types.SimpleNamespace()
    o.t = np.array([x, 0.0, z])
    o.l, o.w, o.h, o.ry = l, w, h, ry
    o.volume = l * w * h
    if score is not None:
        o.score = score
    return o


def test_objs_nms_area_rank():
    objs = [
        _mk_obj(0, 10, 4, 2),      # big box
        _mk_obj(0.2, 10.1, 2, 1),  # small overlapping box → suppressed
        _mk_obj(20, 10, 4, 2),     # far box → kept
    ]
    kept = seed_labels.objs_nms(objs, nms_threshold=0.1)
    assert len(kept) == 2
    assert kept[0] is objs[0] and kept[1] is objs[2]


def test_objs_nms_score_rank():
    objs = [
        _mk_obj(0, 10, 2, 1, score=0.2),
        _mk_obj(0.1, 10, 2, 1, score=0.9),  # higher score wins despite order
    ]
    kept = seed_labels.objs_nms(objs, use_score_rank=True, nms_threshold=0.1)
    assert len(kept) == 1 and kept[0] is objs[1]


def test_filter_by_ppscore():
    rng = np.random.RandomState(0)
    pts = rng.uniform(-1, 1, (200, 3)) * [2, 0.7, 1] + [0, -0.7, 10]
    obj = _mk_obj(0, 10, 4, 2, h=1.5)
    pp_low = np.full(200, 0.1)
    pp_high = np.full(200, 0.9)
    assert seed_labels.filter_by_ppscore(pts, pp_low, obj, percentile=20, threshold=0.7)
    assert not seed_labels.filter_by_ppscore(pts, pp_high, obj, percentile=20, threshold=0.7)
    # empty box → rejected
    far = _mk_obj(100, 100, 1, 1)
    assert not seed_labels.filter_by_ppscore(pts, pp_low, far)


def _identity_calib():
    from modest_tpu.utils.kitti_io import Calibration

    # velodyne → rect mapping: x_r = -y_v, y_r = -z_v, z_r = x_v (standard KITTI-ish)
    V2C = np.array([[0.0, -1.0, 0.0, 0.0], [0.0, 0.0, -1.0, 0.0], [1.0, 0.0, 0.0, 0.0]])
    P2 = np.array([[700.0, 0.0, 600.0, 0.0], [0.0, 700.0, 200.0, 0.0], [0.0, 0.0, 1.0, 0.0]])
    return Calibration({"P2": P2, "P3": P2, "R0_rect": np.eye(3), "Tr_velo_to_cam": V2C})


def default_mask_cfg():
    return Config(
        {
            "plane_estimate": {"range": [[-70, 70], [-20, 20]], "max_hs": -1.5, "offset": 0.05},
            "limit_range": [[-70, 70], [-40, 40]],
            "graph": {"neighbor_type": "radius_mutual_knn", "affinity_type": "l1",
                      "n_neighbors": 30, "radius": 2.0},
            "clustering": {"method": "DBSCAN", "DBSCAN": {"eps": 0.1, "min_samples": 10}},
            "filtering": {"min_points": 10, "max_volume": 120, "min_volume": 0.5,
                          "min_max_height": 0.5, "max_min_height": 1.0,
                          "percentile": 20, "min_percentile_pp_score": 0.7},
            "bbox_gen": {"fit_method": "closeness_to_edge"},
        }
    )


def test_generate_mask_end_to_end(rng):
    """Synthetic scene: ground plane + one ephemeral car + persistent wall →
    exactly the car comes out as a seed box."""
    ground = np.stack(
        [rng.uniform(0, 60, 6000), rng.uniform(-20, 20, 6000), rng.normal(-1.8, 0.01, 6000)], 1
    )
    car = rng.uniform(0, 1, (400, 3)) * [4.0, 1.8, 1.4] + [20.0, 3.0, -1.75]
    wall = np.stack(
        [rng.uniform(30, 34, 500), np.full(500, -10.0) + rng.randn(500) * 0.05,
         rng.uniform(-1.8, 1.0, 500)], 1
    )
    pts = np.concatenate([ground, car, wall]).astype(np.float32)
    ptc = np.concatenate([pts, np.zeros((len(pts), 1), np.float32)], 1)
    pp = np.concatenate(
        [np.full(6000, 0.8), np.full(400, 0.05), np.full(500, 0.85)]
    ).astype(np.float32)

    labels, objs = seed_labels.generate_mask_for_frame(ptc, pp, _identity_calib(), default_mask_cfg())
    assert len(objs) == 1, f"expected 1 seed box, got {len(objs)}"
    # car points labeled with the surviving cluster id (1)
    assert (labels[6000:6400] == 1).mean() > 0.9
    assert (labels[:6000] == 0).mean() > 0.98  # ground is background
    assert (labels[6400:] == 0).all()  # persistent wall filtered by PP gate

    obj = objs[0]
    # box dims ≈ car dims (camera frame: l/w from BEV, h ≈ 1.4)
    np.testing.assert_allclose(sorted([obj.l, obj.w]), [1.8, 4.0], atol=0.3)
    np.testing.assert_allclose(obj.h, 1.4, atol=0.25)
    assert 0.5 < obj.volume < 120


def test_objs2label_roundtrip(tmp_path):
    calib = _identity_calib()
    obj = _mk_obj(2.0, 20.0, 4.2, 1.8, ry=0.3, h=1.5)
    text = seed_labels.objs2label([obj], calib)
    f = tmp_path / "000000.txt"
    f.write_text(text + "\n")
    from modest_tpu.utils.kitti_io import read_label

    parsed = read_label(f)[0]
    assert parsed.cls_type == "Dynamic"
    np.testing.assert_allclose([parsed.l, parsed.w, parsed.h], [4.2, 1.8, 1.5], atol=1e-3)
    np.testing.assert_allclose(parsed.t, obj.t, atol=1e-3)
    np.testing.assert_allclose(parsed.ry, 0.3, atol=1e-4)
    # alpha written per the reference formula
    np.testing.assert_allclose(parsed.alpha, -np.arctan2(2.0, 20.0) + 0.3, atol=1e-3)


def test_combine_labels_fusion(rng):
    calib = _identity_calib()
    pts_rect = rng.uniform(-1, 1, (300, 3)) * [2, 0.7, 1] + [0, -0.7, 10]
    pp = np.full(300, 0.05)
    det_preds = {
        "location": np.array([[0.0, 0.0, 10.0], [50.0, 0.0, 90.0]]),
        "dimensions": np.array([[4.0, 1.5, 2.0], [4.0, 1.5, 2.0]]),  # l h w
        "rotation_y": np.array([0.0, 0.0]),
        "score": np.array([0.9, 0.8]),
    }
    gen_objs = [_mk_obj(0.1, 10.0, 4, 2)]  # overlaps detection 1 → NMS removes it
    cfg = Config(
        {
            "det_filtering": {"pp_score_percentile": 50, "pp_score_threshold": 0.5,
                              "score_filtering": -1},
            "nms": {"threshold": 0.1},
            "fov_only": False,
            "image_shape": [1024, 1224],
        }
    )
    objs = seed_labels.combine_labels_for_frame(det_preds, gen_objs, pts_rect, pp, calib, cfg)
    # detection 2 has no points → PP filter rejects; detection 1 survives and
    # suppresses the overlapping seed box (score −999+8 < 0.9)
    assert len(objs) == 1
    assert objs[0].score == 0.9


def test_tracking_association():
    from modest_tpu.pipeline.tracking import build_tracks, interpolate_track

    # two objects moving along x, one appearing later
    frames = {}
    for f in range(5):
        a = [5.0 + f, 0.0, 0.0, 4, 2, 1.5, 0.0]
        b = [20.0, 10.0 + 0.5 * f, 0.0, 4, 2, 1.5, 1.0]
        frames[f] = np.array([a, b]) if f >= 2 else np.array([a])
    tracks = build_tracks(frames, iou_threshold=0.1)
    assert len(tracks) == 2
    lengths = sorted(len(t) for t in tracks)
    assert lengths == [3, 5]
    long = max(tracks, key=len)
    # interpolation at an observed frame returns that box
    np.testing.assert_allclose(interpolate_track(long, 2)[0], 7.0, atol=1e-9)
    # midpoint between frames
    mid = interpolate_track(long, 2)  # integer frames only here
    assert np.isfinite(mid).all()


def test_batched_closeness_matches_per_cluster():
    """closeness_angles_batched (one device call for all clusters) must pick
    the same argmax angle as the per-cluster numpy scan."""
    from modest_tpu.pipeline.box_fit import (
        closeness_angles_batched,
        closeness_rectangle,
    )

    rng = np.random.RandomState(7)
    clusters = []
    for i in range(5):
        n = rng.randint(20, 400)
        ang = rng.uniform(0, np.pi / 2)
        c, s = np.cos(ang), np.sin(ang)
        box = rng.uniform(-1, 1, (n, 2)) * [2.0, 0.8]
        clusters.append((box @ np.array([[c, s], [-s, c]])).astype(np.float32)
                        + rng.uniform(-20, 20, 2).astype(np.float32))
    angles = closeness_angles_batched(clusters)
    for cl, ang in zip(clusters, angles):
        _, ref_angle, _ = closeness_rectangle(cl)
        # _finalize may add pi/2; compare pre-flip scan argmax modulo that
        assert min(abs(ang - ref_angle), abs(ang + np.pi / 2 - ref_angle),
                   abs(ang - np.pi / 2 - ref_angle)) < 0.35 / 180 * np.pi


def test_dbscan_windowed_matches_full():
    """Points spread along x force the windowed kNN (w < n_pad); its labels
    must match the full-matrix path exactly (windowing is exact for the
    mutual-kNN ∧ radius graph — see _knn_windowed)."""
    from modest_tpu.pipeline import clustering as cl

    rng = np.random.RandomState(11)
    # 4 well-separated clusters along a 400 m x-range + background noise
    pts = []
    for cx in [20.0, 120.0, 240.0, 380.0]:
        pts.append(rng.randn(300, 3).astype(np.float32) * 0.3 + [cx, 0, 0])
    pts.append(np.stack([rng.uniform(0, 400, 2000), rng.uniform(-50, 50, 2000),
                         rng.uniform(-2, 2, 2000)], 1).astype(np.float32))
    xyz = np.concatenate(pts)
    pp = np.full(len(xyz), 0.5, np.float32)

    labels_w = cl.dbscan_pp(xyz, pp, n_neighbors=30, radius=2.0, eps=1.0,
                            min_samples=10, row_chunk=256)

    # force the full path by monkeypatching the window decision
    orig = cl._knn_windowed
    try:
        cl._knn_windowed = None  # windowed path must not be needed below
        import jax.numpy as jnp
        n = len(xyz)
        n_pad = max(256, 1 << (n - 1).bit_length())
        x = np.full((n_pad, 3), 1e6, np.float32)
        x[:n] = xyz
        p = np.zeros(n_pad, np.float32)
        p[:n] = pp
        valid = np.zeros(n_pad, bool)
        valid[:n] = True
        idx, d2 = cl._knn(jnp.asarray(x), jnp.asarray(valid), 30, row_chunk=256)
        raw, _ = cl._cluster_from_knn(idx, d2, jnp.asarray(p), jnp.asarray(valid),
                                      np.float32(4.0), np.float32(1.0), 10)
        raw = np.asarray(raw[:n]).astype(np.int64)
        mask = raw >= 0
        labels_f = np.full(n, -1, np.int64)
        vals, first_pos = np.unique(raw[mask], return_index=True)
        rank = np.empty(len(vals), np.int64)
        rank[np.argsort(first_pos, kind="stable")] = np.arange(len(vals))
        labels_f[mask] = rank[np.searchsorted(vals, raw[mask])]
    finally:
        cl._knn_windowed = orig

    # same partition (ids may permute): compare via pair-agreement on a sample
    assert (labels_w >= 0).sum() == (labels_f >= 0).sum()
    sample = rng.choice(len(xyz), 400, replace=False)
    a = labels_w[sample]
    b = labels_f[sample]
    same_a = a[:, None] == a[None, :]
    same_b = b[:, None] == b[None, :]
    noise = (a[:, None] < 0) | (a[None, :] < 0)
    agree = (same_a == same_b) | noise
    assert agree.mean() > 0.999
    # windowed path was actually taken: verify w < n_pad for this layout
    xs = np.sort(xyz[:, 0])
    n_pad = 1 << (len(xyz) - 1).bit_length()
    assert len(xyz) > 2048  # sanity: big enough that windowing matters


def test_dbscan_pp_many_matches_single():
    """Batched multi-frame clustering ≡ per-frame dbscan_pp (padding/window
    buckets shared across the group don't change the graph)."""
    from modest_tpu.pipeline.clustering import dbscan_pp, dbscan_pp_many

    frames = []
    for s, n in enumerate([3000, 1500, 2600]):
        r = np.random.RandomState(s)
        xyz = r.uniform(-30, 30, (n, 3)).astype(np.float32)
        pp = r.uniform(0, 1, n).astype(np.float32)
        for b in range(4):  # dense ephemeral blobs → clusters
            c = r.uniform(-20, 20, 3)
            sl = slice(b * 150, (b + 1) * 150)
            xyz[sl] = (c + r.uniform(-0.8, 0.8, (150, 3))).astype(np.float32)
            pp[sl] = 0.1 + r.uniform(0, 0.05, 150).astype(np.float32)
        frames.append((xyz, pp))

    kw = dict(n_neighbors=20, radius=2.0, eps=0.15, min_samples=5, row_chunk=256)
    many = dbscan_pp_many(frames, **kw)
    assert len(many) == len(frames)
    for (xyz, pp), got in zip(frames, many):
        exp = dbscan_pp(xyz, pp, **kw)
        np.testing.assert_array_equal(got, exp)
        assert exp.max() >= 0  # the blobs actually clustered


def test_generate_masks_for_frames_matches_single():
    from modest_tpu.pipeline.seed_labels import (generate_mask_for_frame,
                                                 generate_masks_for_frames)
    from modest_tpu.utils.config import Config
    from modest_tpu.utils.kitti_io import Calibration

    cfg = Config({
        "plane_estimate": {"range": [[-70, 70], [-20, 20]], "max_hs": -1.5,
                           "offset": 0.05},
        "limit_range": [[-70, 70], [-40, 40]],
        "graph": {"neighbor_type": "radius_mutual_knn", "affinity_type": "l1",
                  "n_neighbors": 30, "radius": 2.0},
        "clustering": {"method": "DBSCAN", "DBSCAN": {"eps": 0.1, "min_samples": 8}},
        "filtering": {"min_points": 10, "max_volume": 120, "min_volume": 0.5,
                      "min_max_height": 0.5, "max_min_height": 1.0,
                      "percentile": 20, "min_percentile_pp_score": 0.7},
        "bbox_gen": {"fit_method": "closeness_to_edge"},
    })
    P2 = np.array([[700.0, 0, 600, 0], [0, 700.0, 200, 0], [0, 0, 1.0, 0]])
    V2C = np.array([[0.0, -1, 0, 0], [0, 0, -1, 0], [1.0, 0, 0, 0]])
    calib = Calibration({"P2": P2, "P3": P2, "R0_rect": np.eye(3),
                         "Tr_velo_to_cam": V2C})

    frames = []
    for s in range(2):
        r = np.random.RandomState(40 + s)
        n_g = 6000
        ground = np.stack([r.uniform(0, 70, n_g), r.uniform(-30, 30, n_g),
                           r.normal(-1.8, 0.03, n_g)], 1)
        pts = [ground]
        for b in range(4):
            c = r.uniform([10, -20, -1.5], [60, 20, -1.2])
            pts.append(c + r.uniform(-1, 1, (400, 3)) * [2.0, 0.9, 0.7])
        ptc = np.concatenate(pts).astype(np.float32)
        ptc = np.concatenate([ptc, np.zeros((len(ptc), 1), np.float32)], 1)
        pp = r.uniform(0, 1, len(ptc)).astype(np.float32)
        pp[:n_g] = 0.85
        pp[n_g:] = 0.05
        frames.append((ptc, pp))

    batched = generate_masks_for_frames(frames, [calib, calib], cfg)
    for (ptc, pp), (lb_b, objs_b) in zip(frames, batched):
        lb_s, objs_s = generate_mask_for_frame(ptc, pp, calib, cfg)
        np.testing.assert_array_equal(lb_b, lb_s)
        assert len(objs_b) == len(objs_s) > 0
        for ob, os_ in zip(objs_b, objs_s):
            np.testing.assert_allclose(ob.t, os_.t, atol=1e-6)
            np.testing.assert_allclose([ob.l, ob.w, ob.h, ob.ry],
                                       [os_.l, os_.w, os_.h, os_.ry], atol=1e-6)


def test_smooth_pp_score_isolated_point_keeps_value():
    """Radius-mode smoothing: a point with no neighbor in radius keeps its
    own score (an all-zero weight row used to overwrite it with 0 —
    reclassifying a persistent point as maximally ephemeral)."""
    from modest_tpu.pipeline.clustering import smooth_pp_score

    rng = np.random.RandomState(0)
    ptc = rng.uniform(0, 2, (40, 3)).astype(np.float32)
    ptc[0] = [500.0, 500.0, 0.0]  # isolated
    pp = rng.uniform(0, 1, 40).astype(np.float32)
    pp[0] = 0.93
    out = smooth_pp_score(ptc, pp, neighbor_type="radius", radius=1.0,
                          n_neighbors=10, num_iterations=5)
    np.testing.assert_allclose(out[0], 0.93, atol=1e-6)


def test_first_slurm_host():
    from modest_tpu.parallel.multihost import _first_slurm_host

    assert _first_slurm_host("tpu-vm-[001-004,007],other") == "tpu-vm-001"
    assert _first_slurm_host("node17,node18") == "node17"
    assert _first_slurm_host("localhost") == "localhost"
    assert _first_slurm_host("gpu-a-3") == "gpu-a-3"
