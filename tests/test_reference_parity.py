"""Golden-parity tests against the reference's OWN code (/root/reference).

VERDICT r1 item 4: all round-1 parity was vs re-derived oracles; these tests
import the reference's pure-Python/numpy parts directly (with numba / CUDA /
hydra stubbed) and assert same-input equality:

  (a) the KITTI AP harness — reference eval.py (numba no-op stub, rotated
      overlaps delegated to OUR bev_box_overlap so both harnesses see
      identical geometry and the matcher/threshold/AP protocol is what's
      under test) vs modest_tpu.eval.kitti_eval, to 1e-6;
  (b) rectangle fitters (pointcloud_utils.py:88-275), get_relative_pose
      (pre_compute_pp_score.py:27-28), Calibration round-trips
      (kitti_util.py:200-372).
"""
import sys
import types
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")

# ---------------------------------------------------------------------------
# import machinery: stub numba / CUDA ext / hydra / pyquaternion
# ---------------------------------------------------------------------------


def _numba_stub():
    numba = types.ModuleType("numba")

    def jit(*args, **kwargs):
        if len(args) == 1 and callable(args[0]) and not kwargs:
            return args[0]

        def deco(fn):
            return fn

        return deco

    numba.jit = jit
    numba.njit = jit
    numba.prange = range
    return numba


@pytest.fixture(scope="module")
def ref_eval():
    """Reference eval.py as a module, numba-stubbed, rotated IoU delegated to
    our implementation (same geometry on both sides → protocol parity)."""
    from modest_tpu.eval import kitti_eval as ours

    sys.modules.setdefault("numba", _numba_stub())
    pkg = types.ModuleType("ref_kitti_eval_pkg")
    pkg.__path__ = [str(REF / "downstream/OpenPCDet/pcdet/datasets/kitti/kitti_object_eval_python")]
    sys.modules["ref_kitti_eval_pkg"] = pkg
    rot = types.ModuleType("ref_kitti_eval_pkg.rotate_iou")
    rot.rotate_iou_gpu_eval = lambda boxes, qboxes, criterion=-1: ours.bev_box_overlap(
        np.asarray(boxes, np.float64), np.asarray(qboxes, np.float64), criterion
    )
    sys.modules["ref_kitti_eval_pkg.rotate_iou"] = rot
    import importlib

    return importlib.import_module("ref_kitti_eval_pkg.eval")


@pytest.fixture(scope="module")
def ref_pointcloud_utils():
    """Reference generate_cluster_mask/utils/pointcloud_utils.py (CUDA ext
    stubbed; the rectangle fitters under test are pure numpy/scipy)."""
    sys.modules.setdefault("iou3d_nms_cuda", types.ModuleType("iou3d_nms_cuda"))
    if "scipy.ndimage.interpolation" not in sys.modules:
        # removed in scipy>=1.10; the reference dead-imports `rotate` from it
        import scipy.ndimage

        shim = types.ModuleType("scipy.ndimage.interpolation")
        shim.rotate = scipy.ndimage.rotate
        sys.modules["scipy.ndimage.interpolation"] = shim
    sys.path.insert(0, str(REF / "generate_cluster_mask"))
    try:
        from utils import pointcloud_utils  # noqa: F401

        return pointcloud_utils
    finally:
        sys.path.pop(0)


@pytest.fixture(scope="module")
def ref_pp_score_module():
    """Reference pre_compute_pp_score.py (hydra/omegaconf/pyquaternion
    stubbed; get_relative_pose + compute_ephe_score are what's under test)."""
    hydra = types.ModuleType("hydra")

    def main(*a, **k):
        def deco(fn):
            return fn

        return deco

    hydra.main = main
    omegaconf = types.ModuleType("omegaconf")
    omegaconf.DictConfig = dict
    omegaconf.OmegaConf = types.SimpleNamespace(to_yaml=lambda c: str(c))
    pyquaternion = types.ModuleType("pyquaternion")

    class Quaternion:
        def __init__(self, axis, angle):
            axis = np.asarray(axis, float)
            axis = axis / np.linalg.norm(axis)
            half = angle / 2.0
            self._q = np.concatenate([[np.cos(half)], np.sin(half) * axis])

        @property
        def transformation_matrix(self):
            w, x, y, z = self._q
            t = np.eye(4)
            t[:3, :3] = np.array(
                [
                    [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                    [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                    [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
                ]
            )
            return t

    pyquaternion.Quaternion = Quaternion
    for name, mod in [("hydra", hydra), ("omegaconf", omegaconf),
                      ("pyquaternion", pyquaternion)]:
        sys.modules.setdefault(name, mod)
    sys.path.insert(0, str(REF / "generate_cluster_mask"))
    try:
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "ref_pre_compute_pp_score",
            REF / "generate_cluster_mask" / "pre_compute_pp_score.py",
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        sys.path.pop(0)


# ---------------------------------------------------------------------------
# synthetic KITTI-anno generator
# ---------------------------------------------------------------------------


def _make_annos(rng, n_frames=12, cls="Dynamic", max_gt=8, max_dt=10):
    gt_annos, dt_annos = [], []
    for _ in range(n_frames):
        n_gt = rng.randint(0, max_gt)
        n_dt = rng.randint(0, max_dt)
        names = [cls] * n_gt
        # a few distractor classes + DontCare to exercise clean_data
        for i in range(n_gt):
            if rng.rand() < 0.15:
                names[i] = "Car"
            elif rng.rand() < 0.1:
                names[i] = "DontCare"
        loc = np.stack(
            [rng.uniform(-30, 30, n_gt), rng.uniform(0.5, 2.5, n_gt),
             rng.uniform(2, 78, n_gt)], axis=1
        )
        dims = np.stack(
            [rng.uniform(3, 5, n_gt), rng.uniform(1.3, 1.9, n_gt),
             rng.uniform(1.5, 2.1, n_gt)], axis=1
        )  # (l, h, w)
        gt = {
            "name": np.array(names),
            "truncated": rng.uniform(0, 0.4, n_gt),
            "occluded": rng.randint(0, 3, n_gt).astype(np.float64),
            "alpha": rng.uniform(-np.pi, np.pi, n_gt),
            "bbox": np.sort(rng.uniform(0, 370, (n_gt, 4)), axis=1),
            "dimensions": dims,
            "location": loc,
            "rotation_y": rng.uniform(-np.pi, np.pi, n_gt),
        }
        # detections: jittered copies of random gts + pure noise
        rows = []
        for _ in range(n_dt):
            if n_gt > 0 and rng.rand() < 0.7:
                j = rng.randint(n_gt)
                rows.append((loc[j] + rng.randn(3) * 0.4,
                             dims[j] * rng.uniform(0.9, 1.1, 3),
                             gt["rotation_y"][j] + rng.randn() * 0.1))
            else:
                rows.append((np.array([rng.uniform(-30, 30), rng.uniform(0.5, 2.5),
                                       rng.uniform(2, 78)]),
                             np.array([rng.uniform(3, 5), rng.uniform(1.3, 1.9),
                                       rng.uniform(1.5, 2.1)]),
                             rng.uniform(-np.pi, np.pi)))
        dloc = np.stack([r[0] for r in rows]) if rows else np.zeros((0, 3))
        ddims = np.stack([r[1] for r in rows]) if rows else np.zeros((0, 3))
        dry = np.array([r[2] for r in rows]) if rows else np.zeros(0)
        dt = {
            "name": np.array([cls] * n_dt),
            "truncated": np.zeros(n_dt),
            "occluded": np.zeros(n_dt),
            "alpha": np.full(n_dt, -10.0),
            "bbox": np.sort(rng.uniform(0, 370, (n_dt, 4)), axis=1),
            "dimensions": ddims,
            "location": dloc,
            "rotation_y": dry,
            "score": rng.uniform(0.01, 1.0, n_dt),
        }
        gt_annos.append(gt)
        dt_annos.append(dt)
    return gt_annos, dt_annos


# ---------------------------------------------------------------------------
# (a) AP harness parity
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_range_eval_parity(ref_eval):
    from modest_tpu.eval.kitti_eval import get_range_eval_result

    rng = np.random.RandomState(0)
    gt_annos, dt_annos = _make_annos(rng, n_frames=8)
    _, ref_dict = ref_eval.get_range_eval_result(gt_annos, dt_annos, ["Dynamic"])
    _, our_dict = get_range_eval_result(gt_annos, dt_annos, ["Dynamic"])
    assert set(ref_dict) == set(our_dict)
    for k in sorted(ref_dict):
        np.testing.assert_allclose(our_dict[k], ref_dict[k], atol=1e-6, err_msg=k)


@pytest.mark.slow
def test_official_eval_do_eval_parity(ref_eval):
    """All three metrics (bbox / bev / 3d), difficulties 0-2, R11 + R40,
    Car class (exercises occlusion/truncation difficulty gates)."""
    from modest_tpu.eval.kitti_eval import do_eval

    rng = np.random.RandomState(1)
    gt_annos, dt_annos = _make_annos(rng, n_frames=6, cls="Car")
    overlap_0_7 = np.array([[0.7, 0.5, 0.5, 0.7, 0.5, 0.7, 0.5],
                            [0.7, 0.5, 0.5, 0.7, 0.5, 0.7, 0.5],
                            [0.7, 0.5, 0.5, 0.7, 0.5, 0.7, 0.5]])
    overlap_0_5 = np.array([[0.7, 0.5, 0.5, 0.7, 0.5, 0.5, 0.5],
                            [0.5, 0.25, 0.25, 0.5, 0.25, 0.5, 0.25],
                            [0.5, 0.25, 0.25, 0.5, 0.25, 0.5, 0.25]])
    min_overlaps = np.stack([overlap_0_7, overlap_0_5], axis=0)[:, :, [0]]
    ref_out = ref_eval.do_eval(gt_annos, dt_annos, [0], min_overlaps, False)
    our_out = do_eval(gt_annos, dt_annos, [0], min_overlaps, False)
    # ref returns (bbox, bev, 3d, aos, bbox40, bev40, 3d40, aos40)
    for r, o, name in zip(ref_out, our_out,
                          ["bbox", "bev", "3d", "aos", "bbox_R40", "bev_R40",
                           "3d_R40", "aos_R40"]):
        if r is None or o is None:
            assert (r is None or np.all(r == 0)) and o is None, name
            continue
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=1e-6,
                                   err_msg=name)


def test_thresholds_and_clean_data_parity(ref_eval):
    from modest_tpu.eval.kitti_eval import clean_data, get_thresholds

    rng = np.random.RandomState(2)
    for num_gt in [5, 17, 40, 123]:
        scores = rng.uniform(0, 1, num_gt + rng.randint(0, 30))
        ref_th = ref_eval.get_thresholds(scores.copy(), num_gt)
        our_th = get_thresholds(scores.copy(), num_gt)
        np.testing.assert_allclose(our_th, ref_th, atol=0)
    gt_annos, dt_annos = _make_annos(rng, n_frames=6, cls="Dynamic")
    for gt, dt in zip(gt_annos, dt_annos):
        for difficulty in [0, 1, 2, 3]:
            r = ref_eval.clean_data(gt, dt, 6, difficulty)  # 6 = Dynamic
            o = clean_data(gt, dt, 6, difficulty)
            assert r[0] == o[0]
            assert list(r[1]) == list(o[1]) and list(r[2]) == list(o[2])
            assert len(r[3]) == len(o[3])


# ---------------------------------------------------------------------------
# (b) geometry parity
# ---------------------------------------------------------------------------


def _clusters(rng, n=25):
    out = []
    for _ in range(n):
        m = rng.randint(8, 120)
        # L-shaped-ish cluster: box surface samples with jitter
        l, w = rng.uniform(1.5, 5), rng.uniform(1, 2.5)
        ang = rng.uniform(0, np.pi)
        side = rng.randint(0, 2, m)
        u = np.where(side == 0, rng.uniform(-l / 2, l / 2, m),
                     np.full(m, l / 2))
        v = np.where(side == 0, np.full(m, -w / 2),
                     rng.uniform(-w / 2, w / 2, m))
        c, s = np.cos(ang), np.sin(ang)
        pts = np.stack([u * c - v * s, u * s + v * c], 1)
        pts += rng.randn(m, 2) * 0.03 + rng.uniform(-20, 20, 2)
        out.append(pts)
    return out


def test_rectangle_fitter_parity(ref_pointcloud_utils, rng):
    from modest_tpu.pipeline import box_fit

    for pts in _clusters(rng):
        for ref_fn, our_fn in [
            (ref_pointcloud_utils.closeness_rectangle, box_fit.closeness_rectangle),
            (ref_pointcloud_utils.variance_rectangle, box_fit.variance_rectangle),
            (ref_pointcloud_utils.minimum_bounding_rectangle,
             box_fit.minimum_bounding_rectangle),
        ]:
            r_corners, r_angle, r_area = ref_fn(pts)
            o_corners, o_angle, o_area = our_fn(pts)
            np.testing.assert_allclose(o_area, r_area, rtol=1e-9,
                                       err_msg=ref_fn.__name__)
            np.testing.assert_allclose(o_angle % (2 * np.pi), r_angle % (2 * np.pi),
                                       atol=1e-9, err_msg=ref_fn.__name__)
            np.testing.assert_allclose(o_corners, r_corners, atol=1e-7,
                                       err_msg=ref_fn.__name__)


def test_pca_rectangle_parity(ref_pointcloud_utils, rng):
    """PCA fit: same area (principal axis sign/order can differ by 90°)."""
    from modest_tpu.pipeline import box_fit

    for pts in _clusters(rng, n=10):
        _, _, r_area = ref_pointcloud_utils.PCA_rectangle(pts)
        _, _, o_area = box_fit.PCA_rectangle(pts)
        np.testing.assert_allclose(o_area, r_area, rtol=1e-7)


def test_get_relative_pose_parity(ref_pp_score_module, rng):
    from modest_tpu.utils.pose import (
        KITTI2NU_LYFT,
        KITTI2NU_NUSC,
        get_relative_pose,
    )

    def rand_se3():
        a = rng.randn(3)
        a /= np.linalg.norm(a)
        th = rng.uniform(0, np.pi)
        K = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
        R = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = rng.uniform(-100, 100, 3)
        return T

    np.testing.assert_allclose(ref_pp_score_module._KITTI2NU_lyft, KITTI2NU_LYFT,
                               atol=1e-12)
    np.testing.assert_allclose(ref_pp_score_module._KITTI2NU_nusc, KITTI2NU_NUSC,
                               atol=1e-12)
    for _ in range(10):
        fl2e, fe, ql2e, qe = rand_se3(), rand_se3(), rand_se3(), rand_se3()
        for k2n in (KITTI2NU_LYFT, KITTI2NU_NUSC):
            ref_T = ref_pp_score_module.get_relative_pose(
                fl2e, fe, ql2e, qe, KITTI2NU=k2n)
            our_T = get_relative_pose(fl2e, fe, ql2e, qe, kitti2nu=k2n)
            np.testing.assert_allclose(our_T, ref_T, atol=1e-4)


def test_ephe_score_parity(ref_pp_score_module, rng):
    """compute_ephe_score (normalized count entropy, pre_compute_pp_score
    :68-75) vs ours on the same (n_pts, n_traversals) neighbor counts."""
    from modest_tpu.pipeline.pp_score import compute_ephe_score

    counts = rng.randint(0, 40, (500, 6)).astype(np.float64)
    ref_val = ref_pp_score_module.compute_ephe_score(
        counts, types.SimpleNamespace(ephe_type="entropy"))
    our_val = compute_ephe_score(counts, "entropy")
    np.testing.assert_allclose(np.asarray(our_val), ref_val, atol=1e-5)


def test_calibration_roundtrip_parity(ref_pointcloud_utils, tmp_path, rng):
    """Reference kitti_util.Calibration vs ours on the same calib file."""
    sys.path.insert(0, str(REF / "generate_cluster_mask"))
    try:
        from utils import kitti_util as ref_ku
    finally:
        sys.path.pop(0)
    from modest_tpu.utils.kitti_io import Calibration

    P2 = np.array([[720.0, 0.0, 610.0, 44.8], [0.0, 720.0, 172.8, 0.2],
                   [0.0, 0.0, 1.0, 0.003]])
    th = 0.02
    R0 = np.array([[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0],
                   [0, 0, 1.0]])
    V2C = np.array([[0.0, -1, 0, -0.02], [0, 0, -1, -0.06], [1.0, 0, 0, -0.4]])
    f = tmp_path / "calib.txt"
    with open(f, "w") as fh:
        fh.write("P0: " + " ".join(map(str, P2.reshape(-1))) + "\n")
        fh.write("P1: " + " ".join(map(str, P2.reshape(-1))) + "\n")
        fh.write("P2: " + " ".join(map(str, P2.reshape(-1))) + "\n")
        fh.write("P3: " + " ".join(map(str, P2.reshape(-1))) + "\n")
        fh.write("R0_rect: " + " ".join(map(str, R0.reshape(-1))) + "\n")
        fh.write("Tr_velo_to_cam: " + " ".join(map(str, V2C.reshape(-1))) + "\n")
        fh.write("Tr_imu_to_velo: " + " ".join(map(str, V2C.reshape(-1))) + "\n")

    ref_cal = ref_ku.Calibration(str(f))
    our_cal = Calibration(str(f))
    pts = np.stack([rng.uniform(1, 70, 200), rng.uniform(-40, 40, 200),
                    rng.uniform(-2, 1, 200)], 1)
    ref_rect = ref_cal.project_velo_to_rect(pts)
    our_rect = our_cal.lidar_to_rect(pts)
    np.testing.assert_allclose(our_rect, ref_rect, atol=1e-9)
    np.testing.assert_allclose(our_cal.rect_to_lidar(our_rect),
                               ref_cal.project_rect_to_velo(ref_rect), atol=1e-6)
    ref_img = ref_cal.project_rect_to_image(ref_rect)
    our_img = our_cal.project_rect_to_image(our_rect)
    np.testing.assert_allclose(our_img, ref_img, atol=1e-9)
    uvd = np.concatenate([ref_img, ref_rect[:, 2:3]], 1)
    np.testing.assert_allclose(our_cal.project_image_to_rect(uvd),
                               ref_cal.project_image_to_rect(uvd), atol=1e-9)


def test_filter_labels_parity(ref_pointcloud_utils, monkeypatch):
    """Our vectorized cluster-validity filter ≡ the reference's per-cluster
    loop (clustering_utils.py:94-135), same plane injected on both sides."""
    sys.path.insert(0, str(REF / "generate_cluster_mask"))
    try:
        from utils import clustering_utils as ref_cu
    finally:
        sys.path.pop(0)
    from modest_tpu.pipeline import seed_labels as ours

    rng = np.random.RandomState(11)
    n = 3000
    ptc = np.stack([rng.uniform(-40, 40, n), rng.uniform(-40, 40, n),
                    rng.uniform(-1.9, 1.5, n), np.zeros(n)], 1)
    pp = rng.uniform(0, 1, n)
    labels = rng.randint(-1, 30, n).astype(np.int64)
    labels[rng.rand(n) < 0.25] = -1
    labels[labels == 5] = -1  # an empty cluster id

    plane = np.array([0.01, -0.02, 0.9995, 1.83])
    plane = plane / np.linalg.norm(plane[:3])
    monkeypatch.setattr(ref_cu, "estimate_plane", lambda *a, **k: plane)
    monkeypatch.setattr(ours, "estimate_plane", lambda *a, **k: plane)

    kwargs = dict(min_points=8, max_volume=40, min_volume=0.5,
                  max_min_height=1.2, min_max_height=0.3,
                  percentile=25, min_percentile_pp_score=0.6)
    got = ours.filter_labels(ptc, pp, labels.copy(), **kwargs)
    ref = ref_cu.filter_labels(ptc, pp, labels.copy(), **kwargs)
    np.testing.assert_array_equal(got, ref)


def test_pp_smoothing_parity(ref_pointcloud_utils):
    """smooth_pp_score (knn mode) ≡ reference clustering_utils.smoothing."""
    sys.path.insert(0, str(REF / "generate_cluster_mask"))
    try:
        from utils import clustering_utils as ref_cu
    finally:
        sys.path.pop(0)
    from modest_tpu.pipeline.clustering import smooth_pp_score

    rng = np.random.RandomState(7)
    ptc = rng.uniform(-20, 20, (700, 4))
    pp = rng.uniform(0, 1, 700)
    ref = ref_cu.smoothing(ptc, pp, neighbor_type="knn", n_neighbors=12,
                           num_iterations=5)
    got = smooth_pp_score(ptc, pp, neighbor_type="knn", n_neighbors=12,
                          num_iterations=5, row_chunk=256)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_coco_style_eval_parity(ref_eval):
    """do_coco_style_eval (IoU-linspace-averaged AP) vs the reference matcher.

    The reference's own do_coco_style_eval is dead code in its tree (it
    unpacks 4 values from a do_eval that returns 8), so the parity anchor is
    the reference do_eval evaluated at the same IoU linspace, averaged the
    way eval.py:626-643 intends."""
    from modest_tpu.eval.kitti_eval import do_coco_style_eval

    rng = np.random.RandomState(4)
    gt_annos, dt_annos = _make_annos(rng, n_frames=6, cls="Car")
    overlap_ranges = np.zeros([3, 3, 1])
    overlap_ranges[:, :, 0] = np.array([0.5, 0.95, 10])[:, None]
    min_overlaps = np.zeros([10, 3, 1])
    for i in range(3):
        min_overlaps[:, i, 0] = np.linspace(0.5, 0.95, 10)
    ref_out = ref_eval.do_eval(gt_annos, dt_annos, [0], min_overlaps, False)
    ref_coco = [None if r is None else np.asarray(r).mean(-1)
                for r in ref_out[:4]]
    our_out = do_coco_style_eval(gt_annos, dt_annos, [0], overlap_ranges,
                                 False)
    for r, o, name in zip(ref_coco, our_out, ["bbox", "bev", "3d", "aos"]):
        if r is None or o is None:
            assert (r is None or np.all(np.asarray(r) == 0)) and o is None, name
            continue
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=1e-6,
                                   err_msg=name)
