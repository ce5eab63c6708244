"""KITTI AP harness behavior tests."""
import numpy as np

from modest_tpu.eval import kitti_eval
import pytest

pytestmark = pytest.mark.slow


def make_anno(locs, dims, rys, names=None, scores=None, depth_axis=2):
    n = len(locs)
    locs = np.asarray(locs, float).reshape(n, 3)
    dims = np.asarray(dims, float).reshape(n, 3)  # l, h, w
    rys = np.asarray(rys, float).reshape(n)
    anno = {
        "name": np.array(names if names is not None else ["Dynamic"] * n),
        "truncated": np.full(n, -1.0),
        "occluded": np.full(n, -1.0),
        "alpha": np.zeros(n),
        "bbox": np.tile(np.array([0.0, 0.0, 100.0, 100.0]), (n, 1)),
        "dimensions": dims,
        "location": locs,
        "rotation_y": rys,
        "score": np.asarray(scores if scores is not None else [1.0] * n, float),
    }
    return anno


def test_perfect_detections_ap100():
    # R40 interpolation needs >= 41 gt objects to fill every recall sample
    gt, dt = [], []
    rng = np.random.RandomState(0)
    for _ in range(15):
        locs = rng.uniform(5, 25, (3, 3)) * [1, 0.1, 1]
        dims = rng.uniform(1.5, 4, (3, 3))
        rys = rng.uniform(-np.pi, np.pi, 3)
        gt.append(make_anno(locs, dims, rys))
        dt.append(make_anno(locs, dims, rys, scores=rng.uniform(0.5, 1.0, 3)))
    res, ret = kitti_eval.get_range_eval_result(gt, dt, ["Dynamic"], ranges=(0, 30, 50, 80))
    assert ret["Dynamic_bev_iou0.7/00-80_R40"] > 99.9
    assert ret["Dynamic_3d_iou0.7/00-80_R40"] > 99.9
    assert ret["Dynamic_bev_iou0.5/00-80_R40"] > 99.9


def test_missed_detection_lowers_ap():
    gt, dt = [], []
    rng = np.random.RandomState(1)
    for f in range(45):
        locs = np.array([[5.0, 0, 10.0 + 0.1 * f], [15.0, 0, 20.0 + 0.1 * f]])
        dims = np.tile([4.0, 1.5, 1.8], (2, 1))
        rys = np.zeros(2)
        gt.append(make_anno(locs, dims, rys))
        # detect only the first object
        dt.append(make_anno(locs[:1], dims[:1], rys[:1], scores=[0.9]))
    _, ret = kitti_eval.get_range_eval_result(gt, dt, ["Dynamic"])
    ap = ret["Dynamic_bev_iou0.7/00-80_R40"]
    assert 30 < ap < 60  # recall caps at 50%


def test_false_positives_lower_precision():
    gt, dt = [], []
    for f in range(45):
        locs = np.array([[5.0, 0, 10.0]])
        dims = np.array([[4.0, 1.5, 1.8]])
        gt.append(make_anno(locs, dims, [0.0]))
        # 1 TP + 1 high-scoring FP far away
        dt.append(
            make_anno(
                np.array([[5.0, 0, 10.0], [50.0, 0, 70.0]]),
                np.tile(dims, (2, 1)), [0.0, 0.0], scores=[0.8, 0.9],
            )
        )
    _, ret = kitti_eval.get_range_eval_result(gt, dt, ["Dynamic"])
    ap = ret["Dynamic_bev_iou0.7/00-80_R40"]
    assert 40 < ap < 60  # precision 0.5 at full recall


def test_range_bucketing():
    gt = [make_anno([[5.0, 0, 20.0], [5.0, 0, 40.0]],
                    np.tile([4.0, 1.5, 1.8], (2, 1)), [0.0, 0.0]) for _ in range(45)]
    dt = [make_anno([[5.0, 0, 20.0], [5.0, 0, 40.0]],
                    np.tile([4.0, 1.5, 1.8], (2, 1)), [0.0, 0.0], scores=[0.9, 0.9])
          for _ in range(45)]
    _, ret = kitti_eval.get_range_eval_result(gt, dt, ["Dynamic"], ranges=(0, 30, 50, 80))
    assert ret["Dynamic_bev_iou0.7/00-30_R40"] > 99.9  # only the 20 m box
    assert ret["Dynamic_bev_iou0.7/30-50_R40"] > 99.9  # only the 40 m box
    # empty bucket → 0
    assert ret["Dynamic_bev_iou0.7/50-80_R40"] == 0.0


def test_iou_threshold_mapping():
    """Slightly misaligned boxes pass IoU 0.25 ('iou0.5' column) but fail
    IoU 0.5 ('iou0.7' column) — the Dynamic min_overlaps quirk."""
    gt = [make_anno([[5.0, 0, 20.0]], [[4.0, 1.5, 1.8]], [0.0]) for _ in range(45)]
    # shift by 2.0 m along x: IoU = 2/6 = 0.33
    dt = [make_anno([[7.0, 0, 20.0]], [[4.0, 1.5, 1.8]], [0.0], scores=[0.9]) for _ in range(45)]
    _, ret = kitti_eval.get_range_eval_result(gt, dt, ["Dynamic"])
    assert ret["Dynamic_bev_iou0.5/00-80_R40"] > 99.9  # IoU 0.25 threshold
    assert ret["Dynamic_bev_iou0.7/00-80_R40"] < 1.0  # IoU 0.5 threshold


def test_get_thresholds_41_points():
    scores = np.linspace(0, 1, 200)
    th = kitti_eval.get_thresholds(scores.copy(), 200)
    assert len(th) <= 41
    assert all(th[i] >= th[i + 1] for i in range(len(th) - 1))


def test_official_eval_runs():
    gt = [make_anno([[5.0, 0, 20.0]], [[4.0, 1.5, 1.8]], [0.0], names=["Car"]) for _ in range(45)]
    dt = [make_anno([[5.0, 0, 20.0]], [[4.0, 1.5, 1.8]], [0.0], names=["Car"], scores=[0.9])
          for _ in range(45)]
    # give gt a tall enough 2D bbox so difficulty gating keeps it
    res, ret = kitti_eval.get_official_eval_result(gt, dt, ["Car"])
    assert ret["Car_bev/easy_R40"] > 99.9


def test_evaluate_cli_offline_label_dirs(tmp_path):
    """cli/evaluate.py (reference kitti_object_eval_python/evaluate.py):
    label-dir vs label-dir AP without a model; self-evaluation with
    distinct scores reproduces the library path exactly."""
    import sys

    sys.path.insert(0, "tests")
    from synth_kitti import make_dataset

    from modest_tpu.cli.evaluate import get_label_annos, main

    root = tmp_path / "kitti"
    make_dataset(root, n_train=4, n_val=0, seed=5)
    gt_dir = root / "training" / "label_2"
    det_dir = root / "training" / "dets"
    det_dir.mkdir()
    for p in gt_dir.glob("*.txt"):
        lines = [ln for ln in p.read_text().splitlines() if ln.strip()]
        (det_dir / p.name).write_text(
            "\n".join(f"{ln} {0.9 - 0.01 * i:.2f}" for i, ln in enumerate(lines))
            + "\n")

    res = main(["--label_path", str(gt_dir), "--result_path", str(det_dir),
                "--metric", "range"])
    assert "Dynamic_bev_iou0.7/00-80_R40" in res
    # identical boxes → the library path must agree exactly
    want_str, want = kitti_eval.get_range_eval_result(
        get_label_annos(gt_dir), get_label_annos(det_dir), "Dynamic")
    for k, v in want.items():
        np.testing.assert_allclose(res[k], v)
    assert res["Dynamic_bev_iou0.7/00-80_R40"] > 0

    # score filter drops everything → AP 0
    res0 = main(["--label_path", str(gt_dir), "--result_path", str(det_dir),
                 "--metric", "range", "--score_thresh", "0.95"])
    assert res0["Dynamic_bev_iou0.7/00-80_R40"] == 0
