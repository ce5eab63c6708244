"""SDK-free Waymo AP/APH evaluator tests (eval/waymo_eval.py)."""
import numpy as np
import pytest

from modest_tpu.eval.waymo_eval import (heading_accuracy,
                                        waymo_detection_metrics)


def _gt(boxes, npts=None, name="Vehicle"):
    boxes = np.asarray(boxes, np.float64).reshape(-1, 7)
    return {
        "name": np.array([name] * len(boxes)),
        "gt_boxes_lidar": boxes,
        "num_points_in_gt": (np.asarray(npts) if npts is not None
                             else np.full(len(boxes), 50)),
    }


def _det(boxes, scores, name="Vehicle"):
    boxes = np.asarray(boxes, np.float64).reshape(-1, 7)
    return {
        "name": np.array([name] * len(boxes)),
        "boxes_lidar": boxes,
        "score": np.asarray(scores, np.float64),
    }


def _box(x, y, heading=0.0):
    return [x, y, 1.0, 4.5, 1.9, 1.7, heading]


def test_perfect_detections():
    gts = [_gt([_box(10, 0), _box(20, 5)]), _gt([_box(-8, 3)])]
    dets = [_det([_box(10, 0), _box(20, 5)], [0.9, 0.8]),
            _det([_box(-8, 3)], [0.7])]
    r = waymo_detection_metrics(dets, gts, ["Vehicle"])
    for lvl in (1, 2):
        assert r[f"OBJECT_TYPE_TYPE_VEHICLE_LEVEL_{lvl}/AP"] == pytest.approx(1.0, abs=1e-6)
        assert r[f"OBJECT_TYPE_TYPE_VEHICLE_LEVEL_{lvl}/APH"] == pytest.approx(1.0, abs=1e-6)


def test_heading_flip_kills_aph_not_ap():
    gts = [_gt([_box(10, 0, 0.0)])]
    dets = [_det([_box(10, 0, np.pi)], [0.9])]
    r = waymo_detection_metrics(dets, gts, ["Vehicle"])
    assert r["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/AP"] == pytest.approx(1.0, abs=1e-4)
    assert r["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/APH"] == pytest.approx(0.0, abs=1e-6)
    # 90° off on a SQUARE box (so BEV IoU stays 1 and the match survives
    # the 0.7 gate) → TP weight 0.5 → p_h = r_h = 0.5 → APH = 0.25
    # (official semantics: heading weight applies to the TP count in both
    # precision and recall)
    sq_gt = [10, 0, 1.0, 2.0, 2.0, 1.7, 0.0]
    sq_det = [10, 0, 1.0, 2.0, 2.0, 1.7, np.pi / 2]
    r = waymo_detection_metrics(
        [_det([sq_det], [0.9])], [_gt([sq_gt])], ["Vehicle"])
    assert r["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/AP"] == pytest.approx(1.0, abs=1e-4)
    assert r["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/APH"] == pytest.approx(0.25, abs=1e-4)


def test_half_recall():
    gts = [_gt([_box(10, 0), _box(30, 0)])]
    dets = [_det([_box(10, 0)], [0.9])]
    r = waymo_detection_metrics(dets, gts, ["Vehicle"])
    assert r["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/AP"] == pytest.approx(0.5, abs=1e-6)


def test_false_positives_lower_precision():
    gts = [_gt([_box(10, 0)])]
    # one TP at score .9 plus one far FP at higher score .95
    dets = [_det([_box(50, 20), _box(10, 0)], [0.95, 0.9])]
    r = waymo_detection_metrics(dets, gts, ["Vehicle"])
    # at cutoffs ≤ .9 both kept: p=.5, r=1; envelope-integrated AP=0.5
    assert r["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/AP"] == pytest.approx(0.5, abs=1e-6)


def test_level2_gt_ignored_in_level1():
    # gt A has 50 pts (L1), gt B has 3 pts (L2). Detect both.
    gts = [_gt([_box(10, 0), _box(30, 0)], npts=[50, 3])]
    dets = [_det([_box(10, 0), _box(30, 0)], [0.9, 0.8])]
    r = waymo_detection_metrics(dets, gts, ["Vehicle"])
    # L1: B's match ignored entirely → 1 TP / 1 gt, no FP
    assert r["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/AP"] == pytest.approx(1.0, abs=1e-6)
    assert r["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP"] == pytest.approx(1.0, abs=1e-6)
    # missing the L2 box must not hurt L1 but must hurt L2
    dets = [_det([_box(10, 0)], [0.9])]
    r = waymo_detection_metrics(dets, gts, ["Vehicle"])
    assert r["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/AP"] == pytest.approx(1.0, abs=1e-6)
    assert r["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP"] == pytest.approx(0.5, abs=1e-6)


def test_zero_point_gt_dropped():
    gts = [_gt([_box(10, 0), _box(30, 0)], npts=[50, 0])]
    dets = [_det([_box(10, 0)], [0.9])]
    r = waymo_detection_metrics(dets, gts, ["Vehicle"])
    for lvl in (1, 2):
        assert r[f"OBJECT_TYPE_TYPE_VEHICLE_LEVEL_{lvl}/AP"] == pytest.approx(1.0, abs=1e-6)


def test_distance_mask():
    # gt + det beyond 100 m are both dropped → still perfect
    gts = [_gt([_box(10, 0), _box(150, 0)])]
    dets = [_det([_box(10, 0), _box(150, 0)], [0.9, 0.8])]
    r = waymo_detection_metrics(dets, gts, ["Vehicle"])
    assert r["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/AP"] == pytest.approx(1.0, abs=1e-6)


def test_hungarian_beats_greedy():
    # det1 clears the 0.7 gate with both gts (y-offset d → IoU
    # (1.9-d)/(1.9+d): 0.81 w/ A at d=.2, 0.73 w/ B at d=.3); det2 only
    # with gtA (d=.5 → 0.58 w/ B). Greedy by score would give det1→gtA
    # and strand det2; Hungarian finds det1→gtB, det2→gtA (2 TPs).
    gtA = _box(10, 0)
    gtB = [10, 0.5, 1.0, 4.5, 1.9, 1.7, 0.0]
    det1 = [10, 0.2, 1.0, 4.5, 1.9, 1.7, 0.0]
    det2 = _box(10, 0)
    iou_check = waymo_detection_metrics(
        [_det([det1, det2], [0.95, 0.9])], [_gt([gtA, gtB])], ["Vehicle"])
    assert iou_check["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/AP"] >= 0.99


def test_heading_accuracy_wraps():
    assert heading_accuracy(0.0, 2 * np.pi) == pytest.approx(1.0)
    assert heading_accuracy(-np.pi, np.pi) == pytest.approx(1.0)
    assert heading_accuracy(0.0, np.pi / 2) == pytest.approx(0.5)


def test_unmatched_class_names_score_zero():
    gts = [_gt([_box(10, 0)], name="Pedestrian")]
    dets = [_det([_box(10, 0)], [0.9], name="Pedestrian")]
    r = waymo_detection_metrics(dets, gts, ["Pedestrian", "Cyclist"])
    assert r["OBJECT_TYPE_TYPE_PEDESTRIAN_LEVEL_1/AP"] == pytest.approx(1.0, abs=1e-6)
    assert r["OBJECT_TYPE_TYPE_CYCLIST_LEVEL_1/AP"] == 0.0
