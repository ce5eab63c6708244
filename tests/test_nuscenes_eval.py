"""SDK-free nuScenes detection metric (eval/nuscenes_eval.py): protocol
behavior checks — perfect predictions, known per-match errors, distance
thresholds, FP ranking penalty, capability-gated TP metrics."""
import numpy as np

from modest_tpu.eval.nuscenes_eval import (
    DIST_THS,
    accumulate,
    calc_ap,
    calc_tp,
    nuscenes_eval,
)


def _frame(names, boxes, scores=None):
    d = {"name": np.array(names), "boxes_lidar": np.asarray(boxes, np.float64)}
    if scores is not None:
        d["score"] = np.asarray(scores, np.float64)
    return d


def _box(x, y, yaw=0.0, dims=(4.0, 2.0, 1.6), vel=None):
    b = [x, y, 0.0, *dims, yaw]
    if vel is not None:
        b += list(vel)
    return b


def test_perfect_predictions_score_one():
    gt = [_frame(["car", "car"], [_box(10, 0, vel=(1, 0)), _box(20, 5, vel=(0, 0))]),
          _frame(["car"], [_box(-5, 3, 0.5, vel=(2, 1))])]
    det = [_frame(["car", "car"], [_box(10, 0, vel=(1, 0)), _box(20, 5, vel=(0, 0))],
                  [0.9, 0.8]),
           _frame(["car"], [_box(-5, 3, 0.5, vel=(2, 1))], [0.95])]
    s, m = nuscenes_eval(gt, det, ["car"], pred_velocity=True)
    np.testing.assert_allclose(m["mAP"], 1.0, atol=1e-12)
    np.testing.assert_allclose(m["NDS"], 1.0, atol=1e-12)
    assert m["mATE"] == 0.0 and m["mASE"] == 0.0
    assert m["mAOE"] == 0.0 and m["mAVE"] == 0.0
    assert "NDS: 1.0000" in s


def test_known_match_errors():
    gt = [_frame(["car"], [_box(10, 0, yaw=0.0, dims=(4, 2, 2), vel=(1, 0))])]
    det = [_frame(["car"], [_box(10.3, 0, yaw=0.3, dims=(2, 2, 2), vel=(2, 0))],
                  [0.9])]
    md = accumulate(gt, det, "car", dist_th=2.0)
    np.testing.assert_allclose(calc_tp(md, "trans_err"), 0.3, atol=1e-9)
    np.testing.assert_allclose(calc_tp(md, "orient_err"), 0.3, atol=1e-9)
    np.testing.assert_allclose(calc_tp(md, "vel_err"), 1.0, atol=1e-9)
    # aligned-size IoU (2,2,2)∩(4,2,2) = 8/16 → scale err 0.5
    np.testing.assert_allclose(calc_tp(md, "scale_err"), 0.5, atol=1e-9)
    np.testing.assert_allclose(calc_ap(md), 1.0, atol=1e-12)  # single det matches → perfect PR curve


def test_distance_thresholds_gate_matches():
    gt = [_frame(["car"], [_box(10, 0)])]
    det = [_frame(["car"], [_box(13, 0)], [0.9])]  # 3 m off
    aps = {th: calc_ap(accumulate(gt, det, "car", th)) for th in DIST_THS}
    assert aps[0.5] == 0.0 and aps[1.0] == 0.0 and aps[2.0] == 0.0
    np.testing.assert_allclose(aps[4.0], 1.0, atol=1e-12)
    _, m = nuscenes_eval(gt, det, ["car"], pred_velocity=False)
    np.testing.assert_allclose(m["mAP"], 0.25, atol=1e-9)


def test_high_score_fp_lowers_ap():
    gt = [_frame(["car"], [_box(10, 0)])]
    clean = [_frame(["car"], [_box(10, 0)], [0.8])]
    noisy = [_frame(["car", "car"], [_box(10, 0), _box(50, 50)], [0.8, 0.95])]
    ap_clean = calc_ap(accumulate(gt, clean, "car", 2.0))
    ap_noisy = calc_ap(accumulate(gt, noisy, "car", 2.0))
    np.testing.assert_allclose(ap_clean, 1.0, atol=1e-12)
    assert ap_noisy < ap_clean


def test_duplicate_detections_are_fps():
    """A gt can only be claimed once; the second det on it is a FP."""
    gt = [_frame(["car"], [_box(10, 0)])]
    det = [_frame(["car", "car"], [_box(10, 0), _box(10.1, 0)], [0.9, 0.85])]
    md = accumulate(gt, det, "car", 2.0)
    assert md["precision"][-1] < 1.0  # trailing FP drops precision


def test_capability_gates():
    # 7-dim boxes → no velocity columns → AVE skipped entirely
    gt = [_frame(["car"], [_box(10, 0)])]
    det = [_frame(["car"], [_box(10, 0)], [0.9])]
    _, m = nuscenes_eval(gt, det, ["car"], pred_velocity=True)
    assert "mAVE" not in m
    np.testing.assert_allclose(m["NDS"], 1.0, atol=1e-12)  # renormalized over available terms

    # class with zero gt anywhere → skipped, not zero-scored
    _, m2 = nuscenes_eval(gt, det, ["car", "truck"], pred_velocity=False)
    assert "truck_AP" not in m2


def test_unmatched_class_gets_zero():
    gt = [_frame(["car"], [_box(10, 0)])]
    det = [_frame([], np.zeros((0, 7)), np.zeros(0))]
    _, m = nuscenes_eval(gt, det, ["car"], pred_velocity=False)
    assert m["mAP"] == 0.0
    assert m["car_AP"] == 0.0


def test_eval_range_filtering():
    """Devkit filter_eval_boxes: out-of-range boxes drop from both sides;
    zero-lidar-point gts drop."""
    gt = [{"name": np.array(["car", "car", "pedestrian"]),
           "boxes_lidar": np.array([_box(10, 0), _box(60, 0), _box(35, 20)]),
           "num_lidar_pts": np.array([5, 5, 0])}]
    det = [_frame(["car", "car", "pedestrian"],
                  [_box(10, 0), _box(60, 0), _box(35, 20)], [0.9, 0.8, 0.7])]
    # car@60m: beyond 50m range on both sides → neither FP nor missed gt;
    # pedestrian@~40.3m: beyond its 40m range; zero-point gt also dropped
    _, m = nuscenes_eval(gt, det, ["car", "pedestrian"], pred_velocity=False)
    np.testing.assert_allclose(m["car_AP"], 1.0, atol=1e-12)
    assert "pedestrian_AP" not in m  # its only gt was filtered out
