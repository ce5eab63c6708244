"""nuScenes/Waymo native dataset drivers + multihead (D19 parity)."""
import pickle

import numpy as np
import pytest

from modest_tpu.utils.config import Config

pytestmark = pytest.mark.slow


# ---------------------------------------------------------------------------
# synthetic data trees
# ---------------------------------------------------------------------------


def make_nusc_tree(root, n_frames=3, n_sweeps=2, rng=None):
    rng = rng or np.random.RandomState(0)
    root.mkdir(parents=True, exist_ok=True)
    (root / "sweeps").mkdir(exist_ok=True)
    (root / "samples").mkdir(exist_ok=True)
    infos = []
    for i in range(n_frames):
        pts = rng.uniform(-40, 40, (500, 5)).astype(np.float32)
        path = f"samples/frame_{i}.pcd.bin"
        pts.tofile(root / path)
        sweeps = []
        for s in range(n_sweeps):
            spts = rng.uniform(-40, 40, (200, 5)).astype(np.float32)
            spath = f"sweeps/frame_{i}_{s}.pcd.bin"
            spts.tofile(root / spath)
            tm = np.eye(4)
            tm[:3, 3] = [0.1 * s, 0, 0]
            sweeps.append({"lidar_path": spath, "transform_matrix": tm,
                           "time_lag": 0.05 * (s + 1)})
        n_gt = 2 + (i % 2)
        gt = np.zeros((n_gt, 9), np.float32)
        gt[:, 0:2] = rng.uniform(-30, 30, (n_gt, 2))
        gt[:, 2] = -1.0
        gt[:, 3:6] = [4.5, 2.0, 1.7]
        gt[:, 6] = rng.uniform(-3, 3, n_gt)
        gt[:, 7:9] = rng.uniform(-5, 5, (n_gt, 2))
        names = np.asarray(["car"] * (n_gt - 1) + ["pedestrian"])
        infos.append({
            "lidar_path": path, "token": f"tok{i}", "sweeps": sweeps,
            "gt_boxes": gt, "gt_names": names,
            "num_lidar_pts": np.full(n_gt, 10 + i),
        })
    with open(root / "infos_train.pkl", "wb") as f:
        pickle.dump(infos, f)
    return infos


NUSC_CFG = {
    "DATASET": "NuScenesDataset",
    "MAX_SWEEPS": 3,
    "PRED_VELOCITY": False,
    "SET_NAN_VELOCITY_TO_ZEROS": True,
    "FILTER_MIN_POINTS_IN_GT": 1,
    "BALANCED_RESAMPLING": False,
    "INFO_PATH": {"train": ["infos_train.pkl"], "test": ["infos_train.pkl"]},
    "POINT_CLOUD_RANGE": [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0],
    "POINT_FEATURE_ENCODING": {
        "encoding_type": "absolute_coordinates_encoding",
        "used_feature_list": ["x", "y", "z", "intensity", "timestamp"],
        "src_feature_list": ["x", "y", "z", "intensity", "timestamp"],
    },
    "DATA_PROCESSOR": [
        {"NAME": "mask_points_and_boxes_outside_range", "REMOVE_OUTSIDE_BOXES": True},
        {"NAME": "sample_points", "NUM_POINTS": {"train": 1024, "test": 1024}},
    ],
}


def test_nuscenes_dataset_getitem(tmp_path, rng):
    make_nusc_tree(tmp_path / "nusc", rng=rng)
    from modest_tpu.data.nuscenes_dataset import NuScenesDataset

    ds = NuScenesDataset(Config(NUSC_CFG), ["car", "pedestrian"],
                         training=True, root_path=tmp_path / "nusc")
    assert len(ds) == 3
    item = ds[0]
    assert item["points"].shape == (1024, 5)  # xyz + intensity + timestamp
    # PRED_VELOCITY False → velocity columns dropped: [x..heading, class]
    assert item["gt_boxes"].shape[1] == 8
    assert set(item["gt_boxes"][:, 7]) <= {1.0, 2.0}
    # sweep timestamps present: some points carry nonzero time channel
    assert (item["points"][:, 4] != 0).any()


def test_nuscenes_velocity_kept_when_pred_velocity(tmp_path, rng):
    make_nusc_tree(tmp_path / "nusc", rng=rng)
    from modest_tpu.data.nuscenes_dataset import NuScenesDataset

    cfg = dict(NUSC_CFG, PRED_VELOCITY=True)
    ds = NuScenesDataset(Config(cfg), ["car", "pedestrian"],
                         training=True, root_path=tmp_path / "nusc")
    item = ds[1]
    assert item["gt_boxes"].shape[1] == 10  # 7 box + 2 velo + class


def test_nuscenes_balanced_resampling(tmp_path, rng):
    make_nusc_tree(tmp_path / "nusc", n_frames=6, rng=rng)
    from modest_tpu.data.nuscenes_dataset import NuScenesDataset

    cfg = dict(NUSC_CFG, BALANCED_RESAMPLING=True)
    np.random.seed(0)
    ds = NuScenesDataset(Config(cfg), ["car", "pedestrian"],
                         training=True, root_path=tmp_path / "nusc")
    assert len(ds.infos) > 0  # resampled set is non-empty and loadable
    _ = ds[0]


def test_nuscenes_gt_database(tmp_path, rng):
    make_nusc_tree(tmp_path / "nusc", rng=rng)
    from modest_tpu.data.nuscenes_dataset import NuScenesDataset

    ds = NuScenesDataset(Config(NUSC_CFG), ["car", "pedestrian"],
                         training=False, root_path=tmp_path / "nusc")
    db = ds.create_groundtruth_database(max_sweeps=2)
    with open(db, "rb") as f:
        infos = pickle.load(f)
    assert isinstance(infos, dict)


def make_waymo_tree(root, n_frames=4, rng=None):
    rng = rng or np.random.RandomState(0)
    seq = "segment-1234"
    d = root / "waymo_processed_data" / seq
    d.mkdir(parents=True, exist_ok=True)
    (root / "ImageSets").mkdir(exist_ok=True)
    (root / "ImageSets" / "train.txt").write_text(f"{seq}.tfrecord\n")
    infos = []
    for i in range(n_frames):
        pts = np.zeros((400, 6), np.float32)
        pts[:, :3] = rng.uniform(-60, 60, (400, 3))
        pts[:, 3] = rng.uniform(0, 1, 400)
        pts[:, 5] = -1  # in lidar zone
        pts[:50, 5] = 1  # no-label-zone points must be dropped
        np.save(d / f"{i:04d}.npy", pts)
        boxes = np.zeros((2, 7), np.float32)
        boxes[:, 0:2] = rng.uniform(-40, 40, (2, 2))
        boxes[:, 3:6] = [4.7, 2.1, 1.7]
        infos.append({
            "point_cloud": {"lidar_sequence": seq, "sample_idx": i},
            "frame_id": f"{seq}_{i:03d}",
            "annos": {"name": np.asarray(["Vehicle", "unknown"]),
                      "gt_boxes_lidar": boxes},
        })
    with open(d / f"{seq}.pkl", "wb") as f:
        pickle.dump(infos, f)
    return infos


WAYMO_CFG = {
    "DATASET": "WaymoDataset",
    "PROCESSED_DATA_TAG": "waymo_processed_data",
    "POINT_CLOUD_RANGE": [-75.2, -75.2, -2, 75.2, 75.2, 4],
    "DATA_SPLIT": {"train": "train", "test": "train"},
    "SAMPLED_INTERVAL": {"train": 2, "test": 1},
    "POINT_FEATURE_ENCODING": {
        "encoding_type": "absolute_coordinates_encoding",
        "used_feature_list": ["x", "y", "z", "intensity", "elongation"],
        "src_feature_list": ["x", "y", "z", "intensity", "elongation"],
    },
    "DATA_PROCESSOR": [
        {"NAME": "mask_points_and_boxes_outside_range", "REMOVE_OUTSIDE_BOXES": True},
        {"NAME": "sample_points", "NUM_POINTS": {"train": 512, "test": 512}},
    ],
}


def test_waymo_dataset_getitem(tmp_path, rng):
    make_waymo_tree(tmp_path, rng=rng)
    from modest_tpu.data.waymo_dataset import WaymoDataset

    ds = WaymoDataset(Config(WAYMO_CFG), ["Vehicle", "Pedestrian", "Cyclist"],
                      training=True, root_path=tmp_path)
    assert len(ds) == 2  # SAMPLED_INTERVAL=2 of 4 frames
    item = ds[0]
    assert item["points"].shape == (512, 5)
    # 'unknown' dropped → one Vehicle box with class id 1
    assert item["gt_boxes"].shape == (1, 8)
    assert item["gt_boxes"][0, 7] == 1.0


def test_waymo_eval_fallback_perfect_dets(tmp_path, rng):
    make_waymo_tree(tmp_path, rng=rng)
    from modest_tpu.data.waymo_dataset import WaymoDataset

    ds = WaymoDataset(Config(WAYMO_CFG), ["Vehicle"], training=False,
                      root_path=tmp_path)
    det_annos = []
    for info in ds.infos:
        keep = np.asarray(info["annos"]["name"]) == "Vehicle"
        boxes = np.asarray(info["annos"]["gt_boxes_lidar"])[keep]
        pred = {"pred_boxes": boxes,
                "pred_scores": np.linspace(0.9, 0.5, len(boxes)),
                "pred_labels": np.ones(len(boxes), np.int64)}
        det_annos.append(ds.generate_prediction_dicts(
            {"frame_id": [info["frame_id"]]}, [pred], ["Vehicle"])[0])
    result_str, result = ds.evaluation(det_annos, ["Vehicle"])
    assert result["Vehicle_bev_iou0.7_R40"] > 99.0
    assert result["Vehicle_bev_iou0.5_R40"] > 99.0


# ---------------------------------------------------------------------------
# multihead model
# ---------------------------------------------------------------------------


TINY_MULTIHEAD = {
    "NAME": "PointPillar",
    "VFE": {"NAME": "PillarVFE", "NUM_FILTERS": [16]},
    "BACKBONE_2D": {
        "NAME": "BaseBEVBackbone",
        "LAYER_NUMS": [1], "LAYER_STRIDES": [2], "NUM_FILTERS": [16],
        "UPSAMPLE_STRIDES": [1], "NUM_UPSAMPLE_FILTERS": [16],
    },
    "DENSE_HEAD": {
        "NAME": "AnchorHeadMulti",
        "DIR_OFFSET": 0.78539, "DIR_LIMIT_OFFSET": 0.0, "NUM_DIR_BINS": 2,
        "USE_DIRECTION_CLASSIFIER": True,
        "SHARED_CONV_NUM_FILTER": 16,
        "ANCHOR_GENERATOR_CONFIG": [
            {"class_name": "car", "anchor_sizes": [[4.6, 2.0, 1.7]],
             "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-1.0],
             "align_center": False, "feature_map_stride": 2,
             "matched_threshold": 0.6, "unmatched_threshold": 0.45},
            {"class_name": "pedestrian", "anchor_sizes": [[0.7, 0.7, 1.7]],
             "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-1.0],
             "align_center": False, "feature_map_stride": 2,
             "matched_threshold": 0.5, "unmatched_threshold": 0.35},
        ],
        "RPN_HEAD_CFGS": [
            {"HEAD_CLS_NAME": ["car"]},
            {"HEAD_CLS_NAME": ["pedestrian"]},
        ],
        "TARGET_ASSIGNER_CONFIG": {
            "BOX_CODER": "ResidualCoder",
            "BOX_CODER_CONFIG": {"code_size": 9, "encode_angle_by_sincos": True},
        },
        "LOSS_CONFIG": {"LOSS_WEIGHTS": {
            "cls_weight": 1.0, "loc_weight": 0.25, "dir_weight": 0.2,
            "code_weights": [1.0] * 8 + [0.2, 0.2],
        }},
    },
    "POST_PROCESSING": {
        "RECALL_THRESH_LIST": [0.3, 0.5, 0.7], "SCORE_THRESH": 0.1,
        "EVAL_METRIC": "kitti",
        "NMS_CONFIG": {"MULTI_CLASSES_NMS": True, "NMS_TYPE": "nms_gpu",
                       "NMS_THRESH": 0.2, "NMS_PRE_MAXSIZE": 64,
                       "NMS_POST_MAXSIZE": 16},
    },
}


@pytest.fixture(scope="module")
def multihead_setup():
    import jax
    import jax.numpy as jnp

    from modest_tpu.models.grid_detectors import GridDetector

    pcr = (-16.0, -16.0, -5.0, 16.0, 16.0, 3.0)
    model = GridDetector(
        model_cfg=TINY_MULTIHEAD, num_class=2,
        point_cloud_range=pcr, voxel_size=(1.0, 1.0, 8.0),
        grid_size=(32, 32, 1), class_names=("car", "pedestrian"),
    )
    rng = np.random.RandomState(0)
    pts = rng.uniform(-15, 15, (2, 256, 5)).astype(np.float32)
    gt = np.zeros((2, 4, 10), np.float32)
    gt[:, 0, :7] = [2, 3, -1, 4.6, 2.0, 1.7, 0.2]
    gt[:, 0, 9] = 1  # car
    # pedestrian sits exactly on an anchor center (grid step 32/15) so the
    # tiny 0.7 m box overlaps its anchor; off-grid it has IoU 0 with every
    # anchor, and zero-IoU gts never force-match (reference semantics)
    gx = -16 + (32 / 15) * 5
    gt[:, 1, :7] = [gx, gx, -1, 0.7, 0.7, 1.7, 0.0]
    gt[:, 1, 9] = 2  # pedestrian
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(pts),
                           jnp.asarray(gt), train=True)
    return model, variables, jnp.asarray(pts), jnp.asarray(gt)


def test_multihead_train_forward_and_loss(multihead_setup):
    import jax.numpy as jnp

    from modest_tpu.models.grid_detectors import grid_detector_loss

    model, variables, pts, gt = multihead_setup
    out, _ = model.apply(variables, pts, gt, train=True,
                         mutable=["batch_stats"])
    a = out["anchors"].shape[0]
    assert out["cls_preds"].shape == (2, a, 2)
    assert out["box_preds"].shape == (2, a, 10)  # sincos 9-code → 10
    assert out["box_cls_labels"].shape == (2, a)
    # anchors for both classes got matched as fg
    labels = np.asarray(out["box_cls_labels"])
    assert (labels == 1).any() and (labels == 2).any()
    loss, metrics = grid_detector_loss(out, Config({"DENSE_HEAD": TINY_MULTIHEAD["DENSE_HEAD"]}), num_class=2)
    assert np.isfinite(float(loss))


def test_multihead_eval_and_multiclass_nms(multihead_setup):
    from modest_tpu.models.grid_detectors import grid_post_process

    model, variables, pts, gt = multihead_setup
    out = model.apply(variables, pts, train=False)
    assert out["batch_box_preds"].shape[-1] == 9  # decoded with velocity
    final = grid_post_process(out, Config(TINY_MULTIHEAD["POST_PROCESSING"]))
    # per-class slots: 2 classes × post_max 16
    assert final["boxes"].shape[1] == 32
    labels = np.asarray(final["labels"])
    assert set(np.unique(labels)) <= {1, 2}


def test_residual_coder_velocity_roundtrip(rng):
    import jax.numpy as jnp

    from modest_tpu.models.box_coders import ResidualCoder

    coder = ResidualCoder(code_size=9, encode_angle_by_sincos=True)
    boxes = rng.uniform(-1, 1, (20, 9)).astype(np.float32)
    boxes[:, 3:6] = rng.uniform(1, 4, (20, 3))
    anchors = boxes.copy()
    anchors[:, :3] += rng.uniform(-0.5, 0.5, (20, 3)).astype(np.float32)
    enc = coder.encode(jnp.asarray(boxes), jnp.asarray(anchors))
    assert enc.shape == (20, 10)
    dec = np.asarray(coder.decode(enc, jnp.asarray(anchors)))
    np.testing.assert_allclose(dec[:, :6], boxes[:, :6], atol=1e-4)
    np.testing.assert_allclose(dec[:, 7:9], boxes[:, 7:9], atol=1e-5)
    # heading equal up to 2π
    d = np.abs(np.mod(dec[:, 6] - boxes[:, 6] + np.pi, 2 * np.pi) - np.pi)
    assert d.max() < 1e-3
