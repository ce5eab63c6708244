"""SDK-free nuScenes/Lyft table reader + end-to-end converter tests.

Builds a tiny nuScenes-schema dataset (JSON tables + 5-float lidar bins +
images) on disk and drives the full P1/P2 converters with use_sdk=False —
the path the reference runs through lyft_dataset_sdk / nuscenes-devkit
(data_preprocessing/lyft/sdk_gen_kitti_database.py, nusc2kitti_boston.py).
"""
import json
import os.path as osp
from pathlib import Path

import numpy as np
import pytest

from modest_tpu.preprocessing import converters
from modest_tpu.preprocessing.nu_tables import NuTables, load_lidar
from modest_tpu.utils import kitti_io


def mat_to_quat(R):
    """Rotation matrix → (w, x, y, z) quaternion (Shepperd's method)."""
    R = np.asarray(R, np.float64)
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        return np.array([0.25 * s, (R[2, 1] - R[1, 2]) / s,
                         (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s])
    i = int(np.argmax(np.diag(R)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(R[i, i] - R[j, j] - R[k, k] + 1.0) * 2
    q = np.empty(4)
    q[0] = (R[k, j] - R[j, k]) / s
    q[1 + i] = 0.25 * s
    q[1 + j] = (R[j, i] + R[i, j]) / s
    q[1 + k] = (R[k, i] + R[i, k]) / s
    return q


def yaw_quat(yaw):
    return [np.cos(yaw / 2), 0.0, 0.0, np.sin(yaw / 2)]


# CAM_FRONT sensor→ego: cam x=right(-y_ego), y=down(-z_ego), z=fwd(+x_ego)
CAM_ROT = np.array([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]])
CAM_INTRINSIC = [[700.0, 0.0, 600.0], [0.0, 700.0, 200.0], [0.0, 0.0, 1.0]]
IMG_W, IMG_H = 1200, 400
LIDAR_T = [0.9, 0.0, 1.8]


def build_dataset(root, category="car", n_key=3, sweeps_per_key=2):
    """Writes a 1-scene nuScenes-schema dataset; returns table_dir path.

    Lidar chain runs at sweeps_per_key × the keyframe rate; cameras are
    written only at keyframes with timestamps offset by +1 µs so the
    full-rate closest-timestamp pairing is exercised.
    """
    root = Path(root)
    table_dir = root / "v1.0-mini"
    table_dir.mkdir(parents=True, exist_ok=True)
    (root / "lidar").mkdir(exist_ok=True)
    (root / "images").mkdir(exist_ok=True)

    T = {n: [] for n in ["category", "instance", "sensor", "calibrated_sensor",
                         "ego_pose", "log", "scene", "sample", "sample_data",
                         "sample_annotation", "attribute", "visibility", "map"]}
    T["category"].append({"token": "cat0", "name": category, "description": ""})
    T["sensor"] += [
        {"token": "sen_lid", "channel": "LIDAR_TOP", "modality": "lidar"},
        {"token": "sen_cam", "channel": "CAM_FRONT", "modality": "camera"},
    ]
    T["calibrated_sensor"] += [
        {"token": "cs_lid", "sensor_token": "sen_lid",
         "translation": LIDAR_T, "rotation": yaw_quat(0.02),
         "camera_intrinsic": []},
        {"token": "cs_cam", "sensor_token": "sen_cam",
         "translation": [1.7, 0.02, 1.5],
         "rotation": list(mat_to_quat(CAM_ROT)),
         "camera_intrinsic": CAM_INTRINSIC},
    ]

    rng = np.random.RandomState(0)
    n_sweeps = n_key * sweeps_per_key
    samples = [f"samp{i}" for i in range(n_key)]
    for i in range(n_key):
        T["sample"].append({
            "token": samples[i], "scene_token": "scene0",
            "timestamp": 1_000_000 + i * sweeps_per_key * 100_000,
            "prev": samples[i - 1] if i else "",
            "next": samples[i + 1] if i + 1 < n_key else "",
        })
    T["scene"].append({
        "token": "scene0", "log_token": "log0", "nbr_samples": n_key,
        "first_sample_token": samples[0], "last_sample_token": samples[-1],
        "name": "scene-0001", "description": "",
    })
    T["log"].append({"token": "log0", "logfile": "", "vehicle": "v",
                     "date_captured": "", "location": "boston-seaport"})

    # ego travels +x globally with slow yaw drift
    def ego_pose(t_us, k):
        return {"token": f"ego{k}", "timestamp": t_us,
                "translation": [5.0 * k, 0.3 * k, 0.0],
                "rotation": yaw_quat(0.05 * k)}

    # lidar chain (every sweep) + camera chain (keyframes only, +1 µs)
    lid_tokens = [f"sd_lid{k}" for k in range(n_sweeps)]
    cam_tokens = [f"sd_cam{i}" for i in range(n_key)]
    for k in range(n_sweeps):
        t_us = 1_000_000 + k * 100_000
        T["ego_pose"].append(ego_pose(t_us, k))
        pts = rng.uniform(-20, 20, (64, 5)).astype(np.float32)
        pts[:, 4] = rng.randint(0, 40, 64)
        fn = f"lidar/sweep{k}.bin"
        pts.tofile(root / fn)
        is_key = k % sweeps_per_key == 0
        T["sample_data"].append({
            "token": lid_tokens[k],
            "sample_token": samples[k // sweeps_per_key],
            "ego_pose_token": f"ego{k}", "calibrated_sensor_token": "cs_lid",
            "timestamp": t_us, "fileformat": "bin", "is_key_frame": is_key,
            "height": 0, "width": 0, "filename": fn,
            "prev": lid_tokens[k - 1] if k else "",
            "next": lid_tokens[k + 1] if k + 1 < n_sweeps else "",
        })
    from PIL import Image

    for i in range(n_key):
        k = i * sweeps_per_key
        t_us = 1_000_001 + k * 100_000
        T["ego_pose"].append({**ego_pose(t_us, k), "token": f"egocam{i}"})
        fn = f"images/frame{i}.jpg"
        Image.new("RGB", (IMG_W, IMG_H), (30, 30, 30)).save(root / fn)
        T["sample_data"].append({
            "token": cam_tokens[i], "sample_token": samples[i],
            "ego_pose_token": f"egocam{i}", "calibrated_sensor_token": "cs_cam",
            "timestamp": t_us, "fileformat": "jpg", "is_key_frame": True,
            "height": IMG_H, "width": IMG_W, "filename": fn,
            "prev": cam_tokens[i - 1] if i else "",
            "next": cam_tokens[i + 1] if i + 1 < n_key else "",
        })

    # one instance, annotated at every keyframe, ~12 m ahead of the ego
    T["instance"].append({"token": "inst0", "category_token": "cat0",
                          "nbr_annotations": n_key,
                          "first_annotation_token": "ann0",
                          "last_annotation_token": f"ann{n_key - 1}"})
    for i in range(n_key):
        k = i * sweeps_per_key
        T["sample_annotation"].append({
            "token": f"ann{i}", "sample_token": samples[i],
            "instance_token": "inst0", "visibility_token": "",
            "attribute_tokens": [],
            "translation": [5.0 * k + 12.0, 0.3 * k + 0.5, 0.9],
            "size": [1.9, 4.5, 1.7],  # w, l, h
            "rotation": yaw_quat(0.05 * k + 0.3),
            "prev": f"ann{i - 1}" if i else "",
            "next": f"ann{i + 1}" if i + 1 < n_key else "",
            "num_lidar_pts": 50, "num_radar_pts": 0,
        })

    for name, rows in T.items():
        (table_dir / f"{name}.json").write_text(json.dumps(rows))
    return table_dir


def test_mat_quat_roundtrip():
    rng = np.random.RandomState(3)
    for _ in range(10):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        R = converters.quat_to_matrix(q)
        q2 = mat_to_quat(R)
        np.testing.assert_allclose(converters.quat_to_matrix(q2), R, atol=1e-10)


def test_reverse_index(tmp_path):
    build_dataset(tmp_path)
    nt = NuTables(tmp_path, tmp_path / "v1.0-mini")
    samp = nt.get("sample", "samp1")
    assert samp["data"]["LIDAR_TOP"] == "sd_lid2"
    assert samp["data"]["CAM_FRONT"] == "sd_cam1"
    assert samp["anns"] == ["ann1"]
    ann = nt.get("sample_annotation", "ann1")
    assert ann["category_name"] == "car"
    sd = nt.get("sample_data", "sd_lid1")
    assert sd["sensor_modality"] == "lidar" and not sd["is_key_frame"]


def test_get_sample_data_box_transform(tmp_path):
    build_dataset(tmp_path)
    nt = NuTables(tmp_path, tmp_path / "v1.0-mini")
    path, boxes, intr = nt.get_sample_data("sd_lid2", selected_anntokens=["ann1"])
    assert intr is None and path.endswith("sweep2.bin")
    ann = nt.get("sample_annotation", "ann1")
    pose = nt.get("ego_pose", "ego2")
    cs = nt.get("calibrated_sensor", "cs_lid")
    R_e = converters.quat_to_matrix(pose["rotation"])
    R_s = converters.quat_to_matrix(cs["rotation"])
    expect = R_s.T @ (R_e.T @ (np.array(ann["translation"])
                               - np.array(pose["translation"]))
                      - np.array(cs["translation"]))
    np.testing.assert_allclose(boxes[0].center, expect, atol=1e-12)
    R_box = converters.quat_to_matrix(ann["rotation"])
    np.testing.assert_allclose(boxes[0].rotation_matrix,
                               R_s.T @ R_e.T @ R_box, atol=1e-12)


def _check_kitti_export(store, n_frames, ann_lidar_centers):
    store = Path(store) / "training"
    for i in range(n_frames):
        name = f"{i:06d}"
        for sub, ext in [("velodyne", "bin"), ("calib", "txt"), ("oxts", "txt"),
                         ("l2e", "npy"), ("image_2", "png"), ("label_2", "txt")]:
            assert osp.exists(store / sub / f"{name}.{ext}"), (sub, name)
        calib = kitti_io.Calibration(str(store / "calib" / f"{name}.txt"))
        labels = (store / "label_2" / f"{name}.txt").read_text().strip().splitlines()
        assert len(labels) == 1
        f = labels[0].split(" ")
        assert f[0] == "Dynamic"
        h, w, l = map(float, f[8:11])
        np.testing.assert_allclose([h, w, l], [1.7, 1.9, 4.5], atol=1e-6)
        # label location (camera frame) → lidar frame must equal the
        # annotation center from get_sample_data (bottom-center offset in y)
        loc_cam = np.array([float(f[11]), float(f[12]) - h / 2, float(f[13])])
        loc_lidar = calib.project_rect_to_velo(loc_cam[None])[0]
        # tolerance bounded by the label file's 2-decimal precision
        np.testing.assert_allclose(loc_lidar, ann_lidar_centers[i], atol=1e-2)


def _ann_centers_in_kitti_lidar(nt, lid_tokens, ann_tokens, yaw=np.pi):
    """Annotation centers in the KITTI-rotated lidar frame of each sweep.

    yaw matches the converter's kitti→nu rotation: π for Lyft
    (reference lyft2kitti.py:181), π/2 for nuScenes (KITTI2NU_YAW)."""
    out = []
    rot = converters.quat_to_matrix([np.cos(yaw / 2), 0, 0, -np.sin(yaw / 2)])
    for lt, at in zip(lid_tokens, ann_tokens):
        _, boxes, _ = nt.get_sample_data(lt, selected_anntokens=[at])
        out.append(rot @ boxes[0].center)
    return out


def test_lyft_converter_e2e(tmp_path):
    data = tmp_path / "lyft"
    store = tmp_path / "kitti"
    build_dataset(data, category="car")
    conv = converters.LyftToKittiConverter(
        store, data, data / "v1.0-mini", use_sdk=False)
    assert isinstance(conv.lyft_ds, NuTables)
    conv.convert()
    nt = conv.lyft_ds
    centers = _ann_centers_in_kitti_lidar(
        nt, ["sd_lid0", "sd_lid2", "sd_lid4"], ["ann0", "ann1", "ann2"])
    _check_kitti_export(store, 3, centers)
    # velodyne bin round-trips the 180°-rotated raw sweep (lyft2kitti:365)
    raw = load_lidar(data / "lidar" / "sweep0.bin", 5)[:, :4]
    rot = converters.quat_to_matrix([np.cos(np.pi / 2), 0, 0, -np.sin(np.pi / 2)])
    raw[:, :3] = raw[:, :3] @ rot.T
    got = np.fromfile(store / "training" / "velodyne" / "000000.bin",
                      dtype=np.float32).reshape(-1, 4)
    np.testing.assert_allclose(got, raw, atol=1e-6)


def test_nusc_converter_e2e(tmp_path):
    data = tmp_path / "nusc"
    store = tmp_path / "kitti"
    build_dataset(data, category="vehicle.car")
    conv = converters.NuscToKittiConverter(
        store, data, version="v1.0-mini", use_sdk=False)
    assert isinstance(conv.nusc, NuTables)
    ann_samples, seq_map = conv.samples_annotated()
    assert len(ann_samples) == 3 and seq_map["scene0"] == [0, 1, 2]
    full, tracks = conv.samples_full_rate()
    assert len(full) == 6 and tracks == [[0, 1, 2, 3, 4, 5]]
    # closest-timestamp camera pairing: sweep k pairs with keyframe cam
    assert full[0] == ("sd_lid0", "sd_cam0")
    assert full[1] == ("sd_lid1", "sd_cam0") or full[1] == ("sd_lid1", "sd_cam1")
    for i, (lt, ct, anns) in enumerate(ann_samples):
        conv.process_pair(i, lt, ct, ann_tokens=anns)
    centers = _ann_centers_in_kitti_lidar(
        conv.nusc, ["sd_lid0", "sd_lid2", "sd_lid4"], ["ann0", "ann1", "ann2"],
        yaw=conv.KITTI2NU_YAW)
    _check_kitti_export(store, 3, centers)


def test_label_box_projects_into_image(tmp_path):
    data = tmp_path / "lyft"
    store = tmp_path / "kitti"
    build_dataset(data, category="car")
    converters.LyftToKittiConverter(
        store, data, data / "v1.0-mini", use_sdk=False).convert()
    f = (Path(store) / "training" / "label_2" / "000000.txt").read_text().split()
    x1, y1, x2, y2 = map(float, f[4:8])
    assert 0 <= x1 < x2 <= IMG_W and 0 <= y1 < y2 <= IMG_H
