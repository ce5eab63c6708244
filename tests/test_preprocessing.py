"""Preprocessing-stage tests: geo split, traversal index, plane files,
converter math."""
import numpy as np
import pytest

from modest_tpu.preprocessing import converters, split_traintest
from modest_tpu.preprocessing.ransac_planes import plane_for_frame
from modest_tpu.utils.pose import pose_from_oxts_line


def straight_line_poses(n, y0, spacing=2.0, x0=0.0):
    poses = []
    for i in range(n):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [x0 + i * spacing, y0, 0.0]
        poses.append(T)
    return poses


def test_geo_split():
    track_list = [[0, 1], [2, 3], [4, 5]]
    poses = [straight_line_poses(2, y) for y in (100.0, 2000.0, 100.0)]
    train, test = split_traintest.geo_split(track_list, poses, cutoff=1700.0, axis=1)
    assert train == [[0, 1], [4, 5]]
    assert test == [[2, 3]]


def test_traversal_index_parallel_roads():
    """3 traversals of the same straight road → every interior frame of each
    gets the 2 others as neighbors."""
    n = 60
    track_list = [list(range(0, n)), list(range(n, 2 * n)), list(range(2 * n, 3 * n))]
    poses = [straight_line_poses(n, y0=dy) for dy in (0.0, 0.5, 1.0)]
    valid = split_traintest.build_traversal_index(
        track_list, poses, max_allow_dist=3.0, dis_choice=np.arange(2, 21, 2),
        only_forward=True,
    )
    assert len(valid) > n  # many frames valid across traversals
    origin_idx = track_list[0][5]
    assert origin_idx in valid
    seq_id, frame, neighbors = valid[origin_idx]
    assert (seq_id, frame) == (0, 5)
    assert {s for s, _ in neighbors} == {1, 2}
    # neighbor frames are ordered along-track ahead of the closest frame
    for _, indices in neighbors:
        assert indices[0] == 5  # closest frame
        assert all(b > a for a, b in zip(indices, indices[1:]))


def test_traversal_index_requires_two():
    n = 30
    track_list = [list(range(0, n)), list(range(n, 2 * n))]
    poses = [straight_line_poses(n, 0.0), straight_line_poses(n, 0.5)]
    valid = split_traintest.build_traversal_index(
        track_list, poses, 3.0, np.arange(2, 11, 2), True
    )
    assert len(valid) == 0  # only one other traversal each → never >= 2


def test_plane_for_frame(rng):
    # rect coords: ground at y = +1.7 (below camera), road band points
    n = 3000
    pts = np.stack(
        [rng.uniform(-15, 15, n), rng.normal(1.7, 0.01, n), rng.uniform(0, 60, n)], 1
    )
    plane = plane_for_frame(pts, min_h=1.5, max_h=2.0)
    np.testing.assert_allclose(np.abs(plane[1]), 1.0, atol=0.01)
    np.testing.assert_allclose(abs(plane[3]), 1.7, atol=0.05)
    # degenerate input → default plane
    fallback = plane_for_frame(pts[:2])
    np.testing.assert_allclose(fallback, [0, -1, 0, 1.65])


def test_quat_to_matrix_known_values():
    np.testing.assert_allclose(converters.quat_to_matrix([1, 0, 0, 0]), np.eye(3), atol=1e-12)
    # 90° about z
    q = [np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)]
    R = converters.quat_to_matrix(q)
    np.testing.assert_allclose(R @ [1, 0, 0], [0, 1, 0], atol=1e-12)


def test_transform_matrix_inverse():
    q = [0.9, 0.1, 0.2, 0.05]
    q = list(np.asarray(q) / np.linalg.norm(q))
    t = [1.0, -2.0, 3.0]
    T = converters.transform_matrix(t, q)
    Ti = converters.transform_matrix(t, q, inverse=True)
    np.testing.assert_allclose(T @ Ti, np.eye(4), atol=1e-12)


def test_oxts_roundtrip():
    q = [np.cos(0.3), 0, 0, np.sin(0.3)]
    line = converters.oxts_line_from_pose([10.0, 20.0, 1.0], q)
    pose = pose_from_oxts_line([float(x) for x in line.split()])
    np.testing.assert_allclose(pose[:3, 3], [10, 20, 1], atol=1e-5)
    np.testing.assert_allclose(pose[:3, :3], converters.quat_to_matrix(q), atol=1e-5)


def test_box_nu_to_kitti_camera():
    """A nu-lidar box ahead of the ego maps to a camera box in front (z>0),
    with the bottom-center convention."""
    # velo_to_cam (KITTI standard orientation): x_c=-y_l, y_c=-z_l, z_c=x_l
    velo_to_cam_kitti = np.array(
        [[0, -1, 0, 0], [0, 0, -1, 0.5], [1, 0, 0, 0], [0, 0, 0, 1]], np.float64
    )
    # nu-lidar = KITTI-lidar rotated by pi around z: box ahead in nu frame is x=-10
    center_nu = [-10.0, 0.0, -0.5]
    wlh = (1.8, 4.2, 1.5)
    rot = converters.quat_to_matrix([np.cos(np.pi / 2), 0, 0, np.sin(np.pi / 2)])  # yaw pi
    box7 = converters.box_nu_lidar_to_kitti_camera(center_nu, wlh, rot, velo_to_cam_kitti)
    x, y, z, l, h, w, ry = box7
    assert z > 0  # in front of the camera
    np.testing.assert_allclose([l, h, w], [4.2, 1.5, 1.8], atol=1e-6)
    np.testing.assert_allclose(z, 10.0, atol=1e-6)
    np.testing.assert_allclose(y, 0.5 + 0.5 + 0.75, atol=1e-6)  # bottom center
    # KITTI convention: lidar-forward box ↔ camera ry = −π/2 (matches
    # box_np.boxes3d_lidar_to_kitti_camera for heading 0)
    np.testing.assert_allclose(ry, -np.pi / 2, atol=1e-6)


def test_project_box_and_occlusion():
    P = np.array([[700.0, 0, 600, 0], [0, 700.0, 200, 0], [0, 0, 1, 0]])
    box7 = np.array([0.0, 1.0, 20.0, 4.0, 1.5, 1.8, 0.0])
    proj = converters.project_box_to_2d(box7, P, 400, 1200)
    assert proj["valid"]
    b = proj["bbox"]
    assert 0 <= b[0] < b[2] <= 1200 and 0 <= b[1] < b[3] <= 400
    objs = [
        {"bbox_2d": (100, 100, 200, 200), "depth": 10.0},
        {"bbox_2d": (150, 150, 250, 250), "depth": 20.0},  # behind → occluded
    ]
    out = converters.estimate_occlusions(objs, 400, 1200)
    front = [o for o in out if o["depth"] == 10.0][0]
    back = [o for o in out if o["depth"] == 20.0][0]
    assert front["occluded"] == 0
    assert back["occluded"] >= 1


def test_kitti_label_line_parses():
    from modest_tpu.utils.kitti_io import Object3d

    line = converters.kitti_label_line(
        "Dynamic", [1.0, 2.0, 30.0, 4.2, 1.5, 1.8, 0.3], (10, 20, 110, 120), 0.0, 1, 0.5
    )
    obj = Object3d(line)
    assert obj.cls_type == "Dynamic"
    np.testing.assert_allclose([obj.l, obj.w, obj.h], [4.2, 1.8, 1.5], atol=1e-2)
    assert obj.occlusion == 1


def test_gen_gt_mask_points_in_camera_box():
    import types

    from modest_tpu.cli.gen_gt_mask import points_in_camera_box

    obj = types.SimpleNamespace(t=np.array([0.0, 1.0, 20.0]), l=4.0, w=2.0, h=1.5, ry=0.0)
    pts = np.array([[0, 0.5, 20], [0, 1.5, 20], [3, 0.5, 20], [0, 0.5, 50]])
    mask = points_in_camera_box(pts, obj)
    assert mask.tolist() == [True, False, False, False]


def test_kitti_res_roundtrip_to_nuscenes():
    """box_nu_lidar_to_kitti_camera ∘ kitti_res_to_nuscenes_box == identity."""
    rng = np.random.RandomState(3)
    velo_to_cam_kitti = np.array(
        [[0, -1, 0, 0.1], [0, 0, -1, 0.4], [1, 0, 0, -0.2], [0, 0, 0, 1]], np.float64
    )
    for _ in range(10):
        center = rng.uniform(-30, 30, 3)
        wlh = tuple(rng.uniform(1, 4, 3))
        yaw = rng.uniform(-np.pi, np.pi)
        c, s = np.cos(yaw), np.sin(yaw)
        rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
        box7 = converters.box_nu_lidar_to_kitti_camera(
            center, wlh, rot, velo_to_cam_kitti, kitti_to_nu_yaw=np.pi / 2
        )
        c_nu, wlh2, yaw2 = converters.kitti_res_to_nuscenes_box(
            box7, velo_to_cam_kitti, kitti_to_nu_yaw=np.pi / 2
        )
        np.testing.assert_allclose(c_nu, center, atol=1e-9)
        np.testing.assert_allclose(wlh2, wlh, atol=1e-9)
        d = (yaw2 - yaw) / np.pi
        np.testing.assert_allclose(d, np.round(d), atol=1e-9)  # mod pi (box symmetric... mod 2pi ideally)


def test_find_closest_integer():
    idx, val, diff = converters.find_closest_integer(105, np.array([100, 104, 110]))
    assert (idx, val, diff) == (1, 104, 1)
