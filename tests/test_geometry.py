"""Geometry / IO unit tests: calibration round-trips, pose algebra, box math."""
import numpy as np
import pytest

from modest_tpu.utils import box_np, kitti_io, pose


def make_calib():
    # P[2,3] = 0: img_to_rect is the exact inverse of rect_to_img only then
    # (the reference's calibration has the same approximation for P[2,3] != 0).
    P2 = np.array([[721.5, 0.0, 609.6, 44.9], [0.0, 721.5, 172.9, 0.2], [0.0, 0.0, 1.0, 0.0]])
    R0 = np.array([[0.9999, 0.0098, -0.0074], [-0.0099, 0.9999, -0.0043], [0.0074, 0.0043, 0.9999]])
    # orthonormalize R0
    u, _, vt = np.linalg.svd(R0)
    R0 = u @ vt
    V2C = np.array(
        [[0.0076, -0.9999, -0.0002, -0.0027], [0.0148, 0.0003, -0.9998, -0.0576], [0.9998, 0.0075, 0.0148, -0.3321]]
    )
    u, _, vt = np.linalg.svd(V2C[:, :3])
    V2C = np.hstack([u @ vt, V2C[:, 3:4]])
    return kitti_io.Calibration({"P2": P2, "P3": P2, "R0_rect": R0, "Tr_velo_to_cam": V2C})


def test_calib_roundtrip(rng):
    calib = make_calib()
    pts = rng.randn(100, 3) * 20
    rect = calib.lidar_to_rect(pts)
    back = calib.rect_to_lidar(rect)
    np.testing.assert_allclose(back, pts, atol=1e-9)


def test_calib_file_roundtrip(tmp_path):
    calib = make_calib()
    f = tmp_path / "000000.txt"
    with open(f, "w") as fh:
        fh.write("P2: " + " ".join(map(str, calib.P2.reshape(-1))) + "\n")
        fh.write("P3: " + " ".join(map(str, calib.P3.reshape(-1))) + "\n")
        fh.write("R0_rect: " + " ".join(map(str, calib.R0.reshape(-1))) + "\n")
        fh.write("Tr_velo_to_cam: " + " ".join(map(str, calib.V2C.reshape(-1))) + "\n")
    calib2 = kitti_io.Calibration(f)
    np.testing.assert_allclose(calib2.V2C, calib.V2C)


def test_img_to_rect_roundtrip(rng):
    calib = make_calib()
    pts_rect = np.abs(rng.randn(50, 3)) * np.array([5, 2, 30]) + np.array([0, 0, 5])
    uv, depth = calib.rect_to_img(pts_rect)
    back = calib.img_to_rect(uv[:, 0], uv[:, 1], depth)
    np.testing.assert_allclose(back, pts_rect, atol=1e-6)


def test_euler_roundtrip(rng):
    for _ in range(20):
        ang = rng.uniform(-1.5, 1.5, 3)
        R = pose.euler_xyz_to_matrix(ang)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
        ang2 = pose.matrix_to_euler_xyz(R)
        np.testing.assert_allclose(pose.euler_xyz_to_matrix(ang2), R, atol=1e-10)


def test_euler_matches_scipy(rng):
    scipy_R = pytest.importorskip("scipy.spatial.transform").Rotation
    for _ in range(10):
        ang = rng.uniform(-3, 3, 3)
        ours = pose.euler_xyz_to_matrix(ang)
        ref = scipy_R.from_euler("xyz", ang).as_matrix()
        np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_relative_pose_identity(rng):
    """Relative pose of a frame w.r.t. itself is identity."""
    l2e = np.eye(4)
    l2e[:3, :3] = pose.euler_xyz_to_matrix(rng.uniform(-1, 1, 3))
    l2e[:3, 3] = rng.randn(3)
    ego = np.eye(4)
    ego[:3, :3] = pose.euler_xyz_to_matrix(rng.uniform(-1, 1, 3))
    ego[:3, 3] = rng.randn(3) * 100
    rel = pose.get_relative_pose(l2e, ego, l2e, ego)
    np.testing.assert_allclose(rel, np.eye(4), atol=1e-4)


def test_relative_pose_composition(rng):
    """Points mapped through the relative pose land where direct chain says."""
    def rand_se3():
        T = np.eye(4)
        T[:3, :3] = pose.euler_xyz_to_matrix(rng.uniform(-1, 1, 3))
        T[:3, 3] = rng.randn(3) * 10
        return T

    fl2e, fego, ql2e, qego = rand_se3(), rand_se3(), rand_se3(), rand_se3()
    rel = pose.get_relative_pose(fl2e, fego, ql2e, qego)
    pts = rng.randn(20, 3).astype(np.float64)
    got = pose.transform_points(pts, rel.astype(np.float64))
    k = pose.KITTI2NU_LYFT
    world = pose.transform_points(pts, qego @ ql2e @ k)
    expect = pose.transform_points(world, np.linalg.inv(fego @ fl2e @ k))
    np.testing.assert_allclose(got, expect, atol=1e-3)


def test_boxes_to_corners_axis_aligned():
    box = np.array([[1.0, 2.0, 3.0, 4.0, 2.0, 1.0, 0.0]])
    corners = box_np.boxes_to_corners_3d(box)
    assert corners.shape == (1, 8, 3)
    np.testing.assert_allclose(corners[0].min(0), [-1, 1, 2.5])
    np.testing.assert_allclose(corners[0].max(0), [3, 3, 3.5])


def test_boxes_to_corners_rotated_90():
    box = np.array([[0.0, 0.0, 0.0, 4.0, 2.0, 1.0, np.pi / 2]])
    corners = box_np.boxes_to_corners_3d(box)
    np.testing.assert_allclose(corners[0, :, 0].max(), 1.0, atol=1e-6)
    np.testing.assert_allclose(corners[0, :, 1].max(), 2.0, atol=1e-6)


def test_points_in_boxes(rng):
    boxes = np.array([[0, 0, 0, 2, 2, 2, 0.5], [10, 0, 0, 4, 2, 2, 0.0]], dtype=float)
    pts = np.array([[0, 0, 0], [10, 0.9, 0], [10, 1.1, 0], [5, 5, 5]], dtype=float)
    idx = box_np.points_in_box_index(pts, boxes)
    assert idx.tolist() == [0, 1, -1, -1]


def test_camera_lidar_box_roundtrip(rng):
    calib = make_calib()
    cam = np.stack(
        [
            rng.uniform(-10, 10, 5),
            rng.uniform(0, 3, 5),
            rng.uniform(5, 60, 5),
            rng.uniform(2, 5, 5),  # l
            rng.uniform(1, 2, 5),  # h
            rng.uniform(1, 2.5, 5),  # w
            rng.uniform(-np.pi, np.pi, 5),
        ],
        axis=1,
    )
    lidar = box_np.boxes3d_kitti_camera_to_lidar(cam, calib)
    cam2 = box_np.boxes3d_lidar_to_kitti_camera(lidar, calib)
    np.testing.assert_allclose(cam2[:, :6], cam[:, :6], atol=1e-8)
    # heading roundtrips modulo 2π
    d = (cam2[:, 6] - cam[:, 6]) / (2 * np.pi)
    np.testing.assert_allclose(d, np.round(d), atol=1e-8)


def test_label_io_roundtrip(tmp_path):
    line = "Dynamic -1 -1 0.5 10.0 20.0 110.0 120.0 1.5 1.8 4.2 1.0 2.0 30.0 0.3"
    f = tmp_path / "000001.txt"
    f.write_text(line + "\n")
    objs = kitti_io.read_label(f)
    assert len(objs) == 1
    o = objs[0]
    assert o.cls_type == "Dynamic"
    assert o.h == 1.5 and o.w == 1.8 and o.l == 4.2
    np.testing.assert_allclose(o.t, [1.0, 2.0, 30.0])
    assert o.ry == 0.3


def test_velo_io_roundtrip(tmp_path, rng):
    pts = rng.randn(100, 4).astype(np.float32)
    f = tmp_path / "scan.bin"
    kitti_io.save_velo_scan(f, pts)
    back = kitti_io.load_velo_scan(f)
    np.testing.assert_array_equal(back, pts)


def test_plane_io_roundtrip(tmp_path):
    plane = np.array([0.01, -0.999, 0.02, 1.65])
    plane = plane / np.linalg.norm(plane[:3])
    f = tmp_path / "plane.txt"
    kitti_io.save_plane(f, plane)
    back = kitti_io.load_plane(f)
    np.testing.assert_allclose(back, plane, atol=1e-6)
