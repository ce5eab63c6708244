"""Native host-ops library tests (builds csrc on first use)."""
import numpy as np
import pytest

from modest_tpu.utils import box_np, native


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native.available():
        pytest.skip("no C++ toolchain available")


def test_load_velo(tmp_path, rng):
    pts = rng.randn(500, 4).astype(np.float32)
    f = tmp_path / "a.bin"
    pts.tofile(f)
    got = native.load_velo(f)
    np.testing.assert_array_equal(got, pts)


def test_fov_mask_matches_numpy(rng):
    from test_geometry import make_calib

    calib = make_calib()
    pts = rng.randn(2000, 4).astype(np.float32) * 20
    rect = (calib.R0 @ calib.V2C[:, :3], (calib.R0 @ calib.V2C[:, 3]))
    rect_3x4 = np.hstack([rect[0], rect[1][:, None]])
    got = native.fov_mask(pts, rect_3x4, calib.P2, (400, 1200))
    # numpy oracle via kitti_io
    from modest_tpu.utils.kitti_io import get_fov_flag

    want = get_fov_flag(calib.lidar_to_rect(pts[:, :3].astype(np.float64)), (400, 1200), calib)
    assert (got == want).mean() > 0.999  # float32-vs-64 boundary points only


def test_points_in_boxes_matches_numpy(rng):
    pts = rng.uniform(-20, 20, (3000, 4)).astype(np.float32)
    boxes = np.array(
        [[0, 0, 0, 8, 4, 4, 0.4], [10, -5, 1, 6, 3, 2, -1.0]], np.float32
    )
    got = native.points_in_boxes_index(pts, boxes)
    want = box_np.points_in_box_index(pts[:, :3].astype(np.float64), boxes.astype(np.float64))
    assert (got == want).mean() > 0.999


@pytest.mark.slow
def test_bev_iou_matches_jax(rng):
    import jax.numpy as jnp

    from modest_tpu.ops.iou3d import boxes_iou_bev

    boxes_a = np.stack([
        np.array([rng.uniform(-5, 5), rng.uniform(-5, 5), 0,
                  rng.uniform(1, 5), rng.uniform(1, 4), 2, rng.uniform(-3, 3)])
        for _ in range(12)
    ]).astype(np.float32)
    boxes_b = boxes_a[::-1].copy()
    got = native.bev_iou(boxes_a, boxes_b)
    want = np.asarray(boxes_iou_bev(jnp.asarray(boxes_a), jnp.asarray(boxes_b)))
    np.testing.assert_allclose(got, want, atol=2e-3)
