"""Rotated IoU / NMS tests: analytic cases, Monte-Carlo oracle, NMS semantics."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from modest_tpu.ops import iou3d  # noqa: E402

pytestmark = pytest.mark.slow


def mc_overlap(box_a, box_b, n=200_000, seed=0):
    """Monte-Carlo BEV intersection area oracle (independent of the impl)."""
    rng = np.random.RandomState(seed)

    def corners(b):
        cx, cy, dx, dy, ang = b[0], b[1], b[3], b[4], b[6]
        local = np.array([[-0.5, -0.5], [0.5, -0.5], [0.5, 0.5], [-0.5, 0.5]]) * [dx, dy]
        c, s = np.cos(ang), np.sin(ang)
        return local @ np.array([[c, s], [-s, c]]) + [cx, cy]

    all_c = np.concatenate([corners(box_a), corners(box_b)])
    lo, hi = all_c.min(0), all_c.max(0)
    pts = rng.uniform(lo, hi, size=(n, 2))

    def inside(b, p):
        sh = p - b[0:2]
        c, s = np.cos(-b[6]), np.sin(-b[6])
        rx = sh[:, 0] * c - sh[:, 1] * s
        ry = sh[:, 0] * s + sh[:, 1] * c
        return (np.abs(rx) <= b[3] / 2) & (np.abs(ry) <= b[4] / 2)

    frac = (inside(box_a, pts) & inside(box_b, pts)).mean()
    return frac * np.prod(hi - lo)


def box(x, y, z, dx, dy, dz, h):
    return np.array([x, y, z, dx, dy, dz, h], dtype=np.float32)


def test_identical_boxes():
    b = box(1, 2, 0, 4, 2, 1.5, 0.3)
    iou = np.asarray(iou3d.boxes_iou_bev(jnp.array([b]), jnp.array([b])))
    np.testing.assert_allclose(iou, [[1.0]], atol=1e-4)
    iou3 = np.asarray(iou3d.boxes_iou3d(jnp.array([b]), jnp.array([b])))
    np.testing.assert_allclose(iou3, [[1.0]], atol=1e-4)


def test_disjoint_boxes():
    a = box(0, 0, 0, 2, 2, 2, 0.7)
    b = box(100, 100, 0, 2, 2, 2, -0.2)
    iou = np.asarray(iou3d.boxes_iou_bev(jnp.array([a]), jnp.array([b])))
    np.testing.assert_allclose(iou, [[0.0]], atol=1e-7)


def test_axis_aligned_analytic():
    a = box(0, 0, 0, 4, 2, 2, 0)
    b = box(1, 0.5, 0, 4, 2, 2, 0)
    # overlap = 3 x 1.5 = 4.5; union = 8 + 8 - 4.5
    iou = float(iou3d.boxes_iou_bev(jnp.array([a]), jnp.array([b]))[0, 0])
    np.testing.assert_allclose(iou, 4.5 / 11.5, atol=1e-4)


def test_nested_boxes():
    big = box(0, 0, 0, 10, 10, 2, 0.3)
    small = box(0.5, -0.5, 0, 1, 2, 2, -1.1)
    ov = float(iou3d.boxes_overlap_bev(jnp.array([big]), jnp.array([small]))[0, 0])
    np.testing.assert_allclose(ov, 2.0, atol=1e-4)


def test_rotated_45_cross():
    # two identical squares, one rotated by 90° → identical footprint
    a = box(0, 0, 0, 2, 2, 2, 0)
    b = box(0, 0, 0, 2, 2, 2, np.pi / 2)
    iou = float(iou3d.boxes_iou_bev(jnp.array([a]), jnp.array([b]))[0, 0])
    np.testing.assert_allclose(iou, 1.0, atol=1e-3)
    # square vs itself rotated 45°: octagon overlap = 8(√2−1)
    c = box(0, 0, 0, 2, 2, 2, np.pi / 4)
    ov = float(iou3d.boxes_overlap_bev(jnp.array([a]), jnp.array([c]))[0, 0])
    np.testing.assert_allclose(ov, 8 * (np.sqrt(2) - 1), atol=1e-3)


@pytest.mark.parametrize("seed", range(5))
def test_random_pairs_vs_monte_carlo(seed):
    rng = np.random.RandomState(seed)
    a = box(rng.uniform(-2, 2), rng.uniform(-2, 2), 0, rng.uniform(1, 5),
            rng.uniform(1, 5), 2, rng.uniform(-np.pi, np.pi))
    b = box(rng.uniform(-2, 2), rng.uniform(-2, 2), 0, rng.uniform(1, 5),
            rng.uniform(1, 5), 2, rng.uniform(-np.pi, np.pi))
    got = float(iou3d.boxes_overlap_bev(jnp.array([a]), jnp.array([b]))[0, 0])
    want = mc_overlap(a, b, n=400_000, seed=seed)
    assert abs(got - want) < 0.05 * max(want, 0.5), (got, want)


def test_symmetry(rng):
    boxes = np.stack(
        [box(*rng.uniform(-3, 3, 2), 0, *rng.uniform(1, 4, 2), 2, rng.uniform(-3, 3))
         for _ in range(8)]
    )
    m = np.asarray(iou3d.boxes_iou_bev(jnp.array(boxes), jnp.array(boxes)))
    np.testing.assert_allclose(m, m.T, atol=1e-4)
    np.testing.assert_allclose(np.diag(m), 1.0, atol=1e-3)


def test_iou3d_height_overlap():
    a = box(0, 0, 0.0, 2, 2, 2, 0)
    b = box(0, 0, 1.0, 2, 2, 2, 0)  # half height overlap
    got = float(iou3d.boxes_iou3d(jnp.array([a]), jnp.array([b]))[0, 0])
    np.testing.assert_allclose(got, 4.0 / 12.0, atol=1e-4)


def _nms_oracle(boxes, scores, thresh):
    """Numpy greedy NMS with identical semantics to the reference nms_gpu."""
    order = np.argsort(-scores, kind="stable")
    keep, suppressed = [], np.zeros(len(boxes), bool)
    iou = np.asarray(iou3d.boxes_iou_bev(jnp.array(boxes), jnp.array(boxes)))
    for i in order:
        if suppressed[i] or not np.isfinite(scores[i]):
            continue
        keep.append(i)
        suppressed[iou[i] > thresh] = True
    return keep


def test_nms_matches_greedy_oracle(rng):
    n = 40
    boxes = np.stack(
        [box(rng.uniform(-10, 10), rng.uniform(-10, 10), 0,
             rng.uniform(2, 5), rng.uniform(1, 3), 2, rng.uniform(-3, 3))
         for _ in range(n)]
    ).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    keep_idx, keep_mask = iou3d.nms_bev(jnp.array(boxes), jnp.array(scores), 0.1, 16)
    got = [int(i) for i, m in zip(keep_idx, keep_mask) if m]
    want = _nms_oracle(boxes, scores, 0.1)[:16]
    assert got == want


def test_nms_blocked_matches_scan_reference(rng):
    """Large-N blocked NMS (while_loop over sorted blocks) == row-scan greedy,
    including heavy-suppression (keeps don't fill) and padding (-inf) cases."""
    for n, keep, thresh, dense in [(1200, 300, 0.5, False), (1500, 100, 0.3, True)]:
        if dense:  # near-duplicate clusters stress suppression
            base = np.stack(
                [box(rng.uniform(-10, 10), rng.uniform(-10, 10), 0,
                     rng.uniform(2, 5), rng.uniform(1, 3), 2, rng.uniform(-3, 3))
                 for _ in range(30)]
            ).astype(np.float32)
            boxes = base[rng.randint(0, 30, n)] + rng.randn(n, 7).astype(np.float32) * 0.05
            boxes[:, 3:6] = np.abs(boxes[:, 3:6]) + 0.5
        else:
            boxes = np.stack(
                [box(rng.uniform(-40, 40), rng.uniform(-40, 40), 0,
                     rng.uniform(2, 5), rng.uniform(1, 3), 2, rng.uniform(-3, 3))
                 for _ in range(n)]
            ).astype(np.float32)
        scores = rng.rand(n).astype(np.float32)
        scores[-50:] = -np.inf  # padding rows
        ki1, km1 = iou3d._nms_blocked(jnp.array(boxes), jnp.array(scores), thresh, keep)
        ki2, km2 = iou3d._nms_scan_reference(jnp.array(boxes), jnp.array(scores), thresh, keep)
        km1, km2 = np.asarray(km1), np.asarray(km2)
        np.testing.assert_array_equal(km1, km2)
        np.testing.assert_array_equal(np.asarray(ki1)[km1], np.asarray(ki2)[km2])


def test_nms_respects_padding():
    boxes = np.zeros((8, 7), np.float32)
    boxes[:, 3:6] = 1
    scores = np.full(8, -np.inf, np.float32)
    scores[2] = 1.0
    keep_idx, keep_mask = iou3d.nms_bev(jnp.array(boxes), jnp.array(scores), 0.1, 4)
    assert int(keep_mask.sum()) == 1
    assert int(keep_idx[0]) == 2
