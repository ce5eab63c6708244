"""x-windowed RoI pool (MODEST_POOL_WINDOW experiment) vs the dense path.

The windowed variant must (a) only ever select true in-box points, (b)
recover EXACTLY the in-box point set whenever the box's x-rank span fits
the window, and (c) flag the same empty boxes.
"""
import jax.numpy as jnp
import numpy as np

from modest_tpu.ops import pointnet2 as p2


def _scene(rng, n=2048):
    pts = rng.uniform(-20, 20, (n, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-1.5, 0.5, n)
    # one dense cluster inside a known box
    pts[:200] = np.array([4.0, 1.0, -0.8]) + rng.uniform(
        -0.5, 0.5, (200, 3)) * [1.8, 0.8, 0.6]
    return pts


def _in_box_mask(pts, box):
    shift = pts - box[:3]
    c, s = np.cos(-box[6]), np.sin(-box[6])
    lx = shift[:, 0] * c - shift[:, 1] * s
    ly = shift[:, 0] * s + shift[:, 1] * c
    return ((np.abs(shift[:, 2]) <= box[5] / 2) & (np.abs(lx) <= box[3] / 2)
            & (np.abs(ly) <= box[4] / 2))


def test_windowed_pool_matches_inbox_sets(rng):
    n, k, w = 2048, 64, 512
    pts = _scene(rng, n)
    feats = rng.randn(n, 6).astype(np.float32)
    boxes = np.array([
        [4.0, 1.0, -0.8, 4.0, 2.0, 1.6, 0.3],     # dense cluster box
        [-10.0, -10.0, -1.0, 3.5, 1.8, 1.5, -0.7],  # sparse region
        [19.5, 19.5, 10.0, 1.0, 1.0, 1.0, 0.0],    # empty box
    ], np.float32)[None]

    pooled, empty = p2._roipoint_pool3d_windowed(
        jnp.asarray(pts[None]), jnp.asarray(feats[None]), jnp.asarray(boxes),
        k, w)
    pooled, empty = np.asarray(pooled), np.asarray(empty)

    for r in range(boxes.shape[1]):
        mask = _in_box_mask(pts, boxes[0, r])
        want = {tuple(np.round(p, 4)) for p in pts[mask]}
        if not want:
            assert empty[0, r] == 1
            continue
        assert empty[0, r] == 0
        got = {tuple(np.round(p, 4)) for p in pooled[0, r, :, :3]}
        # every selected point is a true in-box point...
        assert got <= want, "windowed pool selected an out-of-box point"
        # ...and when the in-box count fits k, the whole set is recovered
        # (the cluster's x-span is far below w here)
        if mask.sum() <= k:
            assert got == want
        # features ride along with their point (check one slot)
        p0 = pooled[0, r, 0, :3]
        src = int(np.argmin(np.linalg.norm(pts - p0, axis=1)))
        np.testing.assert_allclose(pooled[0, r, 0, 3:], feats[src], atol=1e-2)


def test_windowed_pool_batch_and_wrap(rng):
    """Short boxes wrap-fill from their first slots, like the dense path."""
    n, k, w = 1024, 128, 256
    pts = rng.uniform(-10, 10, (2, n, 3)).astype(np.float32)
    pts[0, :5] = np.array([0.0, 0.0, 0.0]) + rng.uniform(
        -0.3, 0.3, (5, 3)).astype(np.float32)
    feats = rng.randn(2, n, 2).astype(np.float32)
    boxes = np.zeros((2, 1, 7), np.float32)
    boxes[:, 0] = [0, 0, 0, 1.2, 1.2, 1.2, 0.1]

    pooled, empty = p2._roipoint_pool3d_windowed(
        jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(boxes), k, w)
    pooled = np.asarray(pooled)
    mask0 = _in_box_mask(pts[0], boxes[0, 0])
    cnt = int(mask0.sum())
    if 0 < cnt < k:
        # wrap: slot j repeats slot j % cnt
        np.testing.assert_allclose(pooled[0, 0, cnt], pooled[0, 0, 0])
