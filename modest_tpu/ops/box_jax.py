"""Device-side (jnp) 3D box geometry — jit/vmap-friendly twins of box_np."""
from __future__ import annotations

import jax
import jax.numpy as jnp

CORNER_TEMPLATE = (
    jnp.array(
        [
            [1, 1, -1], [1, -1, -1], [-1, -1, -1], [-1, 1, -1],
            [1, 1, 1], [1, -1, 1], [-1, -1, 1], [-1, 1, 1],
        ],
        dtype=jnp.float32,
    )
    / 2
)


def limit_period(val, offset=0.5, period=jnp.pi):
    return val - jnp.floor(val / period + offset) * period


def rotate_points_along_z(points, angle):
    """points (..., N, 3+C), angle (...,) → rotated CCW around +z.

    Elementwise (VPU) to stay exactly fp32 on TPU.
    """
    c = jnp.cos(angle)[..., None]
    s = jnp.sin(angle)[..., None]
    x, y = points[..., 0], points[..., 1]
    xr = x * c - y * s
    yr = x * s + y * c
    return jnp.concatenate([xr[..., None], yr[..., None], points[..., 2:]], axis=-1)


def boxes_to_corners_3d(boxes3d):
    """(N, 7) → (N, 8, 3)."""
    corners = boxes3d[:, None, 3:6] * CORNER_TEMPLATE[None]
    corners = rotate_points_along_z(corners, boxes3d[:, 6])
    return corners + boxes3d[:, None, 0:3]


def enlarge_box3d(boxes3d, extra_width=(0, 0, 0)):
    return boxes3d.at[..., 3:6].add(jnp.asarray(extra_width, boxes3d.dtype))


def points_in_boxes_mask(points, boxes):
    """points (N, 3), boxes (M, 7) → (M, N) bool (z is box center)."""
    shift = points[None, :, :3] - boxes[:, None, 0:3]
    c = jnp.cos(-boxes[:, 6])[:, None]
    s = jnp.sin(-boxes[:, 6])[:, None]
    lx = shift[..., 0] * c - shift[..., 1] * s
    ly = shift[..., 0] * s + shift[..., 1] * c
    return (
        (jnp.abs(shift[..., 2]) <= boxes[:, None, 5] / 2)
        & (jnp.abs(lx) <= boxes[:, None, 3] / 2)
        & (jnp.abs(ly) <= boxes[:, None, 4] / 2)
    )


def points_in_boxes_index(points, boxes, box_valid=None):
    """(N,) index of the first containing box, -1 if none.

    box_valid masks out padded gt rows (all-zero boxes would otherwise never
    match anyway, but be explicit).
    """
    mask = points_in_boxes_mask(points, boxes)
    if box_valid is not None:
        mask = mask & box_valid[:, None]
    any_hit = mask.any(axis=0)
    first = jnp.argmax(mask, axis=0)
    return jnp.where(any_hit, first, -1)
