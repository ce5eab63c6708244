"""RoI-aware voxel pooling (reference: pcdet/ops/roiaware_pool3d, SURVEY O3).

The reference CUDA kernel (src/roiaware_pool3d_kernel.cu:39-313) assigns each
point to its RoI-local voxel cell and max/avg-pools features per cell, with a
stored argmax for the backward pass. The TPU version transforms all points to
each RoI's canonical frame (vmapped), flattens the cell index, and pools with
``jax.ops.segment_max`` / ``segment_sum`` — both natively differentiable, so
no hand-written backward is needed.

Grid convention matches the reference: cell x splits dx (length, heading
axis), y splits dy (width), z splits dz (height). Boxes use this
framework's lidar convention (z = geometric center, as in
utils/box_np.points_in_boxes_mask), not the kernel's bottom-shifted z.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("out_size", "pool_method"))
def roiaware_pool3d(rois, points, point_features, out_size=(6, 6, 6),
                    pool_method: str = "max"):
    """rois (N, 7) [x y z dx dy dz heading], z = geometric center (lidar
    frame); points (P, 3); point_features (P, C). Returns
    (N, gx, gy, gz, C) pooled features — empty cells are 0 (the reference
    initializes the output buffer to zero).
    """
    if isinstance(out_size, int):
        out_size = (out_size,) * 3
    gx, gy, gz = out_size
    n_cells = gx * gy * gz

    def pool_one(roi):
        cx, cy, cz, dx, dy, dz, ry = (roi[i] for i in range(7))
        local = points - jnp.stack([cx, cy, cz])
        c, s = jnp.cos(-ry), jnp.sin(-ry)
        lx = local[:, 0] * c - local[:, 1] * s
        ly = local[:, 0] * s + local[:, 1] * c
        lz = local[:, 2]
        in_box = ((jnp.abs(lx) < dx / 2) & (jnp.abs(ly) < dy / 2)
                  & (jnp.abs(lz) < dz / 2))
        ix = jnp.clip(jnp.floor((lx + dx / 2) / dx * gx), 0, gx - 1).astype(jnp.int32)
        iy = jnp.clip(jnp.floor((ly + dy / 2) / dy * gy), 0, gy - 1).astype(jnp.int32)
        iz = jnp.clip(jnp.floor((lz + dz / 2) / dz * gz), 0, gz - 1).astype(jnp.int32)
        cell = (ix * gy + iy) * gz + iz
        cell = jnp.where(in_box, cell, n_cells)  # trash cell for outsiders

        if pool_method == "max":
            pooled = jax.ops.segment_max(point_features, cell,
                                         num_segments=n_cells + 1)
            counts = jax.ops.segment_sum(in_box.astype(jnp.float32), cell,
                                         num_segments=n_cells + 1)
            pooled = jnp.where(counts[:, None] > 0, pooled, 0.0)
        else:  # avg
            pooled = jax.ops.segment_sum(
                jnp.where(in_box[:, None], point_features, 0.0), cell,
                num_segments=n_cells + 1)
            counts = jax.ops.segment_sum(in_box.astype(jnp.float32), cell,
                                         num_segments=n_cells + 1)
            pooled = pooled / jnp.maximum(counts[:, None], 1.0)
        return pooled[:n_cells].reshape(gx, gy, gz, -1)

    return jax.vmap(pool_one)(rois)
