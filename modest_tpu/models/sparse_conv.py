"""3D sparse convolution as gather-scatter over active voxels — the
TPU-native substitute for spconv (reference backbones_3d/spconv_backbone.py,
VoxelBackBone8x).

Design: the active voxel set is a sorted, padded list of flat keys. A
submanifold conv gathers each voxel's 27 neighbors by binary search over the
sorted keys and contracts (V, 27·Cin) × (27·Cin, Cout) on the MXU. A strided
sparse conv first enumerates candidate output sites (≤8 per input for
k3s2), dedups them with a sort-based unique, then gathers its input window
the same way. All shapes static; invalid voxels ride along masked.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import MaskedBatchNorm

OFFSETS3 = jnp.array(
    [[dz, dy, dx] for dz in (-1, 0, 1) for dy in (-1, 0, 1) for dx in (-1, 0, 1)],
    jnp.int32,
)  # (27, 3) in (z, y, x) order


def flat_key(coords, shape_zyx):
    """(..., 3) zyx coords → flat keys; out-of-bounds/invalid → big sentinel."""
    nz, ny, nx = shape_zyx
    big = nz * ny * nx
    inb = ((coords >= 0) & (coords < jnp.array([nz, ny, nx]))).all(-1)
    key = coords[..., 0] * ny * nx + coords[..., 1] * nx + coords[..., 2]
    return jnp.where(inb, key, big), inb


def gather_neighbors(feats, keys, valid, coords, shape_zyx, offsets=OFFSETS3,
                     center_coords=None, stride: int = 1):
    """For each (output) voxel, gather features of its kernel-window inputs.

    feats (V, C) input features; keys (V,) sorted input keys; valid (V,);
    coords: output voxel coords (Vo, 3) zyx. Window input coords =
    stride*coord + offset (padding folded into offsets by the caller).
    Returns (Vo, K, C) gathered features (0 where missing).
    """
    base = coords * stride if stride != 1 else coords
    nbr = base[:, None, :] + offsets[None, :, :]  # (Vo, K, 3)
    nbr_key, inb = flat_key(nbr, shape_zyx)
    idx = jnp.searchsorted(keys, nbr_key).astype(jnp.int32)
    idx_c = jnp.clip(idx, 0, keys.shape[0] - 1)
    hit = inb & (keys[idx_c] == nbr_key) & valid[idx_c]
    gathered = feats[idx_c] * hit[..., None]
    return gathered


class SubMConv3d(nn.Module):
    """Submanifold conv: outputs live exactly on the input active set.

    All sparse modules take BATCHED tensors — feats (B, V, C), coords
    (B, V, 3), keys/valid (B, V) — with the pure gather/scatter helpers
    vmapped internally. Modules must never be called under jax.vmap: the
    MaskedBatchNorm they feed writes batch_stats, and variable writes
    inside a plain vmap leak tracers (and would compute per-sample stats,
    unlike the reference's whole-batch BN1d).
    """

    out_channels: int
    kernel: int = 3

    @nn.compact
    def __call__(self, feats, coords, keys, valid, shape_zyx):
        k3 = self.kernel ** 3
        b, v, cin = feats.shape
        w = self.param(
            "kernel", nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (k3 * cin, self.out_channels),
        )
        gathered = jax.vmap(
            lambda f, k, vl, c: gather_neighbors(f, k, vl, c, shape_zyx)
        )(feats, keys, valid, coords)  # (B, V, k3, C)
        out = jnp.dot(
            gathered.reshape(b * v, k3 * cin), w,
            preferred_element_type=jnp.float32,
        ).reshape(b, v, self.out_channels)
        return jnp.where(valid[..., None], out, 0.0)


def downsample_active_set(coords, keys, valid, shape_zyx, out_shape_zyx,
                          stride, padding, max_out: int):
    """Active output sites of a k3 strided sparse conv.

    For kernel 3 / stride s / padding p: output o covers inputs
    i ∈ [s·o − p, s·o − p + 2]. Candidate outputs per input along one dim:
    o ∈ [ceil((i + p − 2)/s), floor((i + p)/s)] — at most 2 for s ∈ {1, 2}.
    Dedups candidates via sort-unique, capped at max_out.
    """
    stride = jnp.asarray(stride, jnp.int32)
    padding = jnp.asarray(padding, jnp.int32)
    nz, ny, nx = out_shape_zyx
    big = nz * ny * nx

    # two candidates per dim: floor((i + p)/s) and floor((i + p)/s) - 1
    hi = (coords + padding) // stride  # (V, 3)
    cands = []
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                c = hi - jnp.array([dz, dy, dx], jnp.int32)
                # keep candidate only if the input is inside its window
                lo_in = c * stride - padding
                ok = ((coords >= lo_in) & (coords <= lo_in + 2)).all(-1)
                ok &= ((c >= 0) & (c < jnp.array([nz, ny, nx]))).all(-1)
                key = jnp.where(
                    ok & valid, c[:, 0] * ny * nx + c[:, 1] * nx + c[:, 2], big
                )
                cands.append(key)
    all_keys = jnp.concatenate(cands)  # (8V,)
    skeys = jnp.sort(all_keys)
    is_first = jnp.concatenate([jnp.ones((1,), bool), skeys[1:] != skeys[:-1]]) & (skeys < big)
    rank = jnp.cumsum(is_first) - 1
    slot = jnp.where(is_first, rank, max_out)
    out_keys = jnp.full((max_out + 1,), big, jnp.int32).at[slot].set(
        skeys.astype(jnp.int32), mode="drop"
    )[:max_out]
    out_valid = out_keys < big
    oz = out_keys // (ny * nx)
    oy = (out_keys // nx) % ny
    ox = out_keys % nx
    return jnp.stack([oz, oy, ox], axis=1), out_keys, out_valid


class SparseConv3d(nn.Module):
    """Strided sparse conv: output active set = downsampled input set."""

    out_channels: int
    stride: tuple
    padding: tuple
    kernel: tuple = (3, 3, 3)
    max_out: int | None = None  # defaults to len(input set)

    @nn.compact
    def __call__(self, feats, coords, keys, valid, shape_zyx, out_shape_zyx):
        kz, ky, kx = self.kernel
        b, v, cin = feats.shape
        kvol = kz * ky * kx
        w = self.param(
            "kernel", nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (kvol * cin, self.out_channels),
        )
        max_out = self.max_out or v
        offsets = jnp.stack(
            jnp.meshgrid(
                jnp.arange(kz), jnp.arange(ky), jnp.arange(kx), indexing="ij"
            ),
            axis=-1,
        ).reshape(-1, 3).astype(jnp.int32)
        stride = jnp.array(self.stride, jnp.int32)
        padding = jnp.array(self.padding, jnp.int32)

        def one(feats, coords, keys, valid):
            out_coords, out_keys, out_valid = downsample_active_set(
                coords, keys, valid, shape_zyx, out_shape_zyx,
                stride, padding, max_out,
            )
            base = out_coords * stride - padding
            nbr = base[:, None, :] + offsets[None, :, :]
            nbr_key, inb = flat_key(nbr, shape_zyx)
            idx = jnp.searchsorted(keys, nbr_key).astype(jnp.int32)
            idx_c = jnp.clip(idx, 0, keys.shape[0] - 1)
            hit = inb & (keys[idx_c] == nbr_key) & valid[idx_c]
            gathered = feats[idx_c] * hit[..., None]
            return gathered, out_coords, out_keys, out_valid

        gathered, out_coords, out_keys, out_valid = jax.vmap(one)(
            feats, coords, keys, valid)
        out = jnp.dot(
            gathered.reshape(b * max_out, kvol * cin), w,
            preferred_element_type=jnp.float32,
        ).reshape(b, max_out, self.out_channels)
        out = jnp.where(out_valid[..., None], out, 0.0)
        return out, out_coords, out_keys, out_valid


def _height_compress(x, key, valid, shape_zyx):
    """Scatter one sample's active voxels to a dense BEV map:
    (V, C) → (ny, nx, nz·C) (the reference's HeightCompression)."""
    nz, ny, nx = shape_zyx
    dense = jnp.zeros((nz * ny * nx + 1, x.shape[-1]), x.dtype)
    k = jnp.where(valid, key, nz * ny * nx)
    dense = dense.at[k].set(jnp.where(valid[:, None], x, 0.0))
    dense = dense[:-1].reshape(nz, ny, nx, -1)
    return jnp.transpose(dense, (1, 2, 0, 3)).reshape(ny, nx, nz * x.shape[-1])


class SparseBasicBlock(nn.Module):
    """[SubMConv → MaskedBN → ReLU] — the unit of VoxelBackBone8x's stages."""

    out_channels: int

    @nn.compact
    def __call__(self, feats, coords, keys, valid, shape_zyx, train: bool = False):
        x = SubMConv3d(self.out_channels)(feats, coords, keys, valid, shape_zyx)
        x = MaskedBatchNorm()(x, valid, train=train)
        return nn.relu(x)


def _down_shape(shape, stride, padding, kernel=(3, 3, 3)):
    return tuple(
        (shape[i] + 2 * padding[i] - kernel[i]) // stride[i] + 1 for i in range(3)
    )



def _down_stage(x, coords, keys, valid, s_in, cout, stride, padding, name,
                train):
    """Strided SparseConv3d + BN + ReLU stage opener (shared by both
    8x backbones; submodule names flow through unchanged)."""
    s_out = _down_shape(s_in, stride, padding)
    x, c, k, v = SparseConv3d(cout, stride, padding, name=name)(
        x, coords, keys, valid, s_in, s_out
    )
    x = MaskedBatchNorm(name=name + "_bn")(x, v, train=train)
    return nn.relu(x), c, k, v, s_out


def _conv_out_bev(x, c4, k4, v4, s4, train):
    """conv_out (3,1,1)/(2,1,1) + BN + ReLU + height compression → BEV."""
    s5 = _down_shape(s4, (2, 1, 1), (0, 0, 0), (3, 1, 1))
    x, c5, k5, v5 = SparseConv3d(
        128, (2, 1, 1), (0, 0, 0), kernel=(3, 1, 1), name="conv_out"
    )(x, c4, k4, v4, s4, s5)
    x = MaskedBatchNorm(name="conv_out_bn")(x, v5, train=train)
    x = nn.relu(x)
    return jax.vmap(lambda xx, kk, vv: _height_compress(xx, kk, vv, s5))(
        x, k5, v5)


def _multiscale_dict(x1, coords, valid, keys, x2, c2, v2, k2, x3, c3, v3, k3,
                     x4, c4, v4, k4):
    # strides are static: x_conv1=1, x_conv2=2, x_conv3=4, x_conv4=8
    # (kept out of the return value so vmap doesn't batch them);
    # keys are sorted flat coords — valid input for ops.voxel_query
    return {
        "x_conv1": (x1, coords, valid, keys),
        "x_conv2": (x2, c2, v2, k2),
        "x_conv3": (x3, c3, v3, k3),
        "x_conv4": (x4, c4, v4, k4),
    }


class VoxelBackBone8x(nn.Module):
    """spconv VoxelBackBone8x equivalent (reference spconv_backbone.py:68-180).

    Input: active voxels of the (41, ny, nx) grid with 4-ch mean features.
    Output: dense (B-less) (2, ny/8, nx/8, 128) per sample → caller stacks.
    With ``return_multiscale`` also returns the x_conv1..x_conv4 sparse
    feature sets (feats, coords zyx, valid, stride) for PV-RCNN's voxel set
    abstraction (reference pv_rcnn.yaml FEATURES_SOURCE).
    """

    return_multiscale: bool = False

    @nn.compact
    def __call__(self, feats, coords, keys, valid, shape_zyx, train: bool = False):
        s1 = shape_zyx
        x = SparseBasicBlock(16, name="conv_input")(feats, coords, keys, valid, s1, train)
        x = x1 = SparseBasicBlock(16, name="conv1")(x, coords, keys, valid, s1, train)

        x, c2, k2, v2, s2 = _down_stage(x, coords, keys, valid, s1, 32,
                                        (2, 2, 2), (1, 1, 1), "conv2_down", train)
        x = SparseBasicBlock(32, name="conv2_a")(x, c2, k2, v2, s2, train)
        x = x2 = SparseBasicBlock(32, name="conv2_b")(x, c2, k2, v2, s2, train)

        x, c3, k3, v3, s3 = _down_stage(x, c2, k2, v2, s2, 64,
                                        (2, 2, 2), (1, 1, 1), "conv3_down", train)
        x = SparseBasicBlock(64, name="conv3_a")(x, c3, k3, v3, s3, train)
        x = x3 = SparseBasicBlock(64, name="conv3_b")(x, c3, k3, v3, s3, train)

        x, c4, k4, v4, s4 = _down_stage(x, c3, k3, v3, s3, 64,
                                        (2, 2, 2), (0, 1, 1), "conv4_down", train)
        x = SparseBasicBlock(64, name="conv4_a")(x, c4, k4, v4, s4, train)
        x = x4 = SparseBasicBlock(64, name="conv4_b")(x, c4, k4, v4, s4, train)

        bev = _conv_out_bev(x, c4, k4, v4, s4, train)
        if self.return_multiscale:
            return bev, _multiscale_dict(x1, coords, valid, keys,
                                         x2, c2, v2, k2, x3, c3, v3, k3,
                                         x4, c4, v4, k4)
        return bev


class SparseResBlock(nn.Module):
    """Residual SubM block (reference spconv_backbone.SparseBasicBlock:
    conv-BN-ReLU-conv-BN + identity skip, ReLU). Requires matching in/out
    channels, which holds everywhere it's used in VoxelResBackBone8x."""

    out_channels: int

    @nn.compact
    def __call__(self, feats, coords, keys, valid, shape_zyx, train: bool = False):
        identity = feats
        x = SubMConv3d(self.out_channels, name="conv1")(feats, coords, keys, valid, shape_zyx)
        x = MaskedBatchNorm(name="bn1")(x, valid, train=train)
        x = nn.relu(x)
        x = SubMConv3d(self.out_channels, name="conv2")(x, coords, keys, valid, shape_zyx)
        x = MaskedBatchNorm(name="bn2")(x, valid, train=train)
        return nn.relu(x + identity)


class VoxelResBackBone8x(nn.Module):
    """spconv VoxelResBackBone8x equivalent (reference
    spconv_backbone.py:183-280): the VoxelBackBone8x chain with two residual
    SubM blocks per stage and a 128-channel stage 4. Output BEV channels are
    identical (2 × 128 after height compression)."""

    return_multiscale: bool = False

    @nn.compact
    def __call__(self, feats, coords, keys, valid, shape_zyx, train: bool = False):
        s1 = shape_zyx
        x = SparseBasicBlock(16, name="conv_input")(feats, coords, keys, valid, s1, train)
        x = SparseResBlock(16, name="res1_a")(x, coords, keys, valid, s1, train)
        x = x1 = SparseResBlock(16, name="res1_b")(x, coords, keys, valid, s1, train)

        x, c2, k2, v2, s2 = _down_stage(x, coords, keys, valid, s1, 32,
                                        (2, 2, 2), (1, 1, 1), "conv2_down", train)
        x = SparseResBlock(32, name="res2_a")(x, c2, k2, v2, s2, train)
        x = x2 = SparseResBlock(32, name="res2_b")(x, c2, k2, v2, s2, train)

        x, c3, k3, v3, s3 = _down_stage(x, c2, k2, v2, s2, 64,
                                        (2, 2, 2), (1, 1, 1), "conv3_down", train)
        x = SparseResBlock(64, name="res3_a")(x, c3, k3, v3, s3, train)
        x = x3 = SparseResBlock(64, name="res3_b")(x, c3, k3, v3, s3, train)

        x, c4, k4, v4, s4 = _down_stage(x, c3, k3, v3, s3, 128,
                                        (2, 2, 2), (0, 1, 1), "conv4_down", train)
        x = SparseResBlock(128, name="res4_a")(x, c4, k4, v4, s4, train)
        x = x4 = SparseResBlock(128, name="res4_b")(x, c4, k4, v4, s4, train)

        bev = _conv_out_bev(x, c4, k4, v4, s4, train)
        if self.return_multiscale:
            return bev, _multiscale_dict(x1, coords, valid, keys,
                                         x2, c2, v2, k2, x3, c3, v3, k3,
                                         x4, c4, v4, k4)
        return bev


BACKBONE_STRIDES = {"x_conv1": 1, "x_conv2": 2, "x_conv3": 4, "x_conv4": 8}


def backbone_scale_shapes(grid_size):
    """Static (nz, ny, nx) shape of each VoxelBackBone8x scale for a dataset
    grid_size (nx, ny, nz). Mirrors the __call__ downsampling chain exactly —
    heads that address voxel keys (voxel_query) must use these dims."""
    s1 = (grid_size[2] + 1, grid_size[1], grid_size[0])  # z padded like spconv
    s2 = _down_shape(s1, (2, 2, 2), (1, 1, 1))
    s3 = _down_shape(s2, (2, 2, 2), (1, 1, 1))
    s4 = _down_shape(s3, (2, 2, 2), (0, 1, 1))
    return {"x_conv1": s1, "x_conv2": s2, "x_conv3": s3, "x_conv4": s4}


class SparseInverseConv3d(nn.Module):
    """Inverse (transposed) sparse conv: coarse scale → the known fine active
    set (reference spconv.SparseInverseConv3d in spconv_unet.py).

    Each fine voxel f receives contributions from every coarse voxel c whose
    k3 strided window covers it: c s.t. f ∈ [s·c − p, s·c − p + 2]. That is
    ≤ 2 candidates per dim (8 total for s=2); each candidate contributes
    through the kernel tap at offset f − (s·c − p) ∈ [0, 2]^3, so the op is
    8 searchsorted lookups + one (Vf, 8·Cin) × (8·Cin, Cout) MXU contraction
    with weights scattered into their tap slots.
    """

    out_channels: int
    stride: tuple = (2, 2, 2)
    padding: tuple = (1, 1, 1)

    @nn.compact
    def __call__(self, coarse_feats, coarse_keys, coarse_valid, coarse_shape_zyx,
                 fine_coords, fine_valid, fine_shape_zyx):
        cin = coarse_feats.shape[-1]
        stride = jnp.asarray(self.stride, jnp.int32)
        padding = jnp.asarray(self.padding, jnp.int32)
        # 27 taps like a k3 conv; candidates select which tap applies
        w = self.param(
            "kernel", nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (27, cin, self.out_channels),
        )

        def one(coarse_feats, coarse_keys, coarse_valid, fine_coords, fine_valid):
            hi = (fine_coords + padding) // stride  # max candidate parent/dim
            outs = jnp.zeros((fine_coords.shape[0], self.out_channels), jnp.float32)
            for dz in (0, 1):
                for dy in (0, 1):
                    for dx in (0, 1):
                        c = hi - jnp.array([dz, dy, dx], jnp.int32)  # (Vf, 3)
                        lo_in = c * stride - padding
                        tap = fine_coords - lo_in  # (Vf, 3) in [0, 2] when valid
                        ok = ((tap >= 0) & (tap <= 2)).all(-1)
                        key, inb = flat_key(c, coarse_shape_zyx)
                        idx = jnp.searchsorted(coarse_keys, key).astype(jnp.int32)
                        idx_c = jnp.clip(idx, 0, coarse_keys.shape[0] - 1)
                        hit = ok & inb & (coarse_keys[idx_c] == key) & coarse_valid[idx_c]
                        g = coarse_feats[idx_c] * hit[:, None]  # (Vf, Cin)
                        tap_id = jnp.clip((tap[:, 0] * 3 + tap[:, 1]) * 3 + tap[:, 2],
                                          0, 26)
                        wt = w[tap_id]  # (Vf, Cin, Cout)
                        outs = outs + jnp.einsum(
                            "vc,vco->vo", g, wt,
                            preferred_element_type=jnp.float32)
            return jnp.where(fine_valid[:, None], outs, 0.0)

        return jax.vmap(one)(coarse_feats, coarse_keys, coarse_valid,
                             fine_coords, fine_valid)


class SparseUNet(nn.Module):
    """UNetV2 sparse encoder-decoder (reference backbones_3d/spconv_unet.py).

    Encoder mirrors VoxelBackBone8x (+ conv_out BEV for the RPN); the decoder
    walks back up with inverse convs and lateral SubM merges, ending with
    16-ch features on the full-resolution active voxel set (the reference's
    point-wise UNet features driving PartA2's seg + part heads).
    """

    @nn.compact
    def __call__(self, feats, coords, keys, valid, shape_zyx, train: bool = False):
        def block(c_out, name):
            return SparseBasicBlock(c_out, name=name)

        s1 = shape_zyx
        x = block(16, "conv_input")(feats, coords, keys, valid, s1, train)
        x1 = block(16, "conv1")(x, coords, keys, valid, s1, train)

        def down(x, coords, keys, valid, s_in, cout, stride, padding, name):
            s_out = _down_shape(s_in, stride, padding)
            x, c, k, v = SparseConv3d(cout, stride, padding, name=name)(
                x, coords, keys, valid, s_in, s_out
            )
            x = MaskedBatchNorm(name=name + "_bn")(x, v, train=train)
            return nn.relu(x), c, k, v, s_out

        x, c2, k2, v2, s2 = down(x1, coords, keys, valid, s1, 32, (2, 2, 2), (1, 1, 1), "conv2_down")
        x = block(32, "conv2_a")(x, c2, k2, v2, s2, train)
        x2 = block(32, "conv2_b")(x, c2, k2, v2, s2, train)

        x, c3, k3, v3, s3 = down(x2, c2, k2, v2, s2, 64, (2, 2, 2), (1, 1, 1), "conv3_down")
        x = block(64, "conv3_a")(x, c3, k3, v3, s3, train)
        x3 = block(64, "conv3_b")(x, c3, k3, v3, s3, train)

        x, c4, k4, v4, s4 = down(x3, c3, k3, v3, s3, 64, (2, 2, 2), (0, 1, 1), "conv4_down")
        x = block(64, "conv4_a")(x, c4, k4, v4, s4, train)
        x4 = block(64, "conv4_b")(x, c4, k4, v4, s4, train)

        # RPN branch: conv_out + height compression, same as VoxelBackBone8x
        s5 = _down_shape(s4, (2, 1, 1), (0, 0, 0), (3, 1, 1))
        xo, c5, k5, v5 = SparseConv3d(
            128, (2, 1, 1), (0, 0, 0), kernel=(3, 1, 1), name="conv_out"
        )(x4, c4, k4, v4, s4, s5)
        xo = nn.relu(MaskedBatchNorm(name="conv_out_bn")(xo, v5, train=train))
        bev = jax.vmap(lambda xx, kk, vv: _height_compress(xx, kk, vv, s5))(
            xo, k5, v5)

        def up(coarse, ck, cv, cs, lateral, lcoords, lkeys, lvalid, ls,
               stride, padding, cout, name):
            u = SparseInverseConv3d(cout, stride, padding, name=name + "_inv")(
                coarse, ck, cv, cs, lcoords, lvalid, ls
            )
            u = nn.relu(MaskedBatchNorm(name=name + "_inv_bn")(u, lvalid, train=train))
            merged = jnp.concatenate([u, lateral], axis=-1)
            m = SubMConv3d(cout, name=name + "_merge")(merged, lcoords, lkeys,
                                                       lvalid, ls)
            m = nn.relu(MaskedBatchNorm(name=name + "_merge_bn")(m, lvalid, train=train))
            return m

        u3 = up(x4, k4, v4, s4, x3, c3, k3, v3, s3, (2, 2, 2), (0, 1, 1), 64, "up4")
        u2 = up(u3, k3, v3, s3, x2, c2, k2, v2, s2, (2, 2, 2), (1, 1, 1), 32, "up3")
        u1 = up(u2, k2, v2, s2, x1, coords, keys, valid, s1, (2, 2, 2), (1, 1, 1), 16, "up2")

        return bev, u1  # (ny/8, nx/8, 256), (V, 16) point-wise features
