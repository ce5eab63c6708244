"""Shared NN building blocks (flax.linen, channel-last)."""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _mlp_compute_dtype():
    """bf16 matmuls on the TPU fast path (params stay f32; the MXU
    accumulates in f32 and BatchNorm runs on f32 inputs). CPU (oracle
    tests) and exact mode (MODEST_EXACT_OPS) keep f32 end-to-end."""
    from ..ops.pointnet2 import exact_ops

    if jax.default_backend() == "cpu" or exact_ops():
        return jnp.float32
    return jnp.bfloat16


class SharedMLP(nn.Module):
    """Stack of [Dense(no bias) → BatchNorm → ReLU] applied to the last axis.

    Equivalent to the reference's 1x1 Conv2d+BN2d+ReLU stacks — a 1x1 conv
    over (B, C, npoint, nsample) is a Dense over channel-last layout, and it
    lands on the MXU as one big matmul (bf16 on TPU, f32 accum — the
    reference trains these nets under fp16 AMP).
    """

    channels: Sequence[int]
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = _mlp_compute_dtype()
        for c in self.channels:
            x = nn.Dense(c, use_bias=not self.use_bn, dtype=dt)(x)
            x = x.astype(jnp.float32)
            if self.use_bn:
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5
                )(x.reshape(-1, x.shape[-1])).reshape(x.shape)
            x = nn.relu(x)
        return x


class FCHead(nn.Module):
    """[Dense(no bias)+BN+ReLU]*k + Dense(out, bias) — reference make_fc_layers."""

    hidden: Sequence[int]
    out: int
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = SharedMLP(self.hidden, use_bn=self.use_bn)(x, train=train)
        return nn.Dense(self.out, use_bias=True)(x)


class MaskedBatchNorm(nn.Module):
    """BatchNorm over a masked set of rows (active voxels/points only).

    The reference's BN1d runs over dense tensors of *active* elements; our
    padded static-shape tensors must exclude padding rows from the batch
    statistics. Normalizes (N, C) given (N,) bool mask.
    """

    momentum: float = 0.99
    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        """x (..., C), mask (...): stats over ALL masked rows (incl. the
        batch axis — the same population the reference's BN1d sees; a
        MaskedBatchNorm must never sit inside a jax.vmap, where its
        batch_stats writes leak tracers and its stats go per-sample)."""
        c = x.shape[-1]
        lead = x.shape[:-1]
        xf = x.reshape(-1, c)
        mf = mask.reshape(-1)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,)))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        if train:
            w = mf.astype(xf.dtype)[:, None]
            cnt = jnp.maximum(w.sum(), 1.0)
            mean = (xf * w).sum(0) / cnt
            var = (jnp.square(xf - mean) * w).sum(0) / cnt
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        y = jnp.where(mf[:, None], y, 0.0)
        return y.reshape(*lead, c)
