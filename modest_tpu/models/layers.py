"""Shared NN building blocks (flax.linen, channel-last)."""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class SharedMLP(nn.Module):
    """Stack of [Dense(no bias) → BatchNorm → ReLU] applied to the last axis.

    Equivalent to the reference's 1x1 Conv2d+BN2d+ReLU stacks — a 1x1 conv
    over (B, C, npoint, nsample) is a Dense over channel-last layout, and it
    lands on the MXU as one big matmul.
    """

    channels: Sequence[int]
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        for c in self.channels:
            x = nn.Dense(c, use_bias=not self.use_bn, dtype=jnp.float32)(x)
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
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,)))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        if train:
            w = mask.astype(x.dtype)[:, None]
            cnt = jnp.maximum(w.sum(), 1.0)
            mean = (x * w).sum(0) / cnt
            var = (jnp.square(x - mean) * w).sum(0) / cnt
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return jnp.where(mask[:, None], y, 0.0)
