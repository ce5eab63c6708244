"""Shared NN building blocks (flax.linen, channel-last)."""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
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
