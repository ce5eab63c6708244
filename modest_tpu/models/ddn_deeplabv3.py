"""DeepLabV3 depth-distribution network for CaDDN — architecture parity
with the reference's pretrained DDN (reference pcdet/models/backbones_3d/
vfe/image_vfe_modules/ffn/ddn/{ddn_deeplabv3,ddn_template}.py, which wraps
torchvision.models.segmentation.deeplabv3_resnet101).

Faithful structure so released/torchvision weights convert 1:1
(train/torch_convert.convert_ddn_deeplabv3_into):

  * ResNet-50/101 v1 bottleneck backbone, 7×7/2 stem + 3×3/2 maxpool,
    replace_stride_with_dilation = [False, True, True] (layer3 dilation 2,
    layer4 dilation 4 → output stride 8) — torchvision's deeplabv3_resnet*
    constructor defaults.
  * features are extracted at `layer1` (256 ch, stride 4), the reference's
    feat_extract_layer for CaDDN (tools/cfgs/kitti_models/CaDDN.yaml:35).
  * classifier = DeepLabHead: ASPP(rates 12/24/36 + image pooling) →
    3×3 conv(256) + BN + ReLU → 1×1 conv(num_classes), bilinearly resized
    (align_corners=False ⇔ jax.image.resize 'linear') to the feature map.

TPU notes: NHWC throughout (MXU-friendly conv layout); explicit torch-style
symmetric padding so converted weights are numerically exchangeable; the
global-pool ASPP branch broadcasts instead of resizing a 1×1 map.
"""
from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp


class Bottleneck(nn.Module):
    """ResNet v1 bottleneck (torchvision layout: conv1/bn1 … downsample)."""

    width: int
    stride: int = 1
    dilation: int = 1
    has_down: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = functools.partial(nn.BatchNorm, use_running_average=not train,
                               momentum=0.9, epsilon=1e-5)
        d = self.dilation
        y = nn.Conv(self.width, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.relu(bn(name="bn1")(y))
        y = nn.Conv(self.width, (3, 3), strides=(self.stride, self.stride),
                    kernel_dilation=(d, d), padding=[(d, d), (d, d)],
                    use_bias=False, name="conv2")(y)
        y = nn.relu(bn(name="bn2")(y))
        y = nn.Conv(self.width * 4, (1, 1), use_bias=False, name="conv3")(y)
        y = bn(name="bn3")(y)
        if self.has_down:
            x = nn.Conv(self.width * 4, (1, 1),
                        strides=(self.stride, self.stride), use_bias=False,
                        name="down_conv")(x)
            x = bn(name="down_bn")(x)
        return nn.relu(y + x)


RESNET_BLOCKS = {"ResNet50": (3, 4, 6, 3), "ResNet101": (3, 4, 23, 3)}


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (torchvision ASPP, rates 12/24/36)."""

    channels: int = 256
    rates: tuple = (12, 24, 36)

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = functools.partial(nn.BatchNorm, use_running_average=not train,
                               momentum=0.9, epsilon=1e-5)
        outs = [nn.relu(bn(name="bn0")(
            nn.Conv(self.channels, (1, 1), use_bias=False, name="conv0")(x)))]
        for i, r in enumerate(self.rates, start=1):
            y = nn.Conv(self.channels, (3, 3), kernel_dilation=(r, r),
                        padding=[(r, r), (r, r)], use_bias=False,
                        name=f"conv{i}")(x)
            outs.append(nn.relu(bn(name=f"bn{i}")(y)))
        # image-pooling branch: global average → 1×1 conv → broadcast back
        # (bilinear upsample of a 1×1 map IS a broadcast)
        g = x.mean(axis=(1, 2), keepdims=True)
        g = nn.Conv(self.channels, (1, 1), use_bias=False, name="conv_pool")(g)
        g = nn.relu(bn(name="bn_pool")(g))
        outs.append(jnp.broadcast_to(g, outs[0].shape))
        y = jnp.concatenate(outs, axis=-1)
        y = nn.Conv(self.channels, (1, 1), use_bias=False, name="project")(y)
        y = nn.relu(bn(name="bn_project")(y))
        return nn.Dropout(0.5, deterministic=not train)(y)


class DDNDeepLabV3(nn.Module):
    """Returns (features (B, H/4, W/4, 256), logits (B, H/4, W/4, classes))."""

    num_classes: int
    backbone_name: str = "ResNet101"

    @nn.compact
    def __call__(self, x, train: bool = False):
        blocks = RESNET_BLOCKS[self.backbone_name]
        bn = functools.partial(nn.BatchNorm, use_running_average=not train,
                               momentum=0.9, epsilon=1e-5)
        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, name="conv1")(x)
        y = nn.relu(bn(name="bn1")(y))
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        feats = None
        # replace_stride_with_dilation=[False, True, True]: strides 1/2/1/1,
        # dilations 1/1/2/4 (output stride 8)
        strides = (1, 2, 1, 1)
        dilations = (1, 1, 2, 4)
        for li, (n_blocks, width) in enumerate(zip(blocks, (64, 128, 256, 512))):
            for bi in range(n_blocks):
                # torchvision keeps the first block's 3x3 at the PREVIOUS
                # dilation when the stride is replaced (layer3 block0 d=1,
                # layer4 block0 d=2)
                d0 = dilations[li - 1] if li > 0 else 1
                y = Bottleneck(
                    width=width,
                    stride=strides[li] if bi == 0 else 1,
                    dilation=(d0 if bi == 0 else dilations[li]),
                    has_down=bi == 0,
                    name=f"layer{li + 1}_{bi}",
                )(y, train=train)
            if li == 0:
                feats = y  # feat_extract_layer = layer1 (stride 4, 256 ch)

        # DeepLabHead
        y = ASPP(name="aspp")(y, train=train)
        y = nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    name="head_conv")(y)
        y = nn.relu(bn(name="head_bn")(y))
        logits = nn.Conv(self.num_classes, (1, 1), name="head_cls")(y)
        # stride 8 → stride 4, bilinear, align_corners=False (DDNTemplate's
        # F.interpolate to feat_shape)
        logits = jax.image.resize(
            logits, (logits.shape[0], feats.shape[1], feats.shape[2],
                     logits.shape[3]), method="linear")
        return feats, logits
