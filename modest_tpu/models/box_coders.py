"""Box residual coders (jnp) — reference pcdet/utils/box_coder_utils.py."""
from __future__ import annotations

import jax.numpy as jnp


class ResidualCoder:
    """Anchor-relative 7-dim residual coder (reference :5-77)."""

    def __init__(self, code_size: int = 7, encode_angle_by_sincos: bool = False, **kw):
        self.code_size = code_size + (1 if encode_angle_by_sincos else 0)
        self.encode_angle_by_sincos = encode_angle_by_sincos

    def encode(self, boxes, anchors):
        anchors = anchors.at[..., 3:6].set(jnp.maximum(anchors[..., 3:6], 1e-5))
        boxes = boxes.at[..., 3:6].set(jnp.maximum(boxes[..., 3:6], 1e-5))
        xa, ya, za, dxa, dya, dza, ra = jnp.split(anchors[..., :7], 7, axis=-1)
        xg, yg, zg, dxg, dyg, dzg, rg = jnp.split(boxes[..., :7], 7, axis=-1)
        diag = jnp.sqrt(dxa**2 + dya**2)
        xt = (xg - xa) / diag
        yt = (yg - ya) / diag
        zt = (zg - za) / dza
        dxt = jnp.log(dxg / dxa)
        dyt = jnp.log(dyg / dya)
        dzt = jnp.log(dzg / dza)
        if self.encode_angle_by_sincos:
            rts = [jnp.cos(rg) - jnp.cos(ra), jnp.sin(rg) - jnp.sin(ra)]
        else:
            rts = [rg - ra]
        # extra channels (e.g. nuScenes velocity): identity residuals
        # (reference box_coder_utils.py:42)
        extra = []
        if boxes.shape[-1] > 7:
            n_extra = boxes.shape[-1] - 7
            a_extra = (anchors[..., 7:7 + n_extra]
                       if anchors.shape[-1] > 7 else jnp.zeros_like(boxes[..., 7:]))
            extra = [boxes[..., 7:] - a_extra]
        return jnp.concatenate([xt, yt, zt, dxt, dyt, dzt, *rts, *extra], axis=-1)

    def decode(self, encodings, anchors):
        xa, ya, za, dxa, dya, dza, ra = jnp.split(anchors[..., :7], 7, axis=-1)
        if self.encode_angle_by_sincos:
            xt, yt, zt, dxt, dyt, dzt, cost, sint = jnp.split(encodings[..., :8], 8, axis=-1)
        else:
            xt, yt, zt, dxt, dyt, dzt, rt = jnp.split(encodings[..., :7], 7, axis=-1)
        diag = jnp.sqrt(dxa**2 + dya**2)
        xg = xt * diag + xa
        yg = yt * diag + ya
        zg = zt * dza + za
        # clip: masked-loss paths multiply bg rows by 0, and exp overflow
        # would turn that into nan (the reference only ever decodes fg rows)
        dxg = jnp.exp(jnp.clip(dxt, -12.0, 12.0)) * dxa
        dyg = jnp.exp(jnp.clip(dyt, -12.0, 12.0)) * dya
        dzg = jnp.exp(jnp.clip(dzt, -12.0, 12.0)) * dza
        if self.encode_angle_by_sincos:
            rg = jnp.arctan2(sint + jnp.sin(ra), cost + jnp.cos(ra))
        else:
            rg = rt + ra
        out = [xg, yg, zg, dxg, dyg, dzg, rg]
        n7 = 8 if self.encode_angle_by_sincos else 7
        if encodings.shape[-1] > n7:  # extra channels decode additively
            n_extra = encodings.shape[-1] - n7
            a_extra = (anchors[..., 7:7 + n_extra]
                       if anchors.shape[-1] > 7
                       else jnp.zeros_like(encodings[..., n7:]))
            out.append(encodings[..., n7:] + a_extra)
        return jnp.concatenate(out, axis=-1)


class PointResidualCoder:
    """Point-relative 8-dim (cos/sin) coder with mean-size anchors (:144-222)."""

    def __init__(self, code_size: int = 8, use_mean_size: bool = True, mean_size=None, **kw):
        self.code_size = code_size
        self.use_mean_size = use_mean_size
        if use_mean_size:
            self.mean_size = jnp.asarray(mean_size, jnp.float32)

    def encode(self, gt_boxes, points, gt_classes=None):
        """gt_boxes (N, 7), points (N, 3), gt_classes (N,) in 1..C → (N, 8)."""
        gt_boxes = gt_boxes.at[..., 3:6].set(jnp.maximum(gt_boxes[..., 3:6], 1e-5))
        xg, yg, zg, dxg, dyg, dzg, rg = jnp.split(gt_boxes[..., :7], 7, axis=-1)
        xa, ya, za = jnp.split(points[..., :3], 3, axis=-1)
        if self.use_mean_size:
            anchor = self.mean_size[jnp.clip(gt_classes - 1, 0, None)]
            dxa, dya, dza = jnp.split(anchor, 3, axis=-1)
            diag = jnp.sqrt(dxa**2 + dya**2)
            xt = (xg - xa) / diag
            yt = (yg - ya) / diag
            zt = (zg - za) / dza
            dxt = jnp.log(dxg / dxa)
            dyt = jnp.log(dyg / dya)
            dzt = jnp.log(dzg / dza)
        else:
            xt, yt, zt = xg - xa, yg - ya, zg - za
            dxt, dyt, dzt = jnp.log(dxg), jnp.log(dyg), jnp.log(dzg)
        return jnp.concatenate([xt, yt, zt, dxt, dyt, dzt, jnp.cos(rg), jnp.sin(rg)], axis=-1)

    def decode(self, encodings, points, pred_classes=None):
        xt, yt, zt, dxt, dyt, dzt, cost, sint = jnp.split(encodings[..., :8], 8, axis=-1)
        xa, ya, za = jnp.split(points[..., :3], 3, axis=-1)
        if self.use_mean_size:
            anchor = self.mean_size[jnp.clip(pred_classes - 1, 0, None)]
            dxa, dya, dza = jnp.split(anchor, 3, axis=-1)
            diag = jnp.sqrt(dxa**2 + dya**2)
            xg = xt * diag + xa
            yg = yt * diag + ya
            zg = zt * dza + za
            dxg = jnp.exp(jnp.clip(dxt, -12.0, 12.0)) * dxa
            dyg = jnp.exp(jnp.clip(dyt, -12.0, 12.0)) * dya
            dzg = jnp.exp(jnp.clip(dzt, -12.0, 12.0)) * dza
        else:
            xg, yg, zg = xt + xa, yt + ya, zt + za
            dxg = jnp.exp(jnp.clip(dxt, -12.0, 12.0))
            dyg = jnp.exp(jnp.clip(dyt, -12.0, 12.0))
            dzg = jnp.exp(jnp.clip(dzt, -12.0, 12.0))
        rg = jnp.arctan2(sint, cost)
        return jnp.concatenate([xg, yg, zg, dxg, dyg, dzg, rg], axis=-1)
