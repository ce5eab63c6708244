"""Dev: WALL-CLOCK stage split of the EVAL forward at multiple batches
(VERDICT r4 item 6 — diagnose the B=16 collapse).

Same methodology as train_stage_wall.py: progressively longer truncations
of the real eval path, each its own jit, value fetched so nothing DCEs.
Deltas between consecutive rows attribute wall time to the added stage:

  E0 backbone + point head
  E1 + decode
  E2 + proposal NMS (TEST config: pre 9000 -> post 100 @ 0.85)
  E3 + roipoint pool (100 rois x 512 pts)
  E4 + RoI tower (rcnn heads)
  E5 + refined boxes + post NMS (full bench path)

Usage: python scripts_dev/eval_stage_wall.py [batch ...]   # default 8 16
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from modest_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()

from modest_tpu.models.pointrcnn import PointRCNN, make_point_coder, post_process
from modest_tpu.models.roi_head import (
    generate_refined_boxes,
    pool_roi_features,
    proposal_layer,
)
from modest_tpu.utils.config import Config, cfg_from_yaml_file

N = 12288
cfg = cfg_from_yaml_file("configs/models/lyft_models/pointrcnn_dynamic_obj.yaml")
model = PointRCNN(model_cfg=cfg.MODEL, num_class=len(cfg.CLASS_NAMES))
mcfg = Config(cfg.MODEL)
nms_cfg = mcfg.ROI_HEAD.NMS_CONFIG["TEST"]


def make(batch):
    rng = np.random.RandomState(0)
    points = rng.uniform(0, 1, (batch, N, 4)).astype(np.float32)
    points[..., 0] *= 80
    points[..., 1] = (points[..., 1] - 0.5) * 80
    points[..., 2] = (points[..., 2] - 0.5) * 3 - 0.5
    gt = np.zeros((batch, 8, 8), np.float32)
    for b in range(batch):
        for k in range(10):
            c = rng.uniform([5, -30, -1.6], [70, 30, -1.4])
            sl = slice(k * 300, (k + 1) * 300)
            points[b, sl, :3] = c + rng.uniform(-1, 1, (300, 3)) * [2, 0.9, 0.7]
    gt[:, 0, :7] = [10, 0, -1.5, 4, 2, 1.6, 0.3]
    gt[:, 0, 7] = 1
    return jnp.asarray(points), jnp.asarray(gt)


def _eval_stages(self, points, stage: int):
    """Replicates PointRCNN.__call__'s eval path up to `stage` (kept in sync
    with models/pointrcnn.py:82-150)."""
    xyz = points[..., :3]
    b, n = points.shape[0], points.shape[1]
    feats = self.backbone(points, train=False)
    point_cls, point_box = self.point_head(feats, train=False)
    if stage == 0:
        return feats.sum() + point_cls.sum()
    point_scores = jax.nn.sigmoid(point_cls.max(axis=-1))
    pred_classes = point_cls.argmax(axis=-1) + 1
    coder = make_point_coder(self.model_cfg)
    decoded = coder.decode(
        point_box.reshape(-1, coder.code_size), xyz.reshape(-1, 3),
        pred_classes.reshape(-1)).reshape(b, n, 7)
    if stage == 1:
        return decoded.sum()
    rois, roi_scores, roi_labels, roi_valid = proposal_layer(
        decoded, point_cls,
        nms_pre=int(nms_cfg.NMS_PRE_MAXSIZE),
        nms_post=int(nms_cfg.NMS_POST_MAXSIZE),
        nms_thresh=float(nms_cfg.NMS_THRESH))
    if stage == 2:
        return rois.sum() + roi_scores.sum()
    rp = Config(self.model_cfg).ROI_HEAD.ROI_POINT_POOL
    pooled = pool_roi_features(
        xyz, feats, point_scores, rois, roi_valid,
        num_sampled_points=int(rp.NUM_SAMPLED_POINTS),
        depth_normalizer=float(rp.DEPTH_NORMALIZER),
        pool_extra_width=tuple(rp.POOL_EXTRA_WIDTH))
    if stage == 3:
        return pooled.sum()
    rcnn_cls, rcnn_reg = self.roi_head(pooled, train=False)
    if stage == 4:
        return rcnn_cls.sum() + rcnn_reg.sum()
    batch_cls, batch_boxes = generate_refined_boxes(
        rois, rcnn_cls, rcnn_reg, self.roi_coder)
    out = {"batch_cls_preds": batch_cls, "batch_box_preds": batch_boxes,
           "rois": rois, "roi_labels": roi_labels, "roi_valid": roi_valid}
    final = post_process(out, Config(self.model_cfg).POST_PROCESSING)
    return final["boxes"].sum() + final["scores"].sum()


def timeit(fn, *args, iters=10):
    out = fn(*args)
    np.asarray(jax.device_get(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0]))
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*args)
        if (i + 1) % 5 == 0:
            np.asarray(jax.device_get(
                jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0]))
    np.asarray(jax.device_get(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0]))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    batches = [int(a) for a in sys.argv[1:]] or [8, 16]
    names = ["E0 backbone+point head", "E1 +decode", "E2 +proposal NMS",
             "E3 +roipoint pool", "E4 +RoI tower", "E5 +refine+post NMS"]
    for B in batches:
        points, gt = make(B)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)},
            points, gt, train=True)
        rows = []
        for stage in range(6):
            f = jax.jit(lambda v, p, s=stage: model.apply(
                v, p, s, method=_eval_stages))
            ms = timeit(f, variables, points)
            rows.append(ms)
            print(f"B={B} {names[stage]:26s} {ms:7.1f} ms", flush=True)
        prev = 0.0
        print(f"\nB={B} eval stage deltas (ms):")
        for nme, ms in zip(names, rows):
            print(f"  {nme:26s} {ms - prev:7.1f}", flush=True)
            prev = ms


if __name__ == "__main__":
    main()
