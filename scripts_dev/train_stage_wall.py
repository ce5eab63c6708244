"""Dev: WALL-CLOCK stage split of the train step (VERDICT r3 item 7).

roofline_split.py attributes XLA cost-model BYTES per stage, but the model
ignores fusion (B=8 reports a nonphysical 141% of HBM peak). This probe
times progressively longer truncations of the real train step — each
truncation is its own jitted grad+apply so the measured deltas are
wall-clock, fusion and all:

  T0 backbone fwd+bwd
  T1 + point head + decode + stage-1 loss
  T2 + proposal NMS (512 keep, train config)
  T3 + RoI sampling / target assignment + canonical transform
  T4 + roipoint pool (128 rois x 512 pts)
  T5 + RoI tower + rcnn losses = full loss
  T6 + adam update             = full step (train_step_bench methodology)

Deltas between consecutive rows attribute wall time to the stage added.
Truncations T0..T4 sum their last live tensor into the scalar "loss" so
dead-code elimination can't drop the stage; upstream stages are shared so
a delta isolates exactly the added computation (plus what fusion saves,
which is the point).

Usage: python scripts_dev/train_stage_wall.py [batch ...]
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

import optax

from modest_tpu.models.pointrcnn import PointRCNN, pointrcnn_loss
from modest_tpu.models.roi_head import (
    canonical_transform_gt,
    pool_roi_features,
    proposal_layer,
    sample_rois_for_rcnn,
)
from modest_tpu.train.state import create_train_state
from modest_tpu.utils.config import Config, cfg_from_yaml_file

N = 12288
cfg = cfg_from_yaml_file("configs/models/lyft_models/pointrcnn_dynamic_obj.yaml")
model = PointRCNN(model_cfg=cfg.MODEL, num_class=len(cfg.CLASS_NAMES))
mcfg = Config(cfg.MODEL)
nms_cfg = mcfg.ROI_HEAD.NMS_CONFIG["TRAIN"]


def make(batch):
    rng = np.random.RandomState(0)
    points = rng.uniform(0, 1, (batch, N, 4)).astype(np.float32)
    points[..., 0] *= 80
    points[..., 1] = (points[..., 1] - 0.5) * 80
    points[..., 2] = (points[..., 2] - 0.5) * 3 - 0.5
    gt = np.zeros((batch, 16, 8), np.float32)
    for b in range(batch):
        for k in range(10):
            c = rng.uniform([5, -30, -1.6], [70, 30, -1.4])
            sl = slice(k * 300, (k + 1) * 300)
            points[b, sl, :3] = c + rng.uniform(-1, 1, (300, 3)) * [2, 0.9, 0.7]
            gt[b, k, :7] = [c[0], c[1], c[2], 4, 2, 1.6, 0.3]
            gt[b, k, 7] = 1
    return jnp.asarray(points), jnp.asarray(gt)


def stage_loss(variables, points, gt, key, stage: int):
    """Forward through the first `stage` stages; scalarize the frontier."""

    def fwd(variables):
        xyz = points[..., :3]
        b, n = points.shape[0], points.shape[1]
        (feats, point_cls, point_box), _ = model.apply(
            variables, points, train=True, method=_backbone_and_point_head,
            rngs={"sampler": key}, mutable=["batch_stats"])
        if stage == 0:
            return feats.sum()
        point_scores = jax.nn.sigmoid(point_cls.max(axis=-1))
        pred_classes = point_cls.argmax(axis=-1) + 1
        from modest_tpu.models.pointrcnn import make_point_coder

        coder = make_point_coder(cfg.MODEL)
        decoded = coder.decode(
            point_box.reshape(-1, coder.code_size), xyz.reshape(-1, 3),
            pred_classes.reshape(-1)).reshape(b, n, 7)
        if stage == 1:
            return decoded.sum() + point_cls.sum()
        rois, roi_scores, roi_labels, roi_valid = proposal_layer(
            decoded, point_cls,
            nms_pre=int(nms_cfg.NMS_PRE_MAXSIZE),
            nms_post=int(nms_cfg.NMS_POST_MAXSIZE),
            nms_thresh=float(nms_cfg.NMS_THRESH))
        if stage == 2:
            return rois.sum() + roi_scores.sum()
        targets = sample_rois_for_rcnn(
            key, rois, roi_scores, roi_labels, gt, mcfg.ROI_HEAD.TARGET_CONFIG)
        rois2 = targets["rois"]
        ct = canonical_transform_gt(rois2, targets["gt_of_rois"])
        if stage == 3:
            return rois2.sum() + ct.sum()
        pooled = pool_roi_features(
            xyz, feats, point_scores, rois2,
            jnp.ones(rois2.shape[:2], bool),
            num_sampled_points=int(mcfg.ROI_HEAD.ROI_POINT_POOL.NUM_SAMPLED_POINTS),
            depth_normalizer=float(mcfg.ROI_HEAD.ROI_POINT_POOL.DEPTH_NORMALIZER),
            pool_extra_width=tuple(mcfg.ROI_HEAD.ROI_POINT_POOL.POOL_EXTRA_WIDTH))
        pooled = jax.lax.stop_gradient(pooled)
        return pooled.sum()

    return fwd(variables)


def _backbone_and_point_head(self, points, train):
    feats = self.backbone(points, train=train)
    point_cls, point_box = self.point_head(feats, train=train)
    return feats, point_cls, point_box


def timeit(fn, *args, iters=8):
    out = fn(*args)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(jnp.ravel(leaf)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(jnp.ravel(leaf)[0]))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    batches = [int(a) for a in sys.argv[1:]] or [8]
    for B in batches:
        points, gt = make(B)
        tx = optax.adam(1e-3)
        state = create_train_state(
            model, tx, {"points": np.asarray(points), "gt_boxes": np.asarray(gt)})
        key = jax.random.PRNGKey(7)
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        # FWD-ONLY truncations (the VALUE is fetched, so nothing DCEs; an
        # earlier jax.grad-only version read "4.9 ms" for T2 because the
        # post-proposal stages are stop-gradient'ed — grads were all zero
        # and XLA deleted the forward). Deltas between consecutive rows
        # attribute forward wall to the stage added; bwd is measured
        # separately below where gradients actually flow (T0, full).
        rows = []
        names = ["T0 backbone", "T1 +point head+decode", "T2 +proposal NMS",
                 "T3 +roi sample/targets", "T4 +roipoint pool"]
        for stage in range(5):
            f = jax.jit(lambda v, s=stage: stage_loss(v, points, gt, key, s))
            ms = timeit(f, variables)
            rows.append((names[stage], ms))
            print(f"B={B} {names[stage]:26s} fwd {ms:7.1f} ms", flush=True)

        g0 = jax.jit(jax.value_and_grad(
            lambda v: stage_loss(v, points, gt, key, 0)))
        ms_bwd0 = timeit(lambda v: g0(v)[0], variables)
        print(f"B={B} {'T0 backbone fwd+bwd':26s}     {ms_bwd0:7.1f} ms",
              flush=True)

        # T5: full loss fwd+bwd; T6: full step
        from modest_tpu.train.state import make_train_step

        def full_loss(v):
            out, _ = model.apply(v, points, gt, train=True,
                                 rngs={"sampler": key},
                                 mutable=["batch_stats"])
            loss, _ = pointrcnn_loss(out, gt, mcfg, num_class=len(cfg.CLASS_NAMES))
            return loss

        ms5f = timeit(jax.jit(full_loss), variables)
        print(f"B={B} {'T5 full loss fwd':26s}     {ms5f:7.1f} ms", flush=True)
        ms5 = timeit(jax.jit(jax.grad(full_loss)), variables)
        print(f"B={B} {'T5 full loss':26s} fwd+bwd {ms5:7.1f} ms", flush=True)
        step = make_train_step(model, cfg.MODEL, tx)

        def run_step(st):
            st, mm = step(st, points, gt, key)
            return st, mm

        # warm + timed (sync via metric fetch); the step donates its state
        # arg, so it runs on a copy and chains thereafter
        st = jax.tree_util.tree_map(jnp.array, state)
        st, mm = run_step(st)
        float(mm["loss"])
        t0 = time.perf_counter()
        it = 8
        for _ in range(it):
            st, mm = run_step(st)
        float(mm["loss"])
        ms6 = (time.perf_counter() - t0) / it * 1e3
        print(f"B={B} {'T6 full step (adam)':26s}         {ms6:7.1f} ms "
              f"= {B / ms6 * 1e3:.1f} train scans/s/chip", flush=True)

        prev = 0.0
        print(f"\nB={B} forward stage deltas (ms):")
        for nme, ms in rows + [("T5 full loss fwd", ms5f)]:
            print(f"  {nme:26s} {ms - prev:7.1f}")
            prev = ms
        print(f"  {'bwd (T5 grad - T5 fwd)':26s} {ms5 - ms5f:7.1f}")
        print(f"  {'backbone bwd (T0 pair)':26s} {ms_bwd0 - rows[0][1]:7.1f}")


if __name__ == "__main__":
    main()
