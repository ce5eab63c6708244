"""Dev: time the post-backbone stages of PointRCNN eval on the real chip."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from modest_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()

from modest_tpu.models.pointrcnn import PointRCNN, post_process
from modest_tpu.utils.config import cfg_from_yaml_file

BATCH = 4
cfg = cfg_from_yaml_file("configs/models/lyft_models/pointrcnn_dynamic_obj.yaml")
model = PointRCNN(model_cfg=cfg.MODEL, num_class=len(cfg.CLASS_NAMES))

rng = np.random.RandomState(0)
n = 12288
points = rng.uniform(0, 1, (BATCH, n, 4)).astype(np.float32)
points[..., 0] *= 80
points[..., 1] = (points[..., 1] - 0.5) * 80
points[..., 2] = (points[..., 2] - 0.5) * 3 - 0.5
for b in range(BATCH):
    for k in range(10):
        c = rng.uniform([5, -30, -1.6], [70, 30, -1.4])
        sl = slice(k * 300, (k + 1) * 300)
        points[b, sl, :3] = c + rng.uniform(-1, 1, (300, 3)) * [2, 0.9, 0.7]
gt = np.zeros((BATCH, 8, 8), np.float32)
gt[:, 0, :7] = [10, 0, -1.5, 4, 2, 1.6, 0.3]
gt[:, 0, 7] = 1
variables = model.init(
    {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)},
    jnp.asarray(points), jnp.asarray(gt), train=True,
)
pts = jnp.asarray(points)


def timeit(name, fn, *args, iters=15):
    r = fn(*args)
    np.asarray(jax.tree.leaves(r)[0])
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = fn(*args)
        if (i + 1) % 5 == 0:
            np.asarray(jax.tree.leaves(out)[0])
    np.asarray(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1e3:8.2f} ms/batch", flush=True)


@jax.jit
def full(v, p):
    out = model.apply(v, p, train=False)
    f = post_process(out, cfg.MODEL.POST_PROCESSING)
    return f["boxes"].sum() + f["scores"].sum()


timeit("full eval fwd + post", full, variables, pts)

# backbone + point head + decode (stage 1, no NMS/roi)
from modest_tpu.models.point_head import PointHeadBox  # noqa
from modest_tpu.models.roi_head import (
    generate_refined_boxes,
    pool_roi_features,
    proposal_layer,
)


@jax.jit
def stage1(v, p):
    # replicate the model body up to decode (same modules/params)
    out = model.apply(v, p, train=False, method=None)
    return out  # full forward; used only for caching intermediate timing
# Instead time targeted subgraphs with fake inputs of the right shapes:


rngn = np.random.RandomState(1)
decoded = jnp.asarray(rngn.uniform(-1, 1, (BATCH, n, 7)).astype(np.float32) * 5
                      + np.array([40, 0, -1, 4, 2, 1.6, 0], np.float32))
point_cls = jnp.asarray(rngn.randn(BATCH, n, 1).astype(np.float32))


@jax.jit
def prop(decoded, point_cls):
    rois, scores, labels, valid = proposal_layer(
        decoded, point_cls, nms_pre=9000, nms_post=100, nms_thresh=0.85)
    return rois.sum() + scores.sum()


timeit("proposal_layer (eval NMS)", prop, decoded, point_cls)

feats = jnp.asarray(rngn.randn(BATCH, n, 128).astype(np.float32))
scores_pp = jnp.asarray(rngn.rand(BATCH, n).astype(np.float32))
rois = jnp.asarray(rngn.uniform(-1, 1, (BATCH, 100, 7)).astype(np.float32) * 3
                   + np.array([40, 0, -1, 4, 2, 1.6, 0], np.float32))
roi_valid = jnp.ones((BATCH, 100), bool)
xyz = pts[..., :3]


@jax.jit
def pool(xyz, feats, scores_pp, rois, roi_valid):
    pooled = pool_roi_features(
        xyz, feats, scores_pp, rois, roi_valid,
        num_sampled_points=512, depth_normalizer=70.0,
        pool_extra_width=(0.0, 0.0, 0.0))
    return pooled.sum()


timeit("pool_roi_features (512 pts x 100 rois)", pool, xyz, feats, scores_pp,
       rois, roi_valid)

pooled = jnp.asarray(rngn.randn(BATCH * 100, 512, 133).astype(np.float32))


@jax.jit
def roi_tower(v, pooled):
    cls, reg = model.apply(v, pooled, train=False,
                           method=lambda m, x, train: m.roi_head(x, train=train))
    return cls.sum() + reg.sum()


timeit("roi_head tower (SA on 100 rois)", roi_tower, variables, pooled)
