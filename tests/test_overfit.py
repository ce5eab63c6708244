"""Behavioral learning test: a tiny PointRCNN overfits one synthetic scene —
loss drops and the refined box lands on the planted car."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from modest_tpu.models.pointrcnn import PointRCNN, pointrcnn_loss, post_process
from modest_tpu.ops.iou3d import boxes_iou_bev

from test_pointrcnn_model import tiny_model_cfg
import pytest

pytestmark = pytest.mark.slow


def test_overfit_single_scene():
    rng = np.random.RandomState(0)
    cfg = tiny_model_cfg()
    model = PointRCNN(model_cfg=cfg, num_class=1)

    n = 384
    box = np.array([10.0, 2.0, 0.0, 4.0, 1.8, 1.5, 0.5])
    points = rng.uniform(-1, 1, (1, n, 4)).astype(np.float32) * [25, 25, 1.5, 1]
    local = rng.uniform(-0.5, 0.5, (120, 3)) * box[3:6]
    c, s = np.cos(box[6]), np.sin(box[6])
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    points[0, :120, :3] = local @ rot.T + box[:3]
    gt = np.zeros((1, 4, 8), np.float32)
    gt[0, 0, :7] = box
    gt[0, 0, 7] = 1
    points = jnp.asarray(points)
    gt = jnp.asarray(gt)

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)},
        points, gt, train=True,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, rng):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats},
                points, gt, train=True, rngs={"sampler": rng},
                mutable=["batch_stats"],
            )
            loss, metrics = pointrcnn_loss(out, gt, cfg)
            return loss, (metrics, mut["batch_stats"])

        (loss, (metrics, bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), bs, opt_state, loss

    losses = []
    key = jax.random.PRNGKey(7)
    for i in range(150):
        key, sub = jax.random.split(key)
        params, batch_stats, opt_state, loss = step(params, batch_stats, opt_state, sub)
        losses.append(float(loss))
    assert all(np.isfinite(losses)), losses[-5:]
    assert np.mean(losses[-10:]) < losses[0] * 0.62, (losses[0], np.mean(losses[-10:]))

    out = model.apply({"params": params, "batch_stats": batch_stats}, points, train=False)
    final = post_process(out, cfg.POST_PROCESSING)
    valid = np.asarray(final["valid"][0])
    assert valid.any(), "no detections after overfitting"
    boxes = np.asarray(final["boxes"][0])[valid]
    scores = np.asarray(final["scores"][0])[valid]
    best = boxes[np.argmax(scores)]
    iou = float(boxes_iou_bev(jnp.asarray(best[None, :7], jnp.float32),
                              jnp.asarray(box[None, :7], jnp.float32))[0, 0])
    assert iou > 0.25, f"best detection IoU {iou:.3f} vs gt (box {best})"
