"""make_train_multi_step (K steps per dispatch) ≡ K make_train_step calls.

The scan body reuses the exact single-step function with the per-step key
derived from fold_in(rng, state.step), so the two drivers must produce
bit-identical parameters and metrics on the same batch stream.
"""
import numpy as np
import pytest

import __graft_entry__ as G


@pytest.fixture(scope="module")
def setup():
    import jax
    import jax.numpy as jnp

    from modest_tpu.models.pointrcnn import PointRCNN
    from modest_tpu.train.optim import build_optimizer
    from modest_tpu.train.state import (
        create_train_state,
        make_train_multi_step,
        make_train_step,
    )
    from modest_tpu.utils.config import Config

    model_cfg = G._tiny_model_cfg()
    model = PointRCNN(model_cfg=model_cfg, num_class=1)
    opt_cfg = Config(
        {"OPTIMIZER": "adam_onecycle", "LR": 0.01, "WEIGHT_DECAY": 0.01,
         "MOMS": [0.95, 0.85], "PCT_START": 0.4, "DIV_FACTOR": 10,
         "GRAD_NORM_CLIP": 10})
    optimizer = build_optimizer(opt_cfg, total_steps=12)

    rng = np.random.RandomState(0)
    K, b, n = 3, 2, 256
    points = rng.uniform(-1, 1, (K, b, n, 4)).astype(np.float32) * [20, 20, 1.5, 1]
    gt = np.zeros((K, b, 4, 8), np.float32)
    gt[:, :, 0, :7] = [5, 3, 0, 4, 1.8, 1.5, 0.3]
    gt[:, :, 0, 7] = 1

    state0 = create_train_state(
        model, optimizer, {"points": points[0], "gt_boxes": gt[0]})
    single = make_train_step(model, model_cfg, optimizer)
    multi = make_train_multi_step(model, model_cfg, optimizer)
    return jax, jnp, state0, single, multi, points, gt


def test_multi_step_matches_sequential(setup):
    jax, jnp, state0, single, multi, points, gt = setup
    key = jax.random.PRNGKey(3)

    # both steps donate their state arg — run each chain on its own copy
    st = jax.tree_util.tree_map(jnp.array, state0)
    seq_metrics = []
    for k in range(points.shape[0]):
        st, m = single(st, jnp.asarray(points[k]), jnp.asarray(gt[k]), key)
        seq_metrics.append(float(m["loss"]))

    st2, mm = multi(jax.tree_util.tree_map(jnp.array, state0),
                    jnp.asarray(points), jnp.asarray(gt), key)

    np.testing.assert_array_equal(
        np.asarray(mm["loss"]), np.asarray(seq_metrics, np.float32))
    assert int(st2.step) == int(st.step) == points.shape[0]
    for a, b in zip(jax.tree_util.tree_leaves(st.params),
                    jax.tree_util.tree_leaves(st2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_multi_step_sharded(setup):
    jax, jnp, state0, single, multi, points, gt = setup
    from modest_tpu.parallel.mesh import make_mesh
    from modest_tpu.models.pointrcnn import PointRCNN
    from modest_tpu.train.optim import build_optimizer
    from modest_tpu.train.state import make_train_multi_step
    from modest_tpu.utils.config import Config

    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices (conftest forces 8 virtual CPUs)")
    mesh = make_mesh(2)
    model_cfg = G._tiny_model_cfg()
    model = PointRCNN(model_cfg=model_cfg, num_class=1)
    opt_cfg = Config(
        {"OPTIMIZER": "adam_onecycle", "LR": 0.01, "WEIGHT_DECAY": 0.01,
         "MOMS": [0.95, 0.85], "PCT_START": 0.4, "DIV_FACTOR": 10,
         "GRAD_NORM_CLIP": 10})
    optimizer = build_optimizer(opt_cfg, total_steps=12)
    multi_m = make_train_multi_step(model, model_cfg, optimizer, mesh)
    st, mm = multi_m(jax.tree_util.tree_map(jnp.array, state0),
                     jnp.asarray(points), jnp.asarray(gt),
                     jax.random.PRNGKey(3))
    assert np.isfinite(np.asarray(mm["loss"])).all()
    assert int(st.step) == points.shape[0]
