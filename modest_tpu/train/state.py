"""Train state + jitted train/eval steps (data-parallel over a mesh).

Replaces the reference's train_one_epoch / model_fn_decorator
(tools/train_utils/train_utils.py:9-65): one jitted SPMD step — batch inputs
sharded over the mesh 'data' axis, parameters replicated, gradient reduction
inserted by XLA over ICI.
"""
from __future__ import annotations

import functools
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models import api as model_api
from ..parallel.mesh import batch_sharding, replicated


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(model, optimizer, sample_batch, seed: int = 666) -> TrainState:
    rngs = {"params": jax.random.PRNGKey(seed), "sampler": jax.random.PRNGKey(seed + 1),
            "dropout": jax.random.PRNGKey(seed + 2)}  # ASPP dropout (CaDDN DeepLab)
    # dispatch on the MODEL (not the batch): a lidar model may legally train
    # on a dataset whose GET_ITEM_LIST also loads images
    is_camera = str(getattr(model, "model_cfg", {}).get("NAME", "")) == "CaDDN"
    if is_camera:  # camera models (CaDDN) init from a camera batch
        variables = model.init(
            rngs,
            jnp.asarray(sample_batch["images"]),
            jnp.asarray(sample_batch["trans_lidar_to_cam"]),
            jnp.asarray(sample_batch["trans_cam_to_img"]),
            jnp.asarray(sample_batch["gt_boxes"]),
            train=True,
        )
    else:
        variables = model.init(
            rngs,
            jnp.asarray(sample_batch["points"]),
            jnp.asarray(sample_batch["gt_boxes"]),
            train=True,
        )  # the 'sampler' rng stream is unused (and harmless) for grid models
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=optimizer.init(params),
    )


def _train_step_body(model, model_cfg, optimizer):
    def train_step(state: TrainState, points, gt_boxes, rng):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            out, new_bs = model_api.apply_train(
                model, model_cfg,
                {"params": params, "batch_stats": state.batch_stats},
                points, gt_boxes, rng,
            )
            loss, metrics = model_api.compute_loss(
                out, gt_boxes, model_cfg,
                num_class=int(getattr(model, "num_class", 1)),
            )
            return loss, (metrics, new_bs)

        grads, (metrics, new_bs) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=new_params,
            batch_stats=new_bs, opt_state=new_opt,
        )
        return new_state, metrics

    return train_step


def make_train_step(model, model_cfg, optimizer, mesh=None):
    train_step = _train_step_body(model, model_cfg, optimizer)
    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))
    bs = batch_sharding(mesh)
    rep = replicated(mesh)
    return jax.jit(
        train_step,
        in_shardings=(rep, bs, bs, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def make_train_multi_step(model, model_cfg, optimizer, mesh=None):
    """K sequential optimizer steps in ONE dispatch (lax.scan over stacked
    batches (K, B, ...)).

    Bit-identical to K calls of make_train_step with the same `rng` and the
    same batches in order (the per-step key is fold_in(rng, state.step),
    which the scan body reproduces); metrics come back stacked (K,). The
    win is amortizing the fixed per-dispatch cost — optimizer tail + relay
    round trip, ~17 ms/step at B=8 on this platform — across K steps;
    production TPU-VM hosts pay less per dispatch but still benefit at
    small per-step times. The K batches must be resident together
    (K × B × 12288 × 4 f32 ≈ 1.6 MB per K at B=8 — negligible next to
    activations).
    """
    train_step = _train_step_body(model, model_cfg, optimizer)

    def multi_step(state: TrainState, points_k, gt_boxes_k, rng):
        def body(st, xs):
            pts, gt = xs
            return train_step(st, pts, gt, rng)

        return jax.lax.scan(body, state, (points_k, gt_boxes_k))

    if mesh is None:
        return jax.jit(multi_step, donate_argnums=(0,))
    bs_k = NamedSharding(mesh, P(None, "data"))  # (K, B, ...) — shard B
    rep = replicated(mesh)
    return jax.jit(
        multi_step,
        in_shardings=(rep, bs_k, bs_k, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def make_eval_step(model, model_cfg, mesh=None):
    def eval_step(state: TrainState, points):
        out = model_api.apply_eval(
            model, model_cfg,
            {"params": state.params, "batch_stats": state.batch_stats},
            points,
        )
        return model_api.post_process(out, model_cfg)

    if mesh is None:
        return jax.jit(eval_step)
    bs = batch_sharding(mesh)
    rep = replicated(mesh)
    return jax.jit(eval_step, in_shardings=(rep, bs), out_shardings=bs)
