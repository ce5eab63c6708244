"""adam_onecycle optimizer in optax.

Reference: tools/train_utils/optimization/ (fastai OptimWrapper + OneCycle
scheduler, learning_schedules_fastai.py:53-77): cosine-anneal lr from
lr_max/div → lr_max over PCT_START of training, then → lr_max/div/1e4;
Adam beta1 anneals 0.95 → 0.85 and back. True (decoupled) weight decay is
applied to every parameter (the reference runs OptimWrapper with
true_wd=True, bn_wd=True). Gradients are clipped by global norm first.
"""
from __future__ import annotations

import jax.numpy as jnp
import optax


def annealing_cos(start, end, pct):
    cos_out = jnp.cos(jnp.pi * pct) + 1
    return end + (start - end) / 2 * cos_out


def one_cycle_schedules(lr_max: float, moms, div_factor: float, pct_start: float,
                        total_steps: int):
    low_lr = lr_max / div_factor
    split = int(total_steps * pct_start)

    def lr_fn(step):
        step = jnp.asarray(step, jnp.float32)
        up = annealing_cos(low_lr, lr_max, step / max(split, 1))
        down = annealing_cos(lr_max, low_lr / 1e4,
                             (step - split) / max(total_steps - split, 1))
        return jnp.where(step < split, up, down)

    def b1_fn(step):
        step = jnp.asarray(step, jnp.float32)
        up = annealing_cos(moms[0], moms[1], step / max(split, 1))
        down = annealing_cos(moms[1], moms[0],
                             (step - split) / max(total_steps - split, 1))
        return jnp.where(step < split, up, down)

    return lr_fn, b1_fn


def build_optimizer(opt_cfg, total_steps: int):
    """OPTIMIZATION config → optax transform (reference optimization/__init__)."""
    name = opt_cfg.OPTIMIZER
    if name == "adam_onecycle":
        lr_fn, b1_fn = one_cycle_schedules(
            float(opt_cfg.LR), tuple(opt_cfg.MOMS), float(opt_cfg.DIV_FACTOR),
            float(opt_cfg.PCT_START), total_steps,
        )

        def make(learning_rate, b1):
            return optax.chain(
                optax.scale_by_adam(b1=b1, b2=0.99),
                optax.add_decayed_weights(float(opt_cfg.WEIGHT_DECAY)),
                optax.scale_by_learning_rate(learning_rate),
            )

        inner = optax.inject_hyperparams(make)(learning_rate=lr_fn, b1=b1_fn)
    elif name in ("adam", "sgd"):
        base = {"adam": optax.adam, "sgd": optax.sgd}[name]
        inner = base(float(opt_cfg.LR))
    else:
        raise NotImplementedError(name)
    return optax.chain(optax.clip_by_global_norm(float(opt_cfg.GRAD_NORM_CLIP)), inner)


def current_lr(opt_state) -> float:
    """Extract the injected learning rate for logging."""
    try:
        return float(opt_state[1].hyperparams["learning_rate"])
    except (AttributeError, IndexError, KeyError, TypeError):
        return float("nan")
