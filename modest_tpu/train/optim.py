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


def one_cycle_flat_schedules(lr_max: float, moms, div_factor: float,
                             pct_start: float, flat_start: float,
                             total_steps: int):
    """OneCycleFlat (reference learning_schedules_fastai.py:80-101): cosine
    up to lr_max over PCT_START, cosine back down to lr_max/div by
    FLAT_START, then flat at the low lr for the rest of training."""
    low_lr = lr_max / div_factor
    s1 = int(total_steps * pct_start)
    s2 = int(total_steps * flat_start)

    def piecewise(v0, v1, v2):
        def fn(step):
            step = jnp.asarray(step, jnp.float32)
            up = annealing_cos(v0, v1, step / max(s1, 1))
            down = annealing_cos(v1, v2, (step - s1) / max(s2 - s1, 1))
            flat = jnp.asarray(v2, jnp.float32)
            return jnp.where(step < s1, up, jnp.where(step < s2, down, flat))

        return fn

    return (piecewise(low_lr, lr_max, low_lr),
            piecewise(moms[0], moms[1], moms[0]))


def decay_list_schedule(lr: float, decay_step_list, lr_decay: float,
                        lr_clip: float, warmup_steps: int = 0,
                        warmup_eta_min: float = 0.0):
    """Step-decay LambdaLR with optional cosine warmup (reference
    optimization/__init__.py:40-47 lr_lbmd + CosineWarmupLR:103-112, both
    stepped per iteration; the reference builds the warmup with
    eta_min = LR / DIV_FACTOR, optimization/__init__.py:62-66).
    decay_step_list is in ITERATIONS (the reference pre-multiplies
    DECAY_STEP_LIST epochs by iters-per-epoch)."""
    steps = jnp.asarray(sorted(int(s) for s in decay_step_list), jnp.float32)
    floor = float(lr_clip) / float(lr)

    def lr_fn(step):
        step = jnp.asarray(step, jnp.float32)
        n_passed = (step >= steps).sum().astype(jnp.float32)
        decay = jnp.maximum(jnp.power(lr_decay, n_passed), floor) * lr
        if warmup_steps > 0:
            warm = warmup_eta_min + (lr - warmup_eta_min) * (
                1 - jnp.cos(jnp.pi * step / warmup_steps)) / 2
            return jnp.where(step < warmup_steps, warm, decay)
        return decay

    return lr_fn


def build_optimizer(opt_cfg, total_steps: int, iters_per_epoch: int | None = None):
    """OPTIMIZATION config → optax transform (reference optimization/__init__).

    iters_per_epoch converts the epoch-denominated DECAY_STEP_LIST /
    WARMUP_EPOCH knobs of the adam/sgd paths; defaults to total_steps /
    NUM_EPOCHS when not given.
    """
    name = opt_cfg.OPTIMIZER
    wd = float(opt_cfg.get("WEIGHT_DECAY", 0.0))

    def adam_chain(learning_rate, b1):
        return optax.chain(
            optax.scale_by_adam(b1=b1, b2=0.99),
            optax.add_decayed_weights(wd),
            optax.scale_by_learning_rate(learning_rate),
        )

    if name == "adam_onecycle":
        lr_fn, b1_fn = one_cycle_schedules(
            float(opt_cfg.LR), tuple(opt_cfg.MOMS), float(opt_cfg.DIV_FACTOR),
            float(opt_cfg.PCT_START), total_steps,
        )
        inner = optax.inject_hyperparams(adam_chain)(learning_rate=lr_fn, b1=b1_fn)
    elif name == "adam_onecycleflat":
        lr_fn, b1_fn = one_cycle_flat_schedules(
            float(opt_cfg.LR), tuple(opt_cfg.MOMS), float(opt_cfg.DIV_FACTOR),
            float(opt_cfg.PCT_START), float(opt_cfg.FLAT_START), total_steps,
        )
        inner = optax.inject_hyperparams(adam_chain)(learning_rate=lr_fn, b1=b1_fn)
    elif name in ("adam", "sgd"):
        ipe = iters_per_epoch or max(
            total_steps // max(int(opt_cfg.get("NUM_EPOCHS", 1)), 1), 1)
        if opt_cfg.get("DECAY_STEP_LIST", None):
            warmup = (int(opt_cfg.get("WARMUP_EPOCH", 1)) * ipe
                      if opt_cfg.get("LR_WARMUP", False) else 0)
            lr = decay_list_schedule(
                float(opt_cfg.LR),
                [int(e) * ipe for e in opt_cfg.DECAY_STEP_LIST],
                float(opt_cfg.get("LR_DECAY", 0.1)),
                float(opt_cfg.get("LR_CLIP", 1e-7)),
                warmup_steps=warmup,
                warmup_eta_min=float(opt_cfg.LR) / float(opt_cfg.get("DIV_FACTOR", 10)),
            )
        else:
            lr = float(opt_cfg.LR)
        # torch Adam/SGD weight_decay is COUPLED L2 (added to the gradient
        # before the update), unlike the one-cycle path's true_wd
        if name == "adam":
            inner = optax.inject_hyperparams(
                lambda learning_rate: optax.chain(
                    optax.add_decayed_weights(wd),
                    optax.scale_by_adam(),
                    optax.scale_by_learning_rate(learning_rate),
                ))(learning_rate=lr)
        else:
            inner = optax.inject_hyperparams(
                lambda learning_rate: optax.chain(
                    optax.add_decayed_weights(wd),
                    optax.trace(decay=float(opt_cfg.get("MOMENTUM", 0.9))),
                    optax.scale_by_learning_rate(learning_rate),
                ))(learning_rate=lr)
    else:
        raise NotImplementedError(name)
    return optax.chain(optax.clip_by_global_norm(float(opt_cfg.GRAD_NORM_CLIP)), inner)


def current_lr(opt_state) -> float:
    """Extract the injected learning rate for logging."""
    try:
        return float(opt_state[1].hyperparams["learning_rate"])
    except (AttributeError, IndexError, KeyError, TypeError):
        return float("nan")
