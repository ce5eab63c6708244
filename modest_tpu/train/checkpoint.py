"""Checkpoint save/load via orbax (replaces the reference's .pth dicts,
train_utils.py:118-152, incl. rotation via max_ckpt_save_num)."""
from __future__ import annotations

from pathlib import Path

import orbax.checkpoint as ocp


def make_manager(ckpt_dir, max_to_keep: int = 30) -> ocp.CheckpointManager:
    ckpt_dir = Path(ckpt_dir).resolve()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True)
    return ocp.CheckpointManager(ckpt_dir, options=options)


def save_checkpoint(manager: ocp.CheckpointManager, state, epoch: int, extra: dict | None = None):
    payload = {"state": state}
    if extra:
        payload["extra"] = extra
    manager.save(epoch, args=ocp.args.StandardSave(payload))
    manager.wait_until_finished()


def latest_epoch(manager: ocp.CheckpointManager):
    return manager.latest_step()


def restore_checkpoint(manager: ocp.CheckpointManager, abstract_state, epoch: int | None = None):
    """Restore into the structure of abstract_state (a concrete template)."""
    step = epoch if epoch is not None else manager.latest_step()
    if step is None:
        return None, None
    restored = manager.restore(
        step, args=ocp.args.StandardRestore({"state": abstract_state})
    )
    return restored["state"], step


def load_params_partial(state, ckpt_dir, epoch: int | None = None,
                        logger=None):
    """Transfer-load: copy checkpointed params whose path AND shape match,
    keep the rest initialized (reference detector3d_template
    load_params_from_file:327-353 shape-checked partial load).

    Returns (state_with_loaded_params, n_loaded, n_skipped).
    """
    import jax

    manager = make_manager(ckpt_dir)
    step = epoch if epoch is not None else manager.latest_step()
    assert step is not None, f"no checkpoint found in {ckpt_dir}"
    # template-free restore: the checkpointed tree need NOT match the new
    # model (that's the point of a transfer load) — orbax returns raw dicts
    raw = manager.restore(step, args=ocp.args.StandardRestore())
    old_params = raw["state"]["params"]

    def _key(path):
        return tuple(
            getattr(p, "key", getattr(p, "idx", getattr(p, "name", str(p))))
            for p in path
        )

    flat_new, treedef = jax.tree_util.tree_flatten_with_path(state.params)
    flat_old = {
        _key(p): v
        for p, v in jax.tree_util.tree_flatten_with_path(old_params)[0]
    }
    out, loaded, skipped = [], 0, 0
    for path, leaf in flat_new:
        old = flat_old.get(_key(path))
        if old is not None and getattr(old, "shape", None) == leaf.shape:
            out.append(old)
            loaded += 1
        else:
            out.append(leaf)
            skipped += 1
            if logger is not None:
                logger.info(f"partial load: skipping {jax.tree_util.keystr(path)}")
    params = jax.tree_util.tree_unflatten(treedef, out)
    return state.replace(params=params), loaded, skipped
