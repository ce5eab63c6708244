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
