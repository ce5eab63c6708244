"""Training metrics sinks (reference: tensorboardX + optional wandb,
tools/train_utils/train_utils.py:33-61, tools/train.py:108-117).

Always writes JSONL (machine-readable, no deps); mirrors to tensorboard
and/or wandb when those packages exist in the environment.
"""
from __future__ import annotations

import json
import time
from pathlib import Path


class MetricsLogger:
    def __init__(self, log_dir, use_tensorboard: bool = True, use_wandb: bool = False,
                 wandb_cfg: dict | None = None):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self._f = open(self.log_dir / "metrics.jsonl", "a")
        self._tb = None
        self._wandb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter  # type: ignore

                self._tb = SummaryWriter(str(self.log_dir / "tensorboard"))
            except ImportError:
                try:
                    from torch.utils.tensorboard import SummaryWriter  # type: ignore

                    self._tb = SummaryWriter(str(self.log_dir / "tensorboard"))
                except ImportError:
                    pass
        if use_wandb:
            try:
                import wandb  # type: ignore

                wandb.init(**(wandb_cfg or {}))
                self._wandb = wandb
            except ImportError:
                pass

    def log(self, step: int, scalars: dict, prefix: str = ""):
        rec = {"step": int(step), "time": time.time()}
        for k, v in scalars.items():
            key = f"{prefix}{k}"
            try:
                rec[key] = float(v)
            except (TypeError, ValueError):
                continue
            if self._tb is not None:
                self._tb.add_scalar(key, rec[key], step)
            if self._wandb is not None:
                self._wandb.log({key: rec[key]}, step=step)
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()
