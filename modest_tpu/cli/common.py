"""Shared CLI plumbing for the pipeline entry points.

Mirrors the reference's hydra usage: a default config file plus ``key=value``
overrides, a ``data_paths`` config group, and sharding via total_part/part.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

from ..utils.config import (
    Config,
    cfg_from_kv_overrides,
    cfg_from_yaml_file,
    resolve_interpolations,
)

CONFIG_ROOT = Path(__file__).resolve().parents[2] / "configs" / "pipeline"


def eprint(*args, **kwargs):
    print(*args, file=sys.stderr, **kwargs)


def load_pipeline_config(config_name: str, overrides: list[str]) -> Config:
    cfg = cfg_from_yaml_file(CONFIG_ROOT / f"{config_name}.yaml")
    # apply overrides before resolving the data_paths group so
    # `data_paths=nusc` on the CLI selects the group
    group_overrides = [o for o in overrides if o.split("=", 1)[0] == "data_paths"]
    other_overrides = [o for o in overrides if o.split("=", 1)[0] != "data_paths"]
    if group_overrides:
        cfg.data_paths = group_overrides[-1].split("=", 1)[1]
    if isinstance(cfg.get("data_paths"), str):
        cfg.data_paths = cfg_from_yaml_file(CONFIG_ROOT / "data_paths" / f"{cfg.data_paths}.yaml")
    cfg_from_kv_overrides(other_overrides, cfg)
    resolve_interpolations(cfg)
    return cfg


def make_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("overrides", nargs="*", help="key=value config overrides (hydra-style)")
    return p


def shard_idx_list(idx_list, total_part: int, part: int):
    idx_list = np.array(list(idx_list))
    if total_part > 1:
        idx_list = np.array_split(idx_list, total_part)[part]
    return idx_list


def display_args(name: str, cfg: Config):
    import os

    import yaml

    eprint(f"========== {name} info ==========")
    eprint("host: {}".format(os.getenv("HOSTNAME")))
    eprint(yaml.safe_dump(cfg.to_dict(), default_flow_style=None, sort_keys=False))
    eprint("=" * (26 + len(name)))
