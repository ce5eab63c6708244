"""Hierarchical YAML config system.

Replaces both config stacks of the reference with one implementation:
  * OpenPCDet-style model/data configs with ``_BASE_CONFIG_`` inheritance and
    ``--set A.B.C v`` dotted overrides (reference: pcdet/config.py:16-80).
  * Hydra-style pipeline configs with ``key=value`` CLI overrides
    (reference: generate_cluster_mask/configs/*.yaml).

No external deps beyond PyYAML.
"""
from __future__ import annotations

import copy
from pathlib import Path

import yaml


class Config(dict):
    """dict with attribute access; nested dicts are converted recursively."""

    def __init__(self, d=None, **kwargs):
        super().__init__()
        if d:
            for k, v in d.items():
                self[k] = v
        for k, v in kwargs.items():
            self[k] = v

    @staticmethod
    def _wrap(v):
        import collections.abc

        if isinstance(v, Config):
            return v
        if isinstance(v, collections.abc.Mapping):  # dict, FrozenDict, ...
            return Config(v)
        if isinstance(v, list):
            return [Config._wrap(x) for x in v]
        if isinstance(v, tuple):
            return tuple(Config._wrap(x) for x in v)
        return v

    def __setitem__(self, k, v):
        super().__setitem__(k, Config._wrap(v))

    def __setattr__(self, k, v):
        self[k] = v

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)

    def __deepcopy__(self, memo):
        return Config({k: copy.deepcopy(v, memo) for k, v in self.items()})

    def to_dict(self):
        def unwrap(v):
            if isinstance(v, Config):
                return {k: unwrap(x) for k, x in v.items()}
            if isinstance(v, (list, tuple)):
                return type(v)(unwrap(x) for x in v)
            return v

        return unwrap(self)


def _merge_new_config(config: Config, new_config: dict, base_dir: Path) -> Config:
    """Recursive merge with ``_BASE_CONFIG_`` support.

    Matches reference semantics (pcdet/config.py:51-68): the base config is
    loaded first, then the current file's keys overwrite/merge into it.
    """
    if "_BASE_CONFIG_" in new_config:
        base_path = Path(new_config["_BASE_CONFIG_"])
        if not base_path.is_absolute():
            # try relative to the including file, then relative to cwd
            cand = base_dir / base_path
            base_path = cand if cand.exists() else Path.cwd() / base_path
        with open(base_path) as f:
            base_cfg = yaml.safe_load(f)
        _merge_new_config(config, base_cfg, base_path.parent)

    for key, val in new_config.items():
        if key == "_BASE_CONFIG_":
            continue
        if isinstance(val, dict):
            if key not in config or not isinstance(config[key], dict):
                config[key] = Config()
            _merge_new_config(config[key], val, base_dir)
        else:
            config[key] = val
    return config


def cfg_from_yaml_file(cfg_file, config: Config | None = None) -> Config:
    config = Config() if config is None else config
    cfg_file = Path(cfg_file)
    with open(cfg_file) as f:
        new_config = yaml.safe_load(f)
    _merge_new_config(config, new_config or {}, cfg_file.parent)
    return config


def _coerce(value_str: str, old_value):
    """Parse an override string, preferring the type of the value it replaces."""
    parsed = yaml.safe_load(value_str)
    if old_value is not None and parsed is not None:
        if isinstance(old_value, bool):
            return bool(parsed)
        if isinstance(old_value, (list, tuple)) and not isinstance(parsed, (list, tuple)):
            raise ValueError(f"expected list for override, got {value_str!r}")
    return parsed


def cfg_from_list(cfg_list, config: Config) -> Config:
    """Apply ``[A.B.C, value, ...]`` pairs (reference: pcdet/config.py:16-48)."""
    assert len(cfg_list) % 2 == 0, "override list must be key/value pairs"
    for full_key, v in zip(cfg_list[0::2], cfg_list[1::2]):
        keys = full_key.split(".")
        d = config
        for sub in keys[:-1]:
            if sub not in d:
                d[sub] = Config()
            d = d[sub]
        d[keys[-1]] = _coerce(str(v), d.get(keys[-1]))
    return config


def cfg_from_kv_overrides(overrides, config: Config) -> Config:
    """Apply hydra-style ``key=value`` overrides."""
    pairs = []
    for item in overrides:
        if "=" not in item:
            raise ValueError(f"override {item!r} must be key=value")
        k, v = item.split("=", 1)
        pairs += [k, v]
    return cfg_from_list(pairs, config)


def save_config(config: Config, path):
    with open(path, "w") as f:
        yaml.safe_dump(config.to_dict(), f, default_flow_style=None, sort_keys=False)


def resolve_interpolations(cfg: Config, root: Config | None = None) -> Config:
    """Resolve ``${a.b.c}`` references against the root config (hydra-lite).

    Runs repeatedly until fixed point so chained references resolve.
    """
    import re

    root = cfg if root is None else root
    pattern = re.compile(r"\$\{([a-zA-Z0-9_.]+)\}")

    def lookup(path):
        d = root
        for part in path.split("."):
            d = d[part]
        return d

    def resolve_str(s):
        m = pattern.fullmatch(s)
        if m:  # whole-string reference: preserve the referenced type
            return lookup(m.group(1))
        return pattern.sub(lambda mm: str(lookup(mm.group(1))), s)

    def walk(node):
        changed = False
        if isinstance(node, Config):
            for k, v in list(node.items()):
                if isinstance(v, str) and pattern.search(v):
                    node[k] = resolve_str(v)
                    changed = True
                elif isinstance(v, (Config, list)):
                    changed |= walk(v)
        elif isinstance(node, list):
            for i, v in enumerate(node):
                if isinstance(v, str) and pattern.search(v):
                    node[i] = resolve_str(v)
                    changed = True
                elif isinstance(v, (Config, list)):
                    changed |= walk(v)
        return changed

    for _ in range(10):
        if not walk(cfg):
            break
    return cfg


def log_config_to_file(cfg: Config, pre="cfg", logger=None):
    emit = logger.info if logger is not None else print
    for key, val in cfg.items():
        if isinstance(val, Config):
            emit(f"----------- {key} -----------")
            log_config_to_file(val, pre=f"{pre}.{key}", logger=logger)
        else:
            emit(f"{pre}.{key}: {val}")
