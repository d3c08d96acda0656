"""YAML config loading with recursive default-merge (reference:
src/utils/__init__.py:47-87): a scene config overlays the ``default.yml``
in its own directory (auto-discovered) or an explicit default path."""

from pathlib import Path

import yaml


def update_recursive(dict1, dict2):
    for k, v in dict2.items():
        if k not in dict1:
            dict1[k] = dict()
        if isinstance(v, dict):
            update_recursive(dict1[k], v)
        else:
            dict1[k] = v


def load_yaml(path, default_path=None):
    path = Path(path)
    if not path.exists():
        raise FileNotFoundError(path)
    with open(path) as fp:
        cfg_s = yaml.load(fp, Loader=yaml.FullLoader)
    if default_path is not None:
        with open(default_path) as fp:
            cfg = yaml.load(fp, Loader=yaml.FullLoader)
    else:
        default_path = path.parent / "default.yml"
        if default_path.exists():
            with open(default_path) as fp:
                cfg = yaml.load(fp, Loader=yaml.FullLoader)
        else:
            cfg = {}
    update_recursive(cfg, cfg_s)
    return cfg


def dump_yaml(cfg, path):
    with open(path, mode="w") as f:
        return yaml.safe_dump(cfg, f)
