"""Dataset factory (reference: src/dataset/__init__.py:9-37)."""

from .base import Loader, MultiViewDataset
from .dtu import load_dtu
from .bmvs import load_bmvs
from .synthetic import load_synthetic


def get_dataset(name):
    if name == "nerfstudio":
        from .nerfstudio import load_nerfstudio

        return load_nerfstudio
    return {
        "dtu": load_dtu,
        "bmvs": load_bmvs,
        "synthetic": load_synthetic,
    }[name]


def create_train_val_test_loader(cfg, seed=0):
    """Three loaders (train shuffled) from cfg['dataset'] + batch size from
    cfg['training'] (reference semantics, dataset/__init__.py:9-26)."""
    dkw = dict(cfg["dataset"])
    name = dkw.pop("name")
    bs = cfg.get("training", {}).get("batch_size", 4)
    dkw.pop("n_workers", None)
    img_size = dkw.pop("img_size", None)
    tag = dkw.pop("tag", "")
    load = get_dataset(name)
    out = []
    for split, shuffle in [("train", True), ("val", False), ("test", False)]:
        ds = load(split, img_size, tag, **dkw)
        out.append(Loader(ds, batch_size=bs, shuffle=shuffle, seed=seed))
    return out
