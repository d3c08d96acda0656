"""Metric meters + TSV logging + mesh evaluator (reference:
src/utils/metrics.py)."""

from __future__ import annotations

from collections import OrderedDict, defaultdict
from pathlib import Path

import numpy as np

from ..losses.chamfer import chamfer_distance


EPS = 1e-7
CHAMFER_FACTOR = 10  # standard reporting factor (OccNet/DVR convention)


def _scalar(v):
    if hasattr(v, "item"):
        return float(np.asarray(v))
    return float(v)


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.avg = 0.0
        self.count = 0

    def update(self, val, N=1):
        val = _scalar(val)
        self.val = val
        self.sum += val * N
        self.count += N
        self.avg = self.sum / self.count if self.count else 0.0


class Metrics:
    """Named meters with a TSV append-log and pandas read-back."""

    log_data = True

    def __init__(self, *names, log_file=None, append=False, truncate_iter=None):
        self.names = list(names)
        self.meters = defaultdict(AverageMeter)
        if log_file is not None and self.log_data:
            self.log_file = Path(log_file)
            if not self.log_file.exists() or not append:
                with open(self.log_file, "w") as f:
                    f.write("iteration\tepoch\tbatch\t" + "\t".join(self.names) + "\n")
            elif truncate_iter is not None:
                # resume: the interrupted run logged rows past its last
                # checkpoint; the replay will log them again — drop the
                # orphans so curves/dataframes see each iteration once
                self._truncate(truncate_iter)
        else:
            self.log_file = None

    def _truncate(self, max_iter):
        lines = self.log_file.read_text().splitlines(keepends=True)
        keep = lines[:1]
        for ln in lines[1:]:
            try:
                if int(ln.split("\t", 1)[0]) > max_iter:
                    continue
            except ValueError:
                pass
            keep.append(ln)
        if len(keep) != len(lines):
            self.log_file.write_text("".join(keep))

    def __getitem__(self, name):
        return self.meters[name]

    def __len__(self):
        return len(self.names)

    def __repr__(self):
        return ", ".join(f"{n}={self[n].avg:.4f}" for n in self.names)

    @property
    def values(self):
        return [self[n].avg for n in self.names]

    def update(self, *name_val, N=1):
        if len(name_val) == 1:
            for k, v in name_val[0].items():
                self.update(k, v, N=N)
        else:
            name, val = name_val
            if name not in self.names:
                raise KeyError(f"{name} not in current metrics")
            if isinstance(val, (tuple, list)):
                self[name].update(val[0], N=val[1])
            else:
                self[name].update(val, N=N)

    def log(self, it, epoch, batch):
        if self.log_file is not None:
            with open(self.log_file, "a") as f:
                f.write(
                    f"{it}\t{epoch}\t{batch}\t"
                    + "\t".join(f"{v:.6f}" for v in self.values)
                    + "\n"
                )

    def reset(self, *names):
        for n in names or self.names:
            self[n].reset()

    def log_and_reset(self, *names, it=None, epoch=None, batch=None):
        self.log(it, epoch, batch)
        self.reset(*names)

    def read_log(self):
        import pandas as pd

        if self.log_file is not None and self.log_file.exists():
            return pd.read_csv(self.log_file, sep="\t", index_col=0)
        return pd.DataFrame()

    def get_named_values(self, filter_fn=None):
        pairs = list(zip(self.names, self.values))
        if filter_fn is not None:
            pairs = [p for p in pairs if filter_fn(p[0])]
        return pairs


def sample_points_from_mesh(verts, faces, n_points, rng=None, return_normals=False):
    """Area-weighted surface sampling (pure numpy/JAX-free host path;
    replaces pytorch3d sample_points_from_meshes, reference metrics.py:146)."""
    rng = rng or np.random.default_rng(0)
    verts = np.asarray(verts, np.float64)
    faces = np.asarray(faces)
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    cross = np.cross(v1 - v0, v2 - v0)
    areas = 0.5 * np.linalg.norm(cross, axis=1)
    if areas.sum() <= 0:
        probs = np.full(len(faces), 1.0 / len(faces))
    else:
        probs = areas / areas.sum()
    idx = rng.choice(len(faces), size=n_points, p=probs)
    u = rng.random(n_points)
    v = rng.random(n_points)
    flip = u + v > 1
    u[flip], v[flip] = 1 - u[flip], 1 - v[flip]
    pts = v0[idx] + u[:, None] * (v1[idx] - v0[idx]) + v[:, None] * (v2[idx] - v0[idx])
    if return_normals:
        n = cross[idx]
        n = n / np.linalg.norm(n, axis=1, keepdims=True).clip(1e-12)
        return pts.astype(np.float32), n.astype(np.float32)
    return pts.astype(np.float32)


class MeshEvaluator:
    """Chamfer-L1 / normal-cosine (optionally after ICP alignment) between a
    predicted mesh and GT points (reference: src/utils/metrics.py:110-198)."""

    default_names = ["chamfer-L1", "chamfer-L1-ICP", "normal-cos", "normal-cos-ICP"]

    def __init__(self, names=None, log_file=None, run_icp=True,
                 estimate_scale=True, anisotropic_scale=True, fast_cpu=False,
                 append=False):
        self.names = names if names is not None else self.default_names
        self.metrics = Metrics(*self.names, log_file=log_file, append=append)
        self.run_icp = run_icp
        self.estimate_scale = estimate_scale
        self.ani_scale = anisotropic_scale
        self.fast_cpu = fast_cpu
        self.N = 50000 if fast_cpu else 100000
        self.n_iter = 30 if fast_cpu else 100

    def evaluate(self, verts, faces, pc_gt, norm_gt=None, rng=None):
        rng = rng or np.random.default_rng(0)
        pc_pred, norm_pred = sample_points_from_mesh(
            verts, faces, self.N, rng, return_normals=True
        )
        pc_gt = np.asarray(pc_gt, np.float32)
        if self.N < len(pc_gt):  # subsample with or without normals
            sel = rng.permutation(len(pc_gt))[: self.N]
            pc_gt = pc_gt[sel]
            if norm_gt is not None:
                norm_gt = norm_gt[sel]

        rounds = [(pc_pred, norm_pred, "")]
        if self.run_icp:
            from .icp import gradient_icp

            # normalize pred into the unit cube for better ICP (reference
            # metrics.py:155)
            center = 0.5 * (verts.max(0) + verts.min(0))
            scale = np.abs(verts - center).max() * 2
            verts_n = (verts - center) / max(scale, EPS)
            pc2, norm2 = sample_points_from_mesh(
                verts_n, faces, self.N, rng, return_normals=True
            )
            pc_icp, (R_icp, _, s_icp) = gradient_icp(
                pc2[None], pc_gt[None], self.estimate_scale, self.ani_scale,
                lr=0.01, n_iter=self.n_iter,
            )
            # normals transform by the inverse-transpose of diag(s) R
            # (row-vector convention): n' = normalize((n / s) @ R)
            R0 = np.asarray(R_icp[0])
            s0 = np.asarray(s_icp[0]).reshape(1, -1)
            norm_icp = (norm2 / np.maximum(s0, EPS)) @ R0
            norm_icp = norm_icp / np.maximum(
                np.linalg.norm(norm_icp, axis=-1, keepdims=True), EPS
            )
            rounds.append((np.asarray(pc_icp[0]), norm_icp, "-ICP"))

        results = []
        for pc, norm, tag in rounds:
            if norm_gt is not None:
                cham, normal = chamfer_distance(
                    pc_gt[None], pc[None], x_normals=norm_gt[None],
                    y_normals=norm[None], return_L1=True,
                    direction_reduction="mean",
                )
                results.append((f"chamfer-L1{tag}", float(cham) * CHAMFER_FACTOR))
                results.append((f"normal-cos{tag}", 1.0 - float(normal)))
            else:
                cham, _ = chamfer_distance(
                    pc_gt[None], pc[None], return_L1=True,
                    direction_reduction="mean",
                )
                results.append((f"chamfer-L1{tag}", float(cham) * CHAMFER_FACTOR))
        return OrderedDict([r for r in results if r[0] in self.names])

    def update(self, verts, faces, labels):
        res = self.evaluate(verts, faces, labels["points"], labels.get("normals"))
        self.metrics.update(res)

    def compute(self):
        return self.metrics.values

    def __repr__(self):
        return repr(self.metrics)


class ProxyEvaluator:
    """Mask IoU evaluator (reference: src/utils/metrics.py:200-228)."""

    default_names = ["mask_iou"]

    def __init__(self, names=None, log_file=None, append=False):
        self.names = names if names is not None else self.default_names
        self.metrics = Metrics(*self.names, log_file=log_file, append=append)

    def evaluate(self, mask_pred, mask_gt):
        inter = (mask_pred * mask_gt).sum()
        union = np.clip(mask_pred + mask_gt, 0, 1).sum()
        return OrderedDict([("mask_iou", float(inter / max(union, EPS)))])

    def update(self, mask_pred, mask_gt):
        for k in range(len(mask_pred)):
            self.metrics.update(self.evaluate(mask_pred[k], mask_gt[k]))

    def compute(self):
        return self.metrics.values
