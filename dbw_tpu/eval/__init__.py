"""Evaluation: image metrics, mesh metrics, official DTU protocol."""

from .metrics import AverageMeter, Metrics, MeshEvaluator, ProxyEvaluator
