"""Datasets and host-side data pipeline."""

from .checkerboard import CheckerboardData
from .builder import build_dataset, build_dataloader, collate

__all__ = ['CheckerboardData', 'build_dataset', 'build_dataloader', 'collate']
