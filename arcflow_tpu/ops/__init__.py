"""Numerical ops: GM math library + Pallas TPU kernels."""

from . import gm

__all__ = ['gm']
