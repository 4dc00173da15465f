"""Utilities."""

from .env import setup_jax

__all__ = ['setup_jax']
