"""Exponential moving average of trainable params, executed inside the jitted
train step.

Equivalent capability to the reference EMA hook
(``lakonlab/runner/hooks/ema_hook.py:31-133``): lerp interpolation, fixed or
Karras momentum ``beta = min((1 - 1/t)^{gamma+1}, max)`` with
``t = iter + 1 - start_iter`` (``ema_hook.py:86-89``), copy-through before
``start_iter``. Running it in-step (instead of a post-iter hook walking
module parameters) keeps params on device and fuses the lerp into the update
program — the natural TPU design.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class EmaConfig:
    enabled: bool = True
    interp_mode: str = 'lerp'
    momentum: float = 0.999          # used by 'fixed' policy
    momentum_policy: str = 'karras'  # 'fixed' | 'karras'
    gamma: float = 7.0               # karras exponent
    max_momentum: float = 1.0
    start_iter: int = 0
    interval: int = 1

    @classmethod
    def from_hook_cfg(cls, hook_cfg: dict) -> 'EmaConfig':
        """Translate a reference-style ExponentialMovingAverageHookMod config."""
        m_cfg = hook_cfg.get('momentum_cfg', {}) or {}
        i_cfg = hook_cfg.get('interp_cfg', {}) or {}
        return cls(
            interp_mode=hook_cfg.get('interp_mode', 'lerp'),
            momentum=i_cfg.get('momentum', 0.999),
            momentum_policy=hook_cfg.get('momentum_policy', 'fixed'),
            gamma=m_cfg.get('gamma', 7.0),
            max_momentum=m_cfg.get('max_momentum', 1.0),
            start_iter=hook_cfg.get('start_iter', 0),
            interval=hook_cfg.get('interval', 1))


def ema_momentum(cfg: EmaConfig, iteration: Array) -> Array:
    """Momentum beta at this iteration (traced-friendly)."""
    if cfg.momentum_policy == 'fixed':
        return jnp.asarray(cfg.momentum, jnp.float32)
    if cfg.momentum_policy == 'karras':
        t = jnp.maximum(iteration + 1 - cfg.start_iter, 1).astype(jnp.float32)
        return jnp.minimum((1.0 - 1.0 / t) ** (cfg.gamma + 1.0), cfg.max_momentum)
    raise ValueError(f'unknown momentum_policy {cfg.momentum_policy}')


def ema_update(cfg: EmaConfig, ema_params: Any, new_params: Any,
               iteration: Array) -> Any:
    """One EMA step: copy-through before start_iter, lerp after.

    interval > 1 gates the update on iteration % interval == 0 (branchless).
    """
    if not cfg.enabled:
        return ema_params
    beta = ema_momentum(cfg, iteration)
    copy_through = iteration < cfg.start_iter
    do_update = (iteration % cfg.interval) == 0 if cfg.interval > 1 else True

    def leaf(e, p):
        lerped = e * beta + p.astype(e.dtype) * (1.0 - beta)
        out = jnp.where(copy_through, p.astype(e.dtype), lerped)
        if cfg.interval > 1:
            out = jnp.where(do_update, out, e)
        return out

    return jax.tree.map(leaf, ema_params, new_params)
