"""Optimizer construction: dict-of-optimizers per submodule, paramwise lr
multipliers, and clip/skip gradient hygiene.

Equivalent capability to the reference optimizer builder
(``lakonlab/runner/optimizer/builder.py:11-45``: one optimizer per top-level
submodule, ``paramwise_cfg.custom_keys`` lr_mult) and to the reference's
grad-clip-with-NaN-skip step logic (``lakonlab/models/base.py:76-103``),
redesigned on optax: everything is a pure GradientTransformation; the
skip-on-NaN/skip-ratio decision is a branchless ``jnp.where`` select inside
the jitted train step.

The reference's bitsandbytes ``AdamW8bit`` (memory-efficient optimizer for
DDP configs) maps to ``Adafactor`` here — the TPU-native memory-efficient
choice.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..registry import OPTIMIZERS

Array = jax.Array


# ---- optax factories registered by config name -------------------------------

@OPTIMIZERS.register_module(name='AdamW')
def adamw(lr, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.01, **kw):
    return optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps,
                       weight_decay=weight_decay, **kw)


@OPTIMIZERS.register_module(name='Adam')
def adam(lr, betas=(0.9, 0.999), eps=1e-8, **kw):
    return optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps, **kw)


@OPTIMIZERS.register_module(name='SGD')
def sgd(lr, momentum=0.0, nesterov=False, weight_decay=0.0):
    tx = optax.sgd(lr, momentum=momentum or None, nesterov=nesterov)
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


@OPTIMIZERS.register_module(name='Adafactor')
@OPTIMIZERS.register_module(name='AdamW8bit')   # reference's bnb optimizer slot
def adafactor(lr, weight_decay=0.0, **kw):
    kw.pop('betas', None)
    kw.pop('eps', None)
    return optax.adafactor(learning_rate=lr, weight_decay_rate=weight_decay or None,
                           **kw)


# ---- paramwise lr multipliers --------------------------------------------------

def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, 'key'):
            parts.append(str(p.key))
        elif hasattr(p, 'idx'):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return '.'.join(parts)


def build_single_optimizer(cfg: dict, params: Any) -> optax.GradientTransformation:
    """Build one optimizer from ``dict(type=..., lr=..., paramwise_cfg=...)``.

    ``paramwise_cfg.custom_keys`` maps a path substring to ``dict(lr_mult=m)``
    — matching params get their own instance of the optimizer with lr*m
    (via optax.multi_transform), mirroring the reference's per-key lr_mult
    (used for 0.1x on ``proj_out_loggamma``).
    """
    cfg = dict(cfg)
    paramwise = cfg.pop('paramwise_cfg', None) or {}
    custom_keys: Dict[str, dict] = dict(paramwise.get('custom_keys', {}))
    opt_type = cfg.pop('type')
    factory = OPTIMIZERS.get(opt_type)
    if factory is None:
        raise KeyError(f'unknown optimizer type {opt_type}; '
                       f'available: {sorted(OPTIMIZERS.keys())}')

    if not custom_keys:
        return factory(**cfg)

    keys = sorted(custom_keys)   # deterministic label order

    def label_fn(tree):
        def assign(path, _):
            s = _path_str(path)
            for key in keys:
                if key in s:
                    return key
            return '_default'
        return jax.tree_util.tree_map_with_path(assign, tree)

    transforms = {'_default': factory(**cfg)}
    for key in keys:
        sub_cfg = dict(cfg)
        sub_cfg['lr'] = cfg['lr'] * custom_keys[key].get('lr_mult', 1.0)
        transforms[key] = factory(**sub_cfg)
    return optax.multi_transform(transforms, label_fn)


def build_optimizers(cfg: dict, params_by_module: Dict[str, Any]
                     ) -> Dict[str, optax.GradientTransformation]:
    """Dict-of-optimizers: one per top-level submodule key.

    ``cfg`` is either a single optimizer config (applied to every submodule in
    ``params_by_module``) or ``{submodule_name: optimizer_cfg}``.
    """
    if 'type' in cfg:
        return {k: build_single_optimizer(cfg, v)
                for k, v in params_by_module.items()}
    out = {}
    for k, sub_cfg in cfg.items():
        if k not in params_by_module:
            raise KeyError(f'optimizer config references unknown submodule '
                           f'"{k}"; have {sorted(params_by_module)}')
        out[k] = build_single_optimizer(sub_cfg, params_by_module[k])
    return out


# ---- gradient hygiene: clip + skip ------------------------------------------

@dataclasses.dataclass(frozen=True)
class GradClipConfig:
    """Per-submodule clip policy (reference ``train_cfg`` keys
    ``{k}_grad_clip``, ``{k}_grad_clip_begin_iter``, ``{k}_grad_clip_skip_ratio``)."""
    max_norm: float = 0.0
    begin_iter: int = 0
    skip_ratio: float = 0.0

    @classmethod
    def from_train_cfg(cls, train_cfg: dict, key: str) -> 'GradClipConfig':
        return cls(
            max_norm=train_cfg.get(f'{key}_grad_clip', 0.0),
            begin_iter=train_cfg.get(f'{key}_grad_clip_begin_iter', 0),
            skip_ratio=train_cfg.get(f'{key}_grad_clip_skip_ratio', 0.0))


def global_norm(tree) -> Array:
    return optax.global_norm(tree)


def clip_and_skip(grads, iteration: Array, cfg: GradClipConfig
                  ) -> Tuple[Any, Array, Array]:
    """Clip grads to max_norm (active from begin_iter) and flag skip.

    Returns (clipped_grads, grad_norm, skip_flag). skip is True when the norm
    is non-finite, or exceeds max_norm*skip_ratio (reference base.py:91-95).
    The caller applies the skip as a select on params/opt-state so the whole
    step stays branchless under jit.
    """
    gnorm = global_norm(grads)
    nonfinite = ~jnp.isfinite(gnorm)
    if cfg.max_norm > 0.0:
        active = iteration >= cfg.begin_iter
        scale = jnp.where(
            active, jnp.minimum(1.0, cfg.max_norm / jnp.maximum(gnorm, 1e-12)),
            1.0)
        grads = jax.tree.map(lambda g: g * scale, grads)
        skip = nonfinite
        if cfg.skip_ratio > 0.0:
            skip = skip | (active & (gnorm > cfg.max_norm * cfg.skip_ratio))
    else:
        skip = nonfinite
    # replace non-finite grads so the optimizer state never ingests NaNs even
    # on skipped steps
    grads = jax.tree.map(lambda g: jnp.where(jnp.isfinite(g), g, 0.0), grads)
    return grads, gnorm, skip


def select_tree(flag: Array, on_true, on_false):
    """Branchless pytree select: flag ? on_true : on_false (leafwise where)."""
    return jax.tree.map(
        lambda a, b: jnp.where(flag, a, b) if a.dtype != jnp.bool_
        else jnp.where(flag, a, b), on_true, on_false)
