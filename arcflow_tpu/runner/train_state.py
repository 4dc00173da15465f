"""Training state pytree: the single object that flows through the jitted
train step and the checkpointer.

Replaces the reference's mutable module/optimizer/EMA trio (model params in
nn.Modules, torch optimizers, EMA submodules tied via ``tie_untrained_submodules``)
with one immutable pytree:

  * ``trainable``: {submodule_name: param_tree} — what optimizers touch.
  * ``frozen``: {submodule_name: param_tree} — teacher base weights, VAE,
    text encoders. Teacher/student/EMA weight *sharing* is structural here:
    the same array leaves appear in multiple logical roles without copies
    (the reference needed 160 lines of FSDP unshard-hook surgery for this,
    ``parallel/fsdp_wrapper.py:123-163``).
  * ``ema``: {submodule_name: param_tree} — EMA of trainable only
    (reference EMA hook ``trainable_only=True``).
  * ``opt_states``: {submodule_name: optax state}.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


@struct.dataclass
class TrainState:
    step: Array                       # int32 scalar
    trainable: Dict[str, Any]
    frozen: Dict[str, Any]
    ema: Optional[Dict[str, Any]]
    opt_states: Dict[str, Any]
    rng: Array

    @classmethod
    def create(cls, rng: Array, trainable: Dict[str, Any],
               frozen: Optional[Dict[str, Any]] = None,
               optimizers: Optional[Dict[str, Any]] = None,
               ema_keys: tuple = ()) -> 'TrainState':
        opt_states = {}
        if optimizers:
            for k, tx in optimizers.items():
                opt_states[k] = tx.init(trainable[k])
        ema = {k: jax.tree.map(jnp.copy, trainable[k]) for k in ema_keys} or None
        return cls(step=jnp.zeros((), jnp.int32), trainable=trainable,
                   frozen=frozen or {}, ema=ema, opt_states=opt_states, rng=rng)

    def params_for_eval(self, key: str, prefer_ema: bool = True):
        """EMA params if tracked for ``key``, else the live trainable ones."""
        if prefer_ema and self.ema and key in self.ema:
            return self.ema[key]
        return self.trainable[key]


def count_params(tree) -> int:
    return sum(int(jnp.size(x)) for x in jax.tree.leaves(tree))
