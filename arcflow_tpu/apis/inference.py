"""Config-driven model initialization for evaluation/inference.

Equivalent capability to the reference ``lakonlab/apis/inference.py``
(``init_model(config, checkpoint, ema_only, ...)``): build the model from a
config, restore a training checkpoint (EMA by default), and return a ready
evaluation handle.
"""

from __future__ import annotations

from typing import Optional, Union

import jax

from ..config import Config
from ..registry import MODELS
from ..runner import TrainState
from .train import build_model_from_cfg


def init_model(config: Union[str, Config],
               checkpoint: Optional[str] = None,
               step: Optional[int] = None,
               ema_only: bool = True,
               seed: int = 0):
    """Returns (model, state) ready for ``model.val_step``.

    ``ema_only=True`` keeps only the EMA weights as the evaluation params
    (the reference deletes the non-EMA submodule; here the EMA tree simply
    becomes the trainable slot and the EMA slot is dropped).
    """
    if isinstance(config, str):
        config = Config.fromfile(config)
    model = build_model_from_cfg(config)

    rng = jax.random.PRNGKey(seed)
    trainable, frozen = model.init_params(rng)
    state = TrainState.create(rng, trainable, frozen,
                              ema_keys=model.ema_keys)

    if checkpoint is not None:
        from ..runner.checkpoint import load_raw_checkpoint
        raw = load_raw_checkpoint(checkpoint, step=step)
        src = raw.get('ema') if (ema_only and raw.get('ema')) \
            else raw['trainable']
        trainable = jax.tree.map(
            lambda ref, x: jax.numpy.asarray(x, ref.dtype), trainable, src)
        ema = None if ema_only else state.ema
        state = state.replace(trainable=trainable, ema=ema,
                              step=jax.numpy.asarray(raw.get('step', 0)))
    return model, state
