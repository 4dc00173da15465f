"""Async sharded checkpointing + resume, built on Orbax.

Equivalent capability to the reference checkpoint subsystem
(``lakonlab/runner/checkpoint.py`` + ``runner/hooks/checkpoint.py``): periodic
async saves off the training thread, ``max_keep_ckpts`` pruning with
``must_save_interval`` keep-forever marks, latest-pointer resume, fp16/bf16
state downcasts, and trainable-only (adapter-sized) checkpoints. Orbax
provides the async write thread, atomicity, and sharded-array layout that the
reference hand-rolled with daemon threads + rank-0 gathering.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from .train_state import TrainState


def _downcast(tree, dtype):
    def leaf(x):
        if hasattr(x, 'dtype') and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree.map(leaf, tree)


def load_raw_checkpoint(directory: str, step: Optional[int] = None) -> dict:
    """Restore a checkpoint tree as raw host arrays (no template needed).

    Used to graft pretrained weights into a new job, e.g. loading a trained
    flow teacher into a distillation run (the reference's ``load_from`` /
    ``pretrained=`` checkpoint paths).
    """
    directory = os.path.abspath(directory)
    mgr = ocp.CheckpointManager(
        directory, options=ocp.CheckpointManagerOptions(read_only=True))
    step = step if step is not None else mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f'no checkpoint under {directory}')
    restored = mgr.restore(step)
    mgr.close()
    return restored


class CheckpointManager:
    """Train-state checkpoint manager with the reference's policy knobs.

    Args:
        directory: checkpoint root (one subdir per step).
        interval: save every N iters (reference CheckpointHook.interval).
        must_save_interval: steps at multiples of this are kept forever
            (reference ``must_save_interval``, hooks/checkpoint.py:48-69).
        max_keep_ckpts: sliding window of non-permanent checkpoints.
        ckpt_trainable_only: drop ``frozen`` from the saved tree — the
            adapter-sized checkpoint (reference ``ckpt_trainable_only``).
        ckpt_fp16 / ckpt_bf16_optim: float downcasts for params / optimizer
            state (reference ``ckpt_fp16`` / ``bf16_optim``).
    """

    def __init__(self, directory: str, interval: int = 1000,
                 must_save_interval: Optional[int] = None,
                 max_keep_ckpts: Optional[int] = None,
                 ckpt_trainable_only: bool = True,
                 ckpt_fp16: bool = False,
                 ckpt_bf16_optim: bool = False,
                 async_save: bool = True):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.interval = interval
        self.ckpt_trainable_only = ckpt_trainable_only
        self.ckpt_fp16 = ckpt_fp16
        self.ckpt_bf16_optim = ckpt_bf16_optim

        should_keep_fn = None
        if must_save_interval:
            must = int(must_save_interval)
            should_keep_fn = lambda step: step % must == 0  # noqa: E731
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_keep_ckpts,
                should_keep_fn=should_keep_fn,
                enable_async_checkpointing=async_save,
                create=True))

    # ---- save -----------------------------------------------------------
    def _to_saveable(self, state: TrainState) -> dict:
        tree = dict(
            step=state.step,
            trainable=state.trainable,
            ema=state.ema,
            opt_states=state.opt_states,
            rng=state.rng)
        if not self.ckpt_trainable_only:
            tree['frozen'] = state.frozen
        if self.ckpt_fp16:
            tree['trainable'] = _downcast(tree['trainable'], jnp.float16)
            tree['ema'] = _downcast(tree['ema'], jnp.float16)
        if self.ckpt_bf16_optim:
            tree['opt_states'] = _downcast(tree['opt_states'], jnp.bfloat16)
        return tree

    def save(self, state: TrainState, force: bool = False) -> bool:
        step = int(state.step)
        if not force and (self.interval <= 0 or step % self.interval != 0):
            return False
        self._mgr.save(step, args=ocp.args.StandardSave(self._to_saveable(state)))
        return True

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()

    # ---- resume ----------------------------------------------------------
    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state: TrainState, step: Optional[int] = None
                ) -> TrainState:
        """Restore into the structure of ``state`` (frozen params are kept
        from the live state when the checkpoint is trainable-only)."""
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f'no checkpoint under {self.directory}')
        template = self._to_saveable(state)
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))
        new = state.replace(
            step=restored['step'],
            trainable=jax.tree.map(
                lambda ref, x: x.astype(ref.dtype),
                state.trainable, restored['trainable']),
            ema=(jax.tree.map(lambda ref, x: x.astype(ref.dtype),
                              state.ema, restored['ema'])
                 if state.ema is not None else None),
            opt_states=jax.tree.map(
                lambda ref, x: x.astype(ref.dtype) if hasattr(x, 'astype') else x,
                state.opt_states, restored['opt_states']),
            rng=restored['rng'])
        if not self.ckpt_trainable_only and 'frozen' in restored:
            new = new.replace(frozen=restored['frozen'])
        return new
