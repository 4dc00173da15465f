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


def resolve_checkpoint_dir(uri: str):
    """URI scheme -> (local working dir, remote uri or None).

    Mirrors the reference's pluggable checkpoint path schemes
    (runner/checkpoint.py:144-278):
      * plain path — local Orbax directory;
      * ``tmp:name`` — staged under the system temp dir (/dev/shm when
        available, like the reference's tmp scheme);
      * ``s3://...`` (or any registered remote scheme) — Orbax writes a
        local staging copy which is mirrored to the remote after each save
        and pulled back on resume.
    """
    import hashlib
    import tempfile
    if uri.startswith('tmp:'):
        root = '/dev/shm' if os.path.isdir('/dev/shm') \
            else tempfile.gettempdir()
        return os.path.join(root, 'arcflow_ckpt', uri[len('tmp:'):]), None
    from ..utils.io_utils import uri_scheme
    if uri_scheme(uri) != 'local':
        root = '/dev/shm' if os.path.isdir('/dev/shm') \
            else tempfile.gettempdir()
        tag = hashlib.md5(uri.encode()).hexdigest()[:10]
        return os.path.join(root, f'arcflow_ckpt_{tag}'), uri.rstrip('/')
    return uri, None


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
    mgr.close()
    if step is None:
        raise FileNotFoundError(f'no checkpoint under {directory}')
    # Restore as host numpy arrays: the checkpoint's recorded device
    # topology (e.g. a CPU-mesh training run) need not exist in this
    # process (e.g. a TPU export job).
    path = os.path.join(directory, str(step), 'default')
    ckptr = ocp.PyTreeCheckpointer()
    meta = ckptr.metadata(path).item_metadata
    restore_args = jax.tree.map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray),
        getattr(meta, 'tree', meta))
    return ckptr.restore(
        path, args=ocp.args.PyTreeRestore(restore_args=restore_args))


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
                 ckpt_fp16_ema: bool = False,
                 ckpt_bf16_optim: bool = False,
                 async_save: bool = True):
        local_dir, self.remote_uri = resolve_checkpoint_dir(directory)
        self.directory = os.path.abspath(local_dir)
        os.makedirs(self.directory, exist_ok=True)
        self.interval = interval
        self.ckpt_trainable_only = ckpt_trainable_only
        self.ckpt_fp16 = ckpt_fp16
        self.ckpt_fp16_ema = ckpt_fp16_ema
        self.ckpt_bf16_optim = ckpt_bf16_optim
        if self.remote_uri is not None:
            self._pull_latest_from_remote()

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

    # ---- remote mirroring (s3:// etc.) ----------------------------------
    def _backend(self):
        from ..utils.io_utils import get_file_backend
        return get_file_backend(self.remote_uri)

    def _push_step_to_remote(self, step: int):
        """Mirror one completed step dir to the remote + update latest.txt
        (the reference writes latest.txt on S3, checkpoint.py:436-488)."""
        be = self._backend()
        step_dir = os.path.join(self.directory, str(step))
        manifest = []
        for root, _, files in os.walk(step_dir):
            for f in files:
                full = os.path.join(root, f)
                rel = os.path.relpath(full, step_dir)
                manifest.append(rel)
                with open(full, 'rb') as fh:
                    be.put(fh.read(), be.join_path(self.remote_uri,
                                                   str(step), rel))
        be.put('\n'.join(manifest).encode(),
               be.join_path(self.remote_uri, f'manifest-{step}.txt'))
        be.put(str(step).encode(),
               be.join_path(self.remote_uri, 'latest.txt'))

    def _pull_latest_from_remote(self):
        be = self._backend()
        latest_uri = be.join_path(self.remote_uri, 'latest.txt')
        if not be.exists(latest_uri):
            return
        step = int(be.get(latest_uri).decode().strip())
        if os.path.isdir(os.path.join(self.directory, str(step))):
            return   # staging copy already present
        manifest = be.get(be.join_path(
            self.remote_uri, f'manifest-{step}.txt')).decode().splitlines()
        for rel in manifest:
            data = be.get(be.join_path(self.remote_uri, str(step), rel))
            dst = os.path.join(self.directory, str(step), rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            with open(dst, 'wb') as fh:
                fh.write(data)

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
        if self.ckpt_fp16 or self.ckpt_fp16_ema:
            # fp16_ema downcasts the EMA copy independently of the raw
            # params (reference get_checkpoint, checkpoint.py:491-534)
            tree['ema'] = _downcast(tree['ema'], jnp.float16)
        if self.ckpt_bf16_optim:
            tree['opt_states'] = _downcast(tree['opt_states'], jnp.bfloat16)
        return tree

    def save(self, state: TrainState, force: bool = False) -> bool:
        step = int(state.step)
        if not force and (self.interval <= 0 or step % self.interval != 0):
            return False
        self._mgr.save(step, args=ocp.args.StandardSave(self._to_saveable(state)))
        if self.remote_uri is not None:
            # mirror after the async write completes; remote durability is
            # the point of a remote uri, so the push is synchronous
            self._mgr.wait_until_finished()
            self._push_step_to_remote(step)
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

        def cast_like(ref, x):
            # re-up-cast only float leaves downcast at save time; integer
            # leaves (optimizer counts) pass through untouched
            if (hasattr(x, 'astype') and hasattr(ref, 'dtype')
                    and jnp.issubdtype(ref.dtype, jnp.floating)
                    and jnp.issubdtype(np.asarray(x).dtype, jnp.floating)):
                return x.astype(ref.dtype)
            return x

        new = state.replace(
            step=restored['step'],
            trainable=jax.tree.map(cast_like, state.trainable,
                                   restored['trainable']),
            ema=(jax.tree.map(cast_like, state.ema, restored['ema'])
                 if state.ema is not None else None),
            opt_states=jax.tree.map(cast_like, state.opt_states,
                                    restored['opt_states']),
            rng=restored['rng'])
        if not self.ckpt_trainable_only and 'frozen' in restored:
            new = new.replace(frozen=restored['frozen'])
        return new
