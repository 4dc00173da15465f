"""Jitted train-step builder: grad accumulation -> per-submodule clip/skip ->
optimizer update -> in-step EMA.

Functional equivalent of the reference's training mechanics
(``lakonlab/models/base.py:162-189`` train_step with grad-accum chunking,
``base.py:76-103`` step_optimizer with clip/begin-iter/NaN-skip), compiled to
a single XLA program per step:

  * gradient accumulation is a ``lax.scan`` over batch chunks (the reference
    loops Python-side with ``.backward()`` per chunk);
  * the NaN/skip-ratio step skip is a branchless pytree select (no host sync);
  * EMA (karras momentum) runs in the same program (see ema.py).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from .ema import EmaConfig, ema_update
from .optim import GradClipConfig, clip_and_skip, select_tree
from .train_state import TrainState

Array = jax.Array
LossFn = Callable[..., Tuple[Array, Dict[str, Any]]]


def _chunk_batch(batch, steps: int):
    """Reshape every leaf (B, ...) -> (steps, B//steps, ...)."""
    def leaf(x):
        b = x.shape[0]
        assert b % steps == 0, \
            f'batch size {b} not divisible by grad_accum steps {steps}'
        return x.reshape(steps, b // steps, *x.shape[1:])
    return jax.tree.map(leaf, batch)


def _merge_scanned_logs(logs, steps: int):
    """Scalars stacked over accum steps -> mean; per-sample arrays -> flatten."""
    def leaf(x):
        if x.ndim <= 1:       # scalar per step -> (steps,)
            return x.mean()
        return x.reshape(-1, *x.shape[2:])
    return jax.tree.map(leaf, logs)


def build_train_step(model, optimizers: Dict[str, Any],
                     train_cfg: Optional[dict] = None,
                     ema_cfg: Optional[EmaConfig] = None,
                     grad_accum_steps: int = 1,
                     donate: bool = True,
                     offload_shardings=None):
    """Compile model.loss + optimizers + EMA into one step function.

    ``model`` must expose ``loss(trainable, frozen, rng, batch,
    running_status) -> (loss, log_vars)``. Returns
    ``train_step(state, batch) -> (state, log_vars)``.

    ``offload_shardings=(device_sharding, host_sharding)`` keeps the COLD
    per-step state — optimizer slots and the EMA copy — resident in host
    memory (``memory_kind='pinned_host'``): the step pulls them on-device
    right where they are consumed and pushes the updated values back, so
    their bytes leave the HBM argument accounting (the binding term for
    the single-chip training ceiling is arguments + temps with no overlap,
    CLAUDE.md). The caller places ``state.opt_states``/``state.ema`` on
    ``host_sharding`` before the first call; donation then aliases host
    buffers to host outputs. No reference counterpart (the reference's
    analogue is bitsandbytes 8-bit slots + `enable_model_cpu_offload`)."""
    train_cfg = dict(train_cfg or {})
    clip_cfgs = {k: GradClipConfig.from_train_cfg(train_cfg, k)
                 for k in optimizers}
    ema_cfg = ema_cfg or EmaConfig(enabled=False)
    dev_s = host_s = None
    if offload_shardings is not None:
        dev_s, host_s = offload_shardings

    def _put(tree, s):
        return jax.tree.map(lambda x: jax.device_put(x, s), tree)

    def step_fn(state: TrainState, batch) -> Tuple[TrainState, Dict[str, Any]]:
        iteration = state.step
        rng_next, rng_step = jax.random.split(state.rng)
        running_status = dict(iteration=iteration)

        def loss_fn(trainable, rng, chunk):
            loss, log_vars = model.loss(trainable, state.frozen, rng, chunk,
                                        running_status=running_status)
            return loss, log_vars

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        if grad_accum_steps > 1:
            chunks = _chunk_batch(batch, grad_accum_steps)
            zero_grads = jax.tree.map(jnp.zeros_like, state.trainable)

            def scan_body(carry, inp):
                acc, rng = carry
                rng, rng_i = jax.random.split(rng)
                (loss, log_vars), grads = grad_fn(state.trainable, rng_i, inp)
                acc = jax.tree.map(jnp.add, acc, grads)
                return (acc, rng), dict(loss=loss, **log_vars)

            (grads, _), logs = jax.lax.scan(
                scan_body, (zero_grads, rng_step), chunks)
            grads = jax.tree.map(lambda g: g / grad_accum_steps, grads)
            log_vars = _merge_scanned_logs(logs, grad_accum_steps)
        else:
            (loss, log_vars), grads = grad_fn(state.trainable, rng_step, batch)
            log_vars = dict(loss=loss, **log_vars)

        # cold state on-device only for the update itself (host offload)
        opt_in = _put(state.opt_states, dev_s) if dev_s is not None \
            else state.opt_states
        new_trainable = dict(state.trainable)
        new_opt_states = dict(opt_in)
        for k, tx in optimizers.items():
            g_k, gnorm, skip = clip_and_skip(grads[k], iteration, clip_cfgs[k])
            updates, opt_state_k = tx.update(
                g_k, opt_in[k], state.trainable[k])
            params_k = optax.apply_updates(state.trainable[k], updates)
            # branchless step-skip on NaN / skip-ratio blowup
            new_trainable[k] = select_tree(skip, state.trainable[k], params_k)
            new_opt_states[k] = select_tree(skip, opt_in[k], opt_state_k)
            log_vars[f'{k}_grad_norm'] = jnp.where(skip, jnp.nan, gnorm)
            log_vars[f'{k}_skipped'] = skip.astype(jnp.float32)

        new_ema = state.ema
        if state.ema is not None and ema_cfg.enabled:
            ema_in = _put(state.ema, dev_s) if dev_s is not None else state.ema
            new_ema = {k: ema_update(ema_cfg, ema_in[k], new_trainable[k],
                                     iteration)
                       for k in state.ema}
        if host_s is not None:
            new_opt_states = _put(new_opt_states, host_s)
            if new_ema is not None:
                new_ema = _put(new_ema, host_s)

        new_state = state.replace(
            step=iteration + 1, trainable=new_trainable, ema=new_ema,
            opt_states=new_opt_states, rng=rng_next)
        return new_state, log_vars

    if donate:
        return jax.jit(step_fn, donate_argnums=(0,))
    return jax.jit(step_fn)
