"""Rectified-flow (flow-matching) base module.

Equivalent capability to the reference ``GaussianFlow``
(``lakonlab/models/diffusions/gaussian_flow.py:30-270``): linear-interpolation
forward process ``x_t = (1-sigma) x_0 + sigma * eps``, u-prediction training
loss, CFG with optional orthogonal projection and guidance interval, and a
scheduler-driven sampler. Redesigned functionally for XLA:

  * the module holds only *static* config + submodule definitions; every
    method is a pure function taking ``params`` and explicit PRNG keys;
  * the sampling loop is a ``lax.scan`` over a host-computed sigma grid
    (one compiled step body instead of per-step Python stepping);
  * CFG keeps a uniform 2B batch through the scan and masks the guidance
    bias outside the active interval (no dynamic batch sizes under jit).
"""

from __future__ import annotations

import copy
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..registry import MODULES, SCHEDULERS, build_module
from .sampler import ContinuousTimeStepSampler

Array = jax.Array


def apply_guidance(pos: Array, neg: Array, guidance_scale: float,
                   orthogonal: bool = False) -> Array:
    """Classifier-free guidance bias (reference ``guidance_jit``, gaussian_flow.py:18-26)."""
    bias = (pos - neg) * (guidance_scale - 1.0)
    if orthogonal:
        dims = tuple(range(1, pos.ndim))
        num = (bias * pos).mean(axis=dims, keepdims=True)
        den = jnp.maximum((pos * pos).mean(axis=dims, keepdims=True), 1e-6)
        bias = bias - num / den * pos
    return bias


def _bview(a: Array, ndim: int) -> Array:
    return a.reshape(a.shape[0], *((ndim - a.ndim) * [1])) if a.ndim < ndim else a


@MODULES.register_module()
class GaussianFlow:
    """Flow-matching diffusion wrapper around a denoising network definition.

    ``denoising`` is a flax module (or config dict building one) whose apply
    signature is ``apply({'params': params}, x_t, t, **cond)``. Parameters are
    owned by the caller and passed into every method — the module itself is
    immutable/static, so it can be closed over inside jit.
    """

    is_multistep = False

    def __init__(self,
                 denoising=None,
                 flow_loss=None,
                 num_timesteps: int = 1000,
                 timestep_sampler: Optional[dict] = None,
                 flip_model_timesteps: bool = False,
                 denoising_mean_mode: str = 'U',
                 train_cfg: Optional[dict] = None,
                 test_cfg: Optional[dict] = None):
        self.num_timesteps = num_timesteps
        self.denoising = build_module(denoising)
        self.denoising_mean_mode = denoising_mean_mode
        self.flip_model_timesteps = flip_model_timesteps
        self.train_cfg = dict(train_cfg or {})
        self.test_cfg = dict(test_cfg or {})
        if timestep_sampler is None:
            timestep_sampler = dict(type='ContinuousTimeStepSampler', shift=1.0)
        self.timestep_sampler: ContinuousTimeStepSampler = build_module(
            timestep_sampler, default_args=dict(num_timesteps=num_timesteps))
        self.flow_loss = build_module(flow_loss)

    # ---- forward process -------------------------------------------------
    def sample_forward_diffusion(self, x_0: Array, t: Array, noise: Array
                                 ) -> Tuple[Array, Array, Array]:
        """x_t = (1-sigma) x_0 + sigma eps with sigma = t / num_timesteps."""
        std = _bview(jnp.asarray(t, jnp.float32) / self.num_timesteps, x_0.ndim)
        mean = 1.0 - std
        return x_0 * mean + noise * std, mean, std

    def forward_transition(self, x_t_src: Array, sigma_src: Array,
                           sigma_tgt: Array, eps: float = 1e-6):
        """Marginal-preserving transition kernel src->tgt (gaussian_flow.py:57-76)."""
        ndim = x_t_src.ndim
        sigma_src = _bview(jnp.asarray(sigma_src, jnp.float32), ndim)
        sigma_tgt = _bview(jnp.asarray(sigma_tgt, jnp.float32), ndim)
        alpha_src = 1 - sigma_src
        alpha_tgt = 1 - sigma_tgt
        scale = alpha_tgt / jnp.maximum(alpha_src, eps)
        var = jnp.square(sigma_tgt) - jnp.square(scale * sigma_src)
        return dict(mean=x_t_src * scale, var=var), scale

    def sample_forward_transition(self, rng: Array, x_t_src: Array,
                                  sigma_src: Array, sigma_tgt: Array) -> Array:
        trans, _ = self.forward_transition(x_t_src, sigma_src, sigma_tgt)
        noise = jax.random.normal(rng, x_t_src.shape, jnp.float32)
        return trans['mean'] + noise * jnp.sqrt(jnp.maximum(trans['var'], 0.0))

    # ---- denoiser invocation ----------------------------------------------
    def pred(self, params, x_t: Array, t: Array, dropout_rng=None, **kwargs):
        """One denoiser forward. ``t`` is model-time in [0, num_timesteps].

        ``dropout_rng`` (train-time only) activates any dropout in the
        denoiser — LoRA-branch dropout in LoRADense (reference peft
        ``lora_dropout``); without it every forward is deterministic.
        """
        t = jnp.asarray(t, jnp.float32)
        if t.ndim == 0:
            t = jnp.broadcast_to(t, (x_t.shape[0],))
        if self.flip_model_timesteps:
            t = self.num_timesteps - t
        # `params` is either a bare param tree or a full flax variables dict
        # carrying extra collections (e.g. the 'quant' int8 scales from
        # utils/quantize.py); our model param trees never have a top-level
        # 'params' module, so the dispatch is unambiguous
        variables = params if isinstance(params, dict) and 'params' in params \
            else {'params': params}
        rngs = {'dropout': dropout_rng} if dropout_rng is not None else None
        return self.denoising.apply(variables, x_t, t, rngs=rngs, **kwargs)

    # ---- training ----------------------------------------------------------
    def loss(self, denoising_output, x_0: Array, noise: Array, t: Array,
             pred_mask: Optional[Array] = None):
        if self.denoising_mean_mode.upper() != 'U':
            raise AttributeError(
                f'Unknown denoising mean mode [{self.denoising_mean_mode}]')
        if isinstance(denoising_output, dict):
            loss_kwargs = dict(denoising_output)
        else:
            loss_kwargs = dict(u_t_pred=denoising_output)
        loss_kwargs.update(
            u_t=noise - x_0, x_0=x_0, noise=noise, timesteps=t,
            weight=pred_mask.astype(jnp.float32) if pred_mask is not None else None)
        return self.flow_loss(loss_kwargs)

    def _maybe_dropout_rng(self, rng: Array):
        """(rng', dropout_rng or None): split off a LoRA-dropout key only when
        the denoiser configures ``lora_dropout`` — keeps the training RNG
        stream byte-identical for dropout-free models."""
        if getattr(self.denoising, 'lora_dropout', 0.0) > 0.0:
            rng, rng_drop = jax.random.split(rng)
            return rng, rng_drop
        return rng, None

    def forward_train(self, params, rng: Array, x_0: Array, **kwargs
                      ) -> Tuple[Array, Dict[str, Any]]:
        num_batches = x_0.shape[0]
        seq_len = int(np.prod(x_0.shape[1:-1])) if x_0.ndim > 2 else None
        rng, rng_drop = self._maybe_dropout_rng(rng)
        rng_t, rng_noise = jax.random.split(rng)
        t = self.timestep_sampler(rng_t, num_batches, seq_len=seq_len)
        noise = jax.random.normal(rng_noise, x_0.shape, jnp.float32)
        x_t, _, _ = self.sample_forward_diffusion(x_0, t, noise)
        denoising_output = self.pred(params, x_t, t, dropout_rng=rng_drop,
                                     **kwargs)
        loss, log_info = self.loss(denoising_output, x_0, noise, t)
        log_vars = dict(loss_diffusion=loss, **log_info)
        return loss, log_vars

    # ---- teacher-side velocity query (CFG'd) --------------------------------
    def forward_u(self, params, x_t: Array, t: Array, guidance_scale: float = 1.0,
                  test_cfg_override: Optional[dict] = None, **kwargs) -> Array:
        """u at (x_t, t) with optional CFG (reference ``forward_u``, :224-254).

        With guidance, conditioning kwargs must be 2B-batched as
        ``concat([negative, positive])`` along axis 0.
        """
        cfg = copy.deepcopy(self.test_cfg)
        cfg.update(test_cfg_override or {})
        orthogonal = cfg.get('orthogonal_guidance', False)
        interval = cfg.get('guidance_interval', [0, self.num_timesteps])
        use_guidance = guidance_scale > 1.0

        x_in, t_in = x_t, t
        if use_guidance:
            x_in = jnp.concatenate([x_t, x_t], axis=0)
            t_in = jnp.concatenate([t, t], axis=0)
        out = self.pred(params, x_in, t_in, **kwargs)
        if use_guidance:
            neg, pos = jnp.split(out, 2, axis=0)
            bias = apply_guidance(pos, neg, guidance_scale, orthogonal)
            if interval[0] > 0 or interval[1] < self.num_timesteps:
                active = (t >= interval[0]) & (t <= interval[1])
                bias = jnp.where(_bview(active, bias.ndim), bias, 0.0)
            out = pos + bias
        return out

    # ---- sampling ------------------------------------------------------------
    def build_test_scheduler(self, cfg: dict):
        name = cfg.get('sampler', 'FlowEulerODE')
        sched_cls = SCHEDULERS.get(name + 'Scheduler')
        if sched_cls is None:
            raise AttributeError(f'Cannot find sampler [{name}]. '
                                 f'Available: {sorted(SCHEDULERS.keys())}')
        kwargs = dict(cfg.get('sampler_kwargs', {}))
        import dataclasses as _dc
        if _dc.is_dataclass(sched_cls):
            accepts = {f.name for f in _dc.fields(sched_cls)}
        else:
            # builder function (e.g. FlowAdapterScheduler dispatcher): it
            # filters unsupported kwargs itself
            accepts = None
        for key in ('shift', 'use_dynamic_shifting', 'base_seq_len',
                    'max_seq_len', 'base_logshift', 'max_logshift'):
            if (accepts is None or key in accepts) and key not in kwargs:
                kwargs[key] = cfg.get(key, getattr(self.timestep_sampler, key))
        return sched_cls(num_train_timesteps=self.num_timesteps, **kwargs)

    def forward_test(self, params, rng: Array, noise: Array,
                     guidance_scale: float = 1.0,
                     test_cfg_override: Optional[dict] = None, **kwargs) -> Array:
        """Scheduler-driven sampling from pure noise via lax.scan."""
        cfg = copy.deepcopy(self.test_cfg)
        cfg.update(test_cfg_override or {})

        scheduler = self.build_test_scheduler(cfg)
        num_steps = cfg.get('num_timesteps', self.num_timesteps)
        interval = cfg.get('guidance_interval', [0, self.num_timesteps])
        orthogonal = cfg.get('orthogonal_guidance', False)
        use_guidance = guidance_scale > 1.0
        prediction_type = cfg.get('prediction_type', 'u')

        seq_len = int(np.prod(noise.shape[1:-1])) if noise.ndim > 2 else None
        sigmas = jnp.asarray(scheduler.set_timesteps(num_steps, seq_len=seq_len))
        ori_dtype = noise.dtype
        x = jnp.asarray(noise, jnp.float32)
        from ..parallel.mesh import shard_activation
        kwargs = {k: shard_activation(v, 'batch')
                  if isinstance(v, jax.Array) else v
                  for k, v in kwargs.items()}
        num_batches = x.shape[0]
        stateful = getattr(scheduler, 'stateful', False)
        sched_state0 = scheduler.init_state(x) if stateful else 0.0

        def step_body(carry, inp):
            x, rng, sched_state = carry
            sigma, sigma_next = inp
            rng, rng_step = jax.random.split(rng)
            t = jnp.broadcast_to(sigma * self.num_timesteps, (num_batches,))
            x_in, t_in = x, t
            if use_guidance:
                x_in = jnp.concatenate([x, x], axis=0)
                t_in = jnp.concatenate([t, t], axis=0)
            out = self.pred(params, x_in, t_in, **kwargs)
            out = jnp.asarray(out, jnp.float32)
            if use_guidance:
                neg, pos = jnp.split(out, 2, axis=0)
                bias = apply_guidance(pos, neg, guidance_scale, orthogonal)
                active = (t >= interval[0]) & (t <= interval[1])
                out = pos + jnp.where(_bview(active, bias.ndim), bias, 0.0)
            if stateful:
                x, sched_state = scheduler.step_with_state(
                    out, x, sigma, sigma_next, sched_state,
                    prediction_type=prediction_type, rng=rng_step)
            else:
                x = scheduler.step(out, x, sigma, sigma_next,
                                   prediction_type=prediction_type,
                                   rng=rng_step)
            return (x, rng, sched_state), None

        (x, _, _), _ = jax.lax.scan(
            step_body, (x, rng, sched_state0), (sigmas[:-1], sigmas[1:]))
        return x.astype(ori_dtype)

    # ---- dispatch (parity with reference forward()) ----------------------------
    def __call__(self, params, rng=None, x_0=None, return_loss=False,
                 return_u=False, return_denoising_output=False, **kwargs):
        if return_loss:
            return self.forward_train(params, rng, x_0, **kwargs)
        if return_u:
            return self.forward_u(params, **kwargs)
        if return_denoising_output:
            return self.pred(params, **kwargs)
        return self.forward_test(params, rng, **kwargs)
