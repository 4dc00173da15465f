"""ArcFlow few-step flow distillation (mixture-of-momentum student).

Equivalent capability to the reference
``lakonlab/models/diffusions/arcflow.py`` (ArcFlowImitationBase /
ArcFlowImitation / ArcFlowImitationDataFree), rebuilt functionally:

  * the teacher is an opaque ``teacher_fn(x_t, t) -> u`` closure (built by the
    model-composition layer with CFG + params + stop_gradient), so the
    diffusion math never touches parameter plumbing;
  * randomness is explicit PRNG keys; detached rollouts are
    ``jax.lax.stop_gradient`` (the reference used ``torch.no_grad`` +
    ``policy.detach()``);
  * the multi-step (data-free) variant exposes ``forward_initialize`` /
    ``forward_train(step_states)`` exactly like the reference so the trainer
    can sum per-NFE-step losses into one backward
    (reference ``base_diffusion.py:14-62``), with the inter-step state handoff
    detached (``arcflow.py:201-207``).

Behavioral spec mirrored from reference ``arcflow.py:120-209``
(``piid_segment_momentum``): per segment, ``num_intermediate_states`` interior
times are split between a student-rollout portion and a teacher-rollout
portion (scheduled by ``teacher_ratio``; a terminal window of
``window_substeps`` substeps is held out), the frozen teacher's u is queried
at each interior point, and the student's *mean* velocity over the remaining
span is regressed onto it; x rolls forward with the teacher's u.
"""

from __future__ import annotations

import copy
from typing import Any, Callable, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..registry import MODULES
from .gaussian_flow import GaussianFlow
from .integrator import momentum_integration, policy_average_u
from .policies import POLICY_CLASSES, ArcFlowPolicy

Array = jax.Array
TeacherFn = Callable[..., Array]   # (x_t, t) -> u_target


def _seq_len_of(x: Array) -> Optional[int]:
    """Token count for dynamic timestep shifting: product of non-batch,
    non-channel dims (channel-last layout)."""
    return int(np.prod(x.shape[1:-1])) if x.ndim > 2 else None


class ArcFlowImitationBase(GaussianFlow):
    """Shared segment-distillation machinery."""

    def __init__(self, *args, policy_type: str = 'ArcFlow',
                 policy_kwargs: Optional[dict] = None, **kwargs):
        super().__init__(*args, **kwargs)
        assert policy_type in POLICY_CLASSES, \
            f'Invalid policy: {policy_type}. Supported: {list(POLICY_CLASSES)}'
        self.policy_type = policy_type
        self.policy_kwargs = dict(policy_kwargs or {})

    def make_policy(self, denoising_output: dict, x_t_src: Array,
                    sigma_t_src: Array, eps: float = 1e-4) -> ArcFlowPolicy:
        return POLICY_CLASSES[self.policy_type].create(
            denoising_output, x_t_src, sigma_t_src, eps=eps,
            **self.policy_kwargs)

    # ---- segment loss -----------------------------------------------------
    def piid_segment_momentum(
            self, rng: Array, teacher_fn: TeacherFn, policy: ArcFlowPolicy,
            x_t_src: Array, raw_t_src: Array, sigma_t_src: Array,
            teacher_ratio: Union[float, Array], segment_size: Union[float, Array],
            get_x_t_dst: bool = False,
    ) -> Tuple[Array, Dict[str, Array], Optional[Array], Array]:
        """Distillation loss for one NFE segment (reference arcflow.py:120-209).

        Returns (loss, log_info, x_t_dst_or_None, raw_t_dst).
        """
        eps = self.train_cfg.get('eps', 1e-4)
        total_substeps = self.train_cfg.get('total_substeps', 128)
        num_intermediate_states = self.train_cfg.get('num_intermediate_states', 2)
        window_substeps = self.train_cfg.get('window_substeps', 0)
        gm_dropout = self.train_cfg.get('gm_dropout', 0.0)

        bs = x_t_src.shape[0]
        seq_len = _seq_len_of(x_t_src)
        warp = lambda rt: self.timestep_sampler.warp_t(rt, seq_len=seq_len)  # noqa: E731

        segment_size = jnp.broadcast_to(
            jnp.asarray(segment_size, jnp.float32), (bs,))
        teacher_ratio = jnp.asarray(teacher_ratio, jnp.float32)

        # terminal hold-out window ~= window_substeps / total_substeps
        num_substeps = jnp.maximum(
            jnp.round(segment_size * total_substeps), 1.0)
        substep_size = segment_size / num_substeps
        window_size = jnp.minimum(window_substeps * substep_size, segment_size)

        raw_t_dst = raw_t_src - segment_size

        rng_drop, rng_student, rng_teacher = jax.random.split(rng, 3)
        policy_detached = policy.detach()
        if gm_dropout > 0.0:
            policy_detached = policy_detached.dropout(rng_drop, gm_dropout)

        # scheduled trajectory mixing: student-portion and teacher-portion
        # interval draws (reference arcflow.py:146-161)
        assert not self.timestep_sampler.logit_normal_enable
        free_span = segment_size - window_size                       # (B,)
        s_draw = jax.random.uniform(rng_student, (bs, num_intermediate_states))
        s_draw = s_draw * ((1.0 - teacher_ratio) * free_span)[:, None]
        s_sorted = jnp.sort(s_draw, axis=-1)
        student_intervals = jnp.diff(
            s_sorted, axis=-1, prepend=jnp.zeros((bs, 1), jnp.float32))

        t_draw = jax.random.uniform(rng_teacher, (bs, num_intermediate_states - 1))
        t_sorted = jnp.sort(t_draw, axis=-1)
        teacher_intervals = jnp.diff(
            t_sorted, axis=-1,
            prepend=jnp.zeros((bs, 1), jnp.float32),
            append=jnp.ones((bs, 1), jnp.float32))
        teacher_intervals = teacher_intervals * (teacher_ratio * free_span)[:, None]

        x_t = x_t_src
        raw_t = raw_t_src
        sigma_t = jnp.asarray(sigma_t_src, jnp.float32).reshape(bs)

        all_pred_u, all_tgt_u, all_t = [], [], []
        for i in range(num_intermediate_states):
            raw_t_a = jnp.maximum(raw_t - student_intervals[:, i], 0.0)
            raw_t_b = jnp.maximum(raw_t_a - teacher_intervals[:, i], 0.0)
            sigma_t_a = warp(raw_t_a)

            # detached student rollout to the teacher-query point
            x_t_a = jax.lax.stop_gradient(momentum_integration(
                policy_detached, x_t, sigma_t, sigma_t_a, eps=eps))
            t_a = sigma_t_a * self.num_timesteps
            tgt_u = jax.lax.stop_gradient(teacher_fn(x_t_a, t_a))
            all_tgt_u.append(tgt_u)
            all_t.append(t_a)

            # student mean-u over [raw_t_a, raw_t_b - window] (graded)
            raw_t_end = raw_t_b - window_size   # NOTE: not clamped at 0, as in ref
            sigma_t_end = warp(raw_t_end)
            pred_u = policy_average_u(
                policy, x_t_a, sigma_t_a, sigma_t_end, raw_t_a, raw_t_end,
                total_substeps, eps=eps)
            all_pred_u.append(pred_u)

            # roll x forward with the *teacher's* velocity (reference :190)
            sigma_t_b = warp(raw_t_b)
            ds = (sigma_t_b - sigma_t_a).reshape(bs, *((x_t.ndim - 1) * [1]))
            x_t = jax.lax.stop_gradient(x_t_a + tgt_u * ds)
            raw_t = raw_t_b
            sigma_t = sigma_t_b

        loss_kwargs = dict(
            u_t_pred=jnp.concatenate(all_pred_u, axis=0),
            u_t=jnp.concatenate(all_tgt_u, axis=0),
            timesteps=jnp.concatenate(all_t, axis=0))
        loss, log_info = self.flow_loss(loss_kwargs)

        if get_x_t_dst:
            x_t_dst = jax.lax.stop_gradient(momentum_integration(
                policy_detached, x_t, sigma_t, warp(raw_t_dst), eps=eps))
        else:
            x_t_dst = None

        return loss, log_info, x_t_dst, raw_t_dst

    # ---- inference ----------------------------------------------------------
    def forward_test(self, params, rng: Array, noise: Array,
                     test_cfg_override: Optional[dict] = None, **kwargs) -> Array:
        """NFE-step sampling: one DiT call + analytic integration per step
        (reference arcflow.py:211-271), compiled as a single lax.scan body
        regardless of nfe."""
        cfg = copy.deepcopy(self.test_cfg)
        cfg.update(test_cfg_override or {})

        eps = cfg.get('eps', 1e-4)
        nfe = cfg['nfe']
        timestep_ratio = max(cfg.get('timestep_ratio', 1.0), eps)
        temperature = cfg.get('temperature', 1.0)
        base_segment_size = 1.0 / (nfe - 1 + timestep_ratio)

        num_batches = noise.shape[0]
        seq_len = _seq_len_of(noise)
        ori_dtype = noise.dtype
        x = jnp.asarray(noise, jnp.float32)

        # pin conditioning inputs at the program boundary (see
        # parallel/mesh.py 'batch'): keeps GSPMD from back-propagating an
        # interior layout onto the input params under a sharded mesh
        from ..parallel.mesh import shard_activation
        kwargs = {k: shard_activation(v, 'batch')
                  if isinstance(v, jax.Array) else v
                  for k, v in kwargs.items()}

        # host-side raw-time grid (final segment scaled by timestep_ratio)
        # and per-step temperatures (none on the final step)
        raw = [1.0]
        for step_id in range(nfe):
            seg = base_segment_size * (timestep_ratio
                                       if step_id == nfe - 1 else 1.0)
            raw.append(raw[-1] - seg)
        raw = np.asarray(raw, np.float32)
        temps = np.asarray([temperature] * (nfe - 1) + [1.0], np.float32)

        def body(x, inp):
            raw_src, raw_dst, temp = inp
            raw_src_b = jnp.broadcast_to(raw_src, (num_batches,))
            sigma_t_src = self.timestep_sampler.warp_t(raw_src_b,
                                                       seq_len=seq_len)
            t_src = sigma_t_src * self.num_timesteps
            denoising_output = self.pred(params, x, t_src, **kwargs)
            policy = self.make_policy(denoising_output, x, sigma_t_src,
                                      eps=eps)
            # traced per-step temperature (1.0 on the final step)
            policy = policy.replace(
                logweights=policy.logweights / jnp.maximum(temp, eps))
            sigma_t_dst = self.timestep_sampler.warp_t(
                jnp.broadcast_to(raw_dst, (num_batches,)), seq_len=seq_len)
            x = momentum_integration(policy, x, sigma_t_src, sigma_t_dst,
                                     eps=1e-4)
            return x, None

        x, _ = jax.lax.scan(body, x, (jnp.asarray(raw[:-1]),
                                      jnp.asarray(raw[1:]),
                                      jnp.asarray(temps)))
        return x.astype(ori_dtype)


@MODULES.register_module()
class ArcFlowImitation(ArcFlowImitationBase):
    """Data-based single-segment distillation (reference arcflow.py:275-335)."""

    def sample_t(self, rng: Array, num_batches: int, seq_len=None):
        """Sample a random NFE-grid segment and snap raw-t to its source
        (reference ``sample_t``, arcflow.py:277-302)."""
        eps = self.train_cfg.get('eps', 1e-4)
        nfe = self.train_cfg['nfe']
        timestep_ratio = max(self.train_cfg.get('timestep_ratio', 1.0), eps)
        one_minus_final = 1.0 - timestep_ratio
        base_segment = 1.0 / (nfe - one_minus_final)
        final_segment = timestep_ratio * base_segment

        raw_t = jnp.maximum(
            self.timestep_sampler(rng, num_batches, warp_t=False, scale_t=False),
            eps)
        idx = jnp.clip(jnp.ceil(raw_t / base_segment + one_minus_final), 1, nfe)
        raw_t_src = jnp.clip((idx - one_minus_final) * base_segment, eps, 1.0)
        segment_size = jnp.where(idx == 1, final_segment, base_segment)

        sigma_t_src = self.timestep_sampler.warp_t(raw_t_src, seq_len=seq_len)
        t_src = sigma_t_src * self.num_timesteps
        return raw_t_src, sigma_t_src, t_src, segment_size

    def forward_train(self, params, rng: Array, x_0: Array,
                      teacher_fn: TeacherFn = None, running_status=None,
                      **kwargs) -> Tuple[Array, Dict[str, Any]]:
        num_batches = x_0.shape[0]
        seq_len = _seq_len_of(x_0)

        teacher_ratio, log_vars = self._teacher_ratio(running_status)

        rng, rng_drop = self._maybe_dropout_rng(rng)
        rng_t, rng_noise, rng_seg = jax.random.split(rng, 3)
        raw_t_src, sigma_t_src, t_src, segment_size = self.sample_t(
            rng_t, num_batches, seq_len=seq_len)
        noise = jax.random.normal(rng_noise, x_0.shape, jnp.float32)
        x_t_src, _, _ = self.sample_forward_diffusion(x_0, t_src, noise)

        denoising_output = self.pred(params, x_t_src, t_src,
                                     dropout_rng=rng_drop, **kwargs)
        policy = self.make_policy(denoising_output, x_t_src, sigma_t_src)

        loss, log_info, _, _ = self.piid_segment_momentum(
            rng_seg, teacher_fn, policy, x_t_src, raw_t_src, sigma_t_src,
            teacher_ratio, segment_size)

        log_vars.update(log_info)
        log_vars.update(loss_diffusion=loss)
        return loss, log_vars

    def _teacher_ratio(self, running_status):
        """Linear decay of the teacher-rollout share over num_decay_iters."""
        num_decay_iters = self.train_cfg.get('num_decay_iters', 0)
        if num_decay_iters > 0:
            iteration = running_status['iteration']
            ratio = 1.0 - jnp.minimum(
                jnp.asarray(iteration, jnp.float32), num_decay_iters) / num_decay_iters
            return ratio, dict(teacher_ratio=ratio)
        return 0.0, {}


@MODULES.register_module()
class ArcFlowImitationDataFree(ArcFlowImitation):
    """Multi-step data-free distillation — the variant the shipped configs use
    (reference arcflow.py:339-426). Each ``forward_train`` call performs ONE
    NFE step; the trainer loops until ``terminate`` and sums the losses into a
    single backward. ``step_id``/``terminate`` are static Python values so the
    loop unrolls under jit.
    """

    is_multistep = True

    def forward_initialize(self, rng: Array, x_0: Array, running_status=None,
                           **kwargs):
        """Seed step states with pure noise at raw_t = 1 (x_0 is a dummy
        shape/layout donor)."""
        num_batches = x_0.shape[0]
        teacher_ratio, log_vars = self._teacher_ratio(running_status)
        x_t_src = jax.random.normal(rng, x_0.shape, jnp.float32)
        step_states = dict(
            step_id=0,
            terminate=False,
            teacher_ratio=teacher_ratio,
            x_t_src=x_t_src,
            raw_t_src=jnp.ones((num_batches,), jnp.float32))
        return step_states, log_vars

    def forward_train(self, params, rng: Array, x_0=None, step_states=None,
                      teacher_fn: TeacherFn = None, running_status=None,
                      **kwargs):
        assert step_states is not None, \
            'DataFree training needs step_states from forward_initialize'
        step_id = step_states['step_id']
        teacher_ratio = step_states['teacher_ratio']
        x_t_src = step_states['x_t_src']
        raw_t_src = step_states['raw_t_src']

        num_batches = x_t_src.shape[0]
        seq_len = _seq_len_of(x_t_src)

        eps = self.train_cfg.get('eps', 1e-4)
        nfe = self.train_cfg['nfe']
        timestep_ratio = max(self.train_cfg.get('timestep_ratio', 1.0), eps)
        base_segment = 1.0 / (nfe - 1 + timestep_ratio)
        is_final = step_id == nfe - 1
        segment_size = base_segment * (timestep_ratio if is_final else 1.0)

        sigma_t_src = self.timestep_sampler.warp_t(raw_t_src, seq_len=seq_len)
        t_src = sigma_t_src * self.num_timesteps

        rng, rng_drop = self._maybe_dropout_rng(rng)
        denoising_output = self.pred(params, x_t_src, t_src,
                                     dropout_rng=rng_drop, **kwargs)
        policy = self.make_policy(denoising_output, x_t_src, sigma_t_src)

        step_loss, log_info, x_t_dst, raw_t_dst = self.piid_segment_momentum(
            rng, teacher_fn, policy, x_t_src, raw_t_src, sigma_t_src,
            teacher_ratio, segment_size, get_x_t_dst=True)

        # weight each NFE step's loss by its segment size (reference :403)
        loss = step_loss * segment_size

        log_vars = {k: (v * segment_size if k == 'per_sample_loss' else v)
                    for k, v in log_info.items()}
        log_vars.update({
            'loss_diffusion': loss,
            f'loss_diffusion_step{step_id}': step_loss,
        })

        new_states = dict(step_states)
        if step_id < nfe - 1:
            new_states.update(step_id=step_id + 1, x_t_src=x_t_dst,
                              raw_t_src=raw_t_dst)
        else:
            new_states.update(terminate=True)
        return loss, log_vars, new_states


def multistep_train_loss(diffusion, params, rng: Array, x_0: Array,
                         teacher_fn: TeacherFn = None, running_status=None,
                         **kwargs) -> Tuple[Array, Dict[str, Any]]:
    """Sum per-NFE-step losses into a single differentiable scalar.

    Functional equivalent of the reference's multi-step dispatcher
    (``train_fwd_bwd``, base_diffusion.py:14-62): initialize -> loop
    forward_train until terminate -> one loss (one backward under jax.grad).
    Works for single-step modules too (falls back to plain forward_train).
    """
    if not getattr(diffusion, 'is_multistep', False):
        return diffusion.forward_train(
            params, rng, x_0, teacher_fn=teacher_fn,
            running_status=running_status, **kwargs)

    rng_init, rng_steps = jax.random.split(rng)
    step_states, log_vars = diffusion.forward_initialize(
        rng_init, x_0, running_status=running_status, **kwargs)
    total_loss = 0.0
    while not step_states['terminate']:
        rng_steps, rng_i = jax.random.split(rng_steps)
        loss, lv, step_states = diffusion.forward_train(
            params, rng_i, step_states=step_states, teacher_fn=teacher_fn,
            running_status=running_status, **kwargs)
        total_loss = total_loss + loss
        log_vars.update(lv)
    log_vars['loss_diffusion'] = total_loss
    return total_loss, log_vars
