"""Closed-form trajectory integration for mixture-of-momentum policies.

The heart of ArcFlow: each mixture component is an exponential "momentum"
process ``u_k(sigma) = m_k * exp(rate_k * (sigma_src - sigma))`` whose
displacement over a sigma-interval integrates in closed form — no numerical
ODE error. Behavioral spec from reference
``lakonlab/models/diffusions/arcflow.py:28-110`` (the reference duplicates
this integrator three times across train/pipeline code; here it exists once
as pure jitted functions shared by training and inference).

Conventions: ``sigma_*`` arguments are (B,) float32 noise levels; x moves
from high sigma (noise) to low sigma (data), so ``dt_step = sigma_start -
sigma_end >= 0`` and displacement is *subtracted* from x.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .policies.arcflow import ArcFlowPolicy, _bshape

Array = jax.Array


def _safe_expm1_over_x(x: Array, eps: float) -> Array:
    """expm1(x)/x with a sign-safe clamp |x| >= eps (reference arcflow.py:63-67).

    For |x| -> 0 the true limit is 1; the clamp keeps the division stable
    while the expm1 keeps catastrophic cancellation away for small |x|.
    """
    sign = jnp.where(x >= 0, 1.0, -1.0)
    x_safe = sign * jnp.maximum(jnp.abs(x), eps)
    return jnp.expm1(x_safe) / x_safe


def momentum_integration(policy: ArcFlowPolicy, x_t_start: Array,
                         sigma_t_start: Array, sigma_t_end: Array,
                         eps: float = 1e-4, return_mid: bool = False):
    """Analytically advance x from sigma_t_start to sigma_t_end.

    Per component k the displacement over the step is
        m_k * exp(rate_k * dt_past) * dt_step * expm1(rate_k*dt_step)/(rate_k*dt_step)
    (exact integral of the exponential momentum), mixed by softmax weights.
    Component 0 (rate 0) contributes ``m_0 * dt_step`` exactly.

    Args:
        policy: mixture frozen at (x_src, sigma_src).
        x_t_start: (B, *data) current position (may differ from policy.x_t_src
            during rollouts).
        sigma_t_start / sigma_t_end: (B,) noise levels, start >= end.
        return_mid: also return the step's midpoint state. Mirrors the
            reference pipelines' ``return_mid`` variant
            (arcqwen_pipeline.py:230-235), which — deliberately kept
            bit-compatible here — reuses the FULL-step ``expm1(x)/x`` factor
            at half the step (i.e. x_mid = x_start - displacement/2, a
            half-displacement approximation, not the exact half-step
            integral).

    Returns:
        x_t_end with the same shape/dtype as ``x_t_start`` (float32 math);
        with ``return_mid``, the tuple (x_t_end, x_t_mid).
    """
    ndim = x_t_start.ndim
    sigma_t_start = jnp.asarray(sigma_t_start, jnp.float32).reshape(x_t_start.shape[0])
    sigma_t_end = jnp.asarray(sigma_t_end, jnp.float32).reshape(x_t_start.shape[0])

    dt_past = policy.sigma_t_src - sigma_t_start          # (B,)
    dt_step = sigma_t_start - sigma_t_end                 # (B,) >= 0

    v_at_start = policy.means_u * policy.decay(dt_past)   # (B, K, *data)

    dt_step_k = _bshape(dt_step, ndim)[:, None]           # (B, 1, 1...)
    x_arg = policy.loggammas * dt_step_k                  # learned components only
    step_factor = _safe_expm1_over_x(x_arg, eps)
    step_factor = jnp.concatenate(
        [jnp.ones_like(step_factor[:, :1]), step_factor], axis=1)

    displacement_k = v_at_start * dt_step_k * step_factor
    displacement = (policy.weights() * displacement_k).sum(axis=1)
    x32 = jnp.asarray(x_t_start, jnp.float32)
    x_t_end = (x32 - displacement).astype(x_t_start.dtype)
    if return_mid:
        x_t_mid = (x32 - 0.5 * displacement).astype(x_t_start.dtype)
        return x_t_end, x_t_mid
    return x_t_end


def policy_average_u(policy: ArcFlowPolicy, x_t_start: Array,
                     sigma_t_start: Array, sigma_t_end: Array,
                     raw_t_start: Array, raw_t_end: Array,
                     total_substeps: int, eps: float = 1e-4) -> Array:
    """Student's mean velocity over a rollout span.

    Long spans use the analytic displacement / delta-sigma; spans shorter than
    2 substeps switch to the numerically-stable local velocity, blended
    per-sample (reference ``policy_average_u_momentum``, arcflow.py:81-110).
    Both branches are always computed (XLA-friendly) and selected with where.
    """
    b = x_t_start.shape[0]
    sigma_t_start = jnp.asarray(sigma_t_start, jnp.float32).reshape(b)
    sigma_t_end = jnp.asarray(sigma_t_end, jnp.float32).reshape(b)
    raw_t_start = jnp.asarray(raw_t_start, jnp.float32).reshape(b)
    raw_t_end = jnp.asarray(raw_t_end, jnp.float32).reshape(b)

    is_small = jnp.round((raw_t_start - raw_t_end) * total_substeps) < 2   # (B,)

    x_t_end = momentum_integration(policy, x_t_start, sigma_t_start, sigma_t_end, eps)
    denom = jnp.maximum(sigma_t_start - sigma_t_end, eps)
    mean_u = (x_t_start - x_t_end) / _bshape(denom, x_t_start.ndim)

    local_u = policy.velocity(sigma_t_start)

    return jnp.where(_bshape(is_small, x_t_start.ndim), local_u, mean_u)
