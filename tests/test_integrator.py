"""Analytic momentum integrator vs dense numerical ODE integration.

This is the test the reference never had: the closed-form displacement
(momentum_integration) must match a fine-step Euler integration of the
mixture velocity field to high accuracy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arcflow_tpu.diffusion import (ArcFlowPolicy, momentum_integration,
                                   policy_average_u)


def make_policy(key, b=2, k=4, shape=(8, 8, 3), sigma_src=0.9, eps=1e-4):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    means = jax.random.normal(k1, (b, k) + shape)
    logweights = jax.random.normal(k2, (b, k) + (1,) * (len(shape) - 1) + (1,)) * 0.5
    # rates in roughly [log 0.2, log 4] like the reference head init
    loggammas = jax.random.uniform(k3, (b, k - 1) + (1,) * len(shape),
                                   minval=-1.6, maxval=1.4)
    x_src = jax.random.normal(k4, (b,) + shape)
    sigma = jnp.full((b,), sigma_src)
    return ArcFlowPolicy.create(
        dict(means=means, logweights=logweights, loggammas=loggammas),
        x_src, sigma, eps=eps)


@jax.jit
def euler_reference(policy, x_start, sigma_start, sigma_end):
    """Dense midpoint-rule integration of dx = u(sigma) d(sigma), sigma falling."""
    n_steps = 4096
    b = x_start.shape[0]
    fracs = jnp.linspace(0.0, 1.0, n_steps + 1)

    def body(x, i):
        s = sigma_start + (sigma_end - sigma_start) * fracs[i]
        s_next = sigma_start + (sigma_end - sigma_start) * fracs[i + 1]
        u_mid = policy.velocity(0.5 * (s + s_next))
        ds = (s_next - s).reshape((b,) + (1,) * (x.ndim - 1))
        return x + u_mid * ds, None

    x, _ = jax.lax.scan(body, x_start, jnp.arange(n_steps))
    return x


def test_integrator_matches_dense_ode():
    policy = make_policy(jax.random.PRNGKey(0))
    b = policy.x_t_src.shape[0]
    sigma_start = jnp.full((b,), 0.9)
    sigma_end = jnp.full((b,), 0.4)

    x_end = momentum_integration(policy, policy.x_t_src, sigma_start, sigma_end)
    x_ref = euler_reference(policy, policy.x_t_src, sigma_start, sigma_end)
    np.testing.assert_allclose(np.asarray(x_end), x_ref, rtol=2e-4, atol=2e-4)


def test_integrator_from_mid_rollout_position():
    """Integration from x != x_src and sigma_start != sigma_src (dt_past > 0)."""
    policy = make_policy(jax.random.PRNGKey(1))
    b = policy.x_t_src.shape[0]
    x_mid = policy.x_t_src + 0.3
    sigma_start = jnp.full((b,), 0.6)   # already rolled past sigma_src=0.9
    sigma_end = jnp.full((b,), 0.2)

    x_end = momentum_integration(policy, x_mid, sigma_start, sigma_end)
    x_ref = euler_reference(policy, x_mid, sigma_start, sigma_end)
    np.testing.assert_allclose(np.asarray(x_end), x_ref, rtol=2e-4, atol=2e-4)


def test_zero_step_is_identity():
    policy = make_policy(jax.random.PRNGKey(2))
    b = policy.x_t_src.shape[0]
    s = jnp.full((b,), 0.7)
    x_end = momentum_integration(policy, policy.x_t_src, s, s)
    # eps-clamped expm1(x)/x stays ~1 and dt_step=0 kills the displacement
    np.testing.assert_allclose(np.asarray(x_end), np.asarray(policy.x_t_src),
                               rtol=0, atol=1e-6)


def test_velocity_at_source_is_weighted_mean():
    policy = make_policy(jax.random.PRNGKey(3))
    u = policy.velocity(policy.sigma_t_src)
    expected = (policy.weights() * policy.means_u).sum(axis=1)
    np.testing.assert_allclose(np.asarray(u), np.asarray(expected), rtol=1e-6)


def test_average_u_consistency():
    """mean-u over a long span == displacement / delta-sigma."""
    policy = make_policy(jax.random.PRNGKey(4))
    b = policy.x_t_src.shape[0]
    sigma_start = jnp.full((b,), 0.9)
    sigma_end = jnp.full((b,), 0.5)
    raw_start = jnp.full((b,), 0.9)
    raw_end = jnp.full((b,), 0.5)

    u = policy_average_u(policy, policy.x_t_src, sigma_start, sigma_end,
                         raw_start, raw_end, total_substeps=128)
    x_end = momentum_integration(policy, policy.x_t_src, sigma_start, sigma_end)
    expected = (policy.x_t_src - x_end) / (0.9 - 0.5)
    np.testing.assert_allclose(np.asarray(u), np.asarray(expected), rtol=1e-5,
                               atol=1e-5)


def test_average_u_small_span_uses_local_velocity():
    policy = make_policy(jax.random.PRNGKey(5))
    b = policy.x_t_src.shape[0]
    sigma_start = jnp.full((b,), 0.9)
    sigma_end = jnp.full((b,), 0.9 - 1e-3)
    raw_start = jnp.full((b,), 0.9)
    raw_end = jnp.full((b,), 0.9 - 1e-3)   # < 2/128 substeps -> local branch

    u = policy_average_u(policy, policy.x_t_src, sigma_start, sigma_end,
                         raw_start, raw_end, total_substeps=128)
    expected = policy.velocity(sigma_start)
    np.testing.assert_allclose(np.asarray(u), np.asarray(expected), rtol=1e-6)


def test_detach_stops_gradient():
    policy = make_policy(jax.random.PRNGKey(6), shape=(4, 4, 2))
    b = policy.x_t_src.shape[0]
    s0 = jnp.full((b,), 0.9)
    s1 = jnp.full((b,), 0.4)

    def loss_fn(means, detach):
        p = policy.replace(means_u=means)
        if detach:
            p = p.detach()
        out = momentum_integration(p, p.x_t_src, s0, s1)
        return (out ** 2).sum()

    g = jax.grad(loss_fn)(policy.means_u, False)
    g_detached = jax.grad(loss_fn)(policy.means_u, True)
    assert float(jnp.abs(g).max()) > 0
    assert float(jnp.abs(g_detached).max()) == 0


def test_dropout_never_drops_all():
    policy = make_policy(jax.random.PRNGKey(7))
    p = policy.dropout(jax.random.PRNGKey(8), 0.95)
    finite_per_sample = jnp.isfinite(p.logweights).any(axis=1)
    assert bool(finite_per_sample.all())
    # weights still normalized
    w = p.weights()
    np.testing.assert_allclose(np.asarray(w.sum(axis=1)),
                               np.ones_like(np.asarray(w.sum(axis=1))), rtol=1e-5)


def test_temperature_sharpens_weights():
    policy = make_policy(jax.random.PRNGKey(9))
    hot = policy.temperature(0.5)
    w0 = policy.weights()
    w1 = hot.weights()
    assert float(w1.max()) > float(w0.max())


def test_policy_jits_through_scan():
    """The policy must be a proper pytree usable under jit."""
    policy = make_policy(jax.random.PRNGKey(10), shape=(4, 4, 2))
    b = policy.x_t_src.shape[0]

    @jax.jit
    def rollout(p):
        def body(x, sigmas):
            s0, s1 = sigmas
            return momentum_integration(p, x, jnp.full((b,), s0),
                                        jnp.full((b,), s1)), None
        grid = jnp.array([[0.9, 0.7], [0.7, 0.5], [0.5, 0.2]])
        x, _ = jax.lax.scan(body, p.x_t_src, (grid[:, 0], grid[:, 1]))
        return x

    x = rollout(policy)
    x_direct = momentum_integration(policy, policy.x_t_src,
                                    jnp.full((b,), 0.9), jnp.full((b,), 0.2))
    # multi-step analytic == single-step analytic only for the same policy
    # (the field is a function of sigma alone), so these must agree closely
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_direct), rtol=1e-4,
                               atol=1e-4)


def test_return_mid_half_displacement():
    """return_mid (reference arcqwen_pipeline.py:230-235) reuses the
    full-step factor at half the step: x_mid == x - displacement/2."""
    policy = make_policy(jax.random.PRNGKey(5))
    x = policy.x_t_src
    s0 = policy.sigma_t_src
    s1 = s0 - 0.4
    x_end, x_mid = momentum_integration(policy, x, s0, s1, return_mid=True)
    x_end_only = momentum_integration(policy, x, s0, s1)
    np.testing.assert_allclose(np.asarray(x_end), np.asarray(x_end_only))
    np.testing.assert_allclose(np.asarray(x_mid),
                               np.asarray(x) - 0.5 * (np.asarray(x)
                                                      - np.asarray(x_end)),
                               rtol=1e-6, atol=1e-6)
