"""GMFlow: transition math, probabilistic CFG, posterior fusion, training +
GM-ODE sampling on a Gaussian toy target."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from arcflow_tpu.diffusion import (GMFlow, gmflow_posterior_mean,
                                   probabilistic_guidance)
from arcflow_tpu.models import ToyGMFlowDenoiser

MU = np.array([1.0, -0.5], np.float32)
DATA_STD = 0.3


def make_gmflow(k=4, spectrum=False):
    den = ToyGMFlowDenoiser(out_channels=2, num_gaussians=k, hidden=(64, 64))
    return GMFlow(
        denoising=den,
        flow_loss=dict(type='GMFlowNLLLoss',
                       data_info=dict(pred_means='means', target='x_t_low',
                                      pred_logstds='logstds',
                                      pred_logweights='logweights')),
        num_timesteps=1000,
        train_cfg=dict(trans_ratio=1.0),
        test_cfg=dict(sampler='FlowEulerODE', num_timesteps=16,
                      output_mode='mean'))


def init_params(d):
    return d.denoising.init(jax.random.PRNGKey(0), jnp.zeros((2, 1, 1, 2)),
                            jnp.zeros((2,)))['params']


def test_u_to_x0_roundtrip():
    d = make_gmflow()
    x_t = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 1, 2))
    gm_u = dict(means=jax.random.normal(jax.random.PRNGKey(2), (2, 3, 1, 1, 2)),
                logstds=jnp.full((2, 1, 1, 1, 1), -1.0),
                logweights=jax.nn.log_softmax(jnp.zeros((2, 3, 1, 1, 1)), 1))
    t = jnp.full((2,), 400.0)
    gm_x0 = d.u_to_x_0(gm_u, x_t, t)
    sigma = 0.4
    np.testing.assert_allclose(
        np.asarray(gm_x0['means']),
        np.asarray(x_t[:, None] - sigma * gm_u['means']), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(gm_x0['logstds'] - gm_u['logstds']), np.log(sigma),
        rtol=1e-5)


def test_reverse_transition_terminal_is_x0():
    """At sigma_low=0 the reverse transition collapses onto the x0 estimate."""
    d = make_gmflow()
    x_t = jax.random.normal(jax.random.PRNGKey(3), (2, 1, 1, 2))
    u = jax.random.normal(jax.random.PRNGKey(4), (2, 1, 1, 2))
    x_low = d.reverse_transition(u, x_t, jnp.zeros((2,)), jnp.full((2,), 0.5),
                                 rng=jax.random.PRNGKey(5))
    np.testing.assert_allclose(np.asarray(x_low), np.asarray(x_t - 0.5 * u),
                               atol=1e-5)


def test_reverse_transition_gm_matches_sample_mode_mean():
    d = make_gmflow()
    b = 512
    x_t = jax.random.normal(jax.random.PRNGKey(6), (b, 1, 1, 2))
    u = jax.random.normal(jax.random.PRNGKey(7), (b, 1, 1, 2))
    gm_u = dict(means=u[:, None], logstds=jnp.full((b, 1, 1, 1, 1), -20.0),
                logweights=jnp.zeros((b, 1, 1, 1, 1)))
    s_lo, s_hi = jnp.full((b,), 0.3), jnp.full((b,), 0.7)
    gm_low = d.reverse_transition(gm_u, x_t, s_lo, s_hi)
    from arcflow_tpu.ops.gm import gm_to_mean
    mean_gm = np.asarray(gm_to_mean(gm_low))
    # analytic bridge mean: c1 x_high + c2 x0
    sig, sig_to = 0.7, 0.3
    alpha, alpha_to = 1 - sig, 1 - sig_to
    beta_over_sigma_sq = 1 - (sig_to / sig * alpha / alpha_to) ** 2
    c1 = (sig_to / sig) ** 2 * (alpha / alpha_to)
    c2 = beta_over_sigma_sq * alpha_to
    x0 = np.asarray(x_t - sig * u)
    expected = c1 * np.asarray(x_t) + c2 * x0
    np.testing.assert_allclose(mean_gm, expected, rtol=1e-4, atol=1e-5)
    # sample-mode (point-mass GM) must have matching mean and the analytic
    # bridge std
    draws = np.stack([np.asarray(d.reverse_transition(
        u, x_t, s_lo, s_hi, rng=jax.random.PRNGKey(100 + i)))
        for i in range(64)])
    c3 = np.sqrt(beta_over_sigma_sq) * sig_to
    np.testing.assert_allclose(draws.std(0).mean(), c3, rtol=0.1)
    np.testing.assert_allclose(draws.mean(0), expected, atol=5 * c3 / 8)


def test_probabilistic_guidance_properties():
    cond = jax.random.normal(jax.random.PRNGKey(8), (4, 1, 1, 2))
    uncond = jax.random.normal(jax.random.PRNGKey(9), (4, 1, 1, 2))
    var = jnp.full((4, 1, 1, 1), 0.25)
    out, bias, avg_var = probabilistic_guidance(cond, var, uncond, 0.5,
                                                orthogonal=0.0)
    # bias normalized to guidance_scale * sqrt(avg_var)
    bias_power = np.asarray(jnp.square(bias).mean(axis=(1, 2, 3)))
    np.testing.assert_allclose(bias_power, 0.25 * 0.25, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out['var']), 0.25 * (1 - 0.25),
                               rtol=1e-5)


def test_posterior_mean_interpolates():
    """With an (almost) point-mass GM at x0, the posterior mean is x0."""
    b = 2
    x0 = jax.random.normal(jax.random.PRNGKey(10), (b, 1, 1, 2))
    gm = dict(means=x0[:, None], logstds=jnp.full((b, 1, 1, 1, 1), -8.0),
              logweights=jnp.zeros((b, 1, 1, 1, 1)))
    x_src = jax.random.normal(jax.random.PRNGKey(11), (b, 1, 1, 2))
    x_t = 0.5 * (x_src + x0)
    m = gmflow_posterior_mean(gm, x_t, x_src, jnp.full((b,), 0.4),
                              jnp.full((b,), 0.8))
    np.testing.assert_allclose(np.asarray(m), np.asarray(x0), atol=1e-3)


@pytest.mark.slow
def test_gmflow_trains_and_samples_gaussian():
    d = make_gmflow(k=4)
    params = init_params(d)
    opt = optax.adam(2e-3)
    opt_state = opt.init(params)
    data_rng = np.random.default_rng(0)

    @jax.jit
    def step(params, opt_state, rng, x0):
        (loss, lv), g = jax.value_and_grad(
            lambda p: d.forward_train(p, rng, x0), has_aux=True)(params)
        u, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, u), opt_state, loss

    rng = jax.random.PRNGKey(12)
    losses = []
    for i in range(400):
        x0 = jnp.asarray(
            data_rng.normal(MU, DATA_STD, (256, 2)).astype(np.float32)
        ).reshape(256, 1, 1, 2)
        rng, ri = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, ri, x0)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-50:]) < np.mean(losses[:50])

    noise = jax.random.normal(jax.random.PRNGKey(13), (1024, 1, 1, 2))
    samples = d.forward_test(params, jax.random.PRNGKey(14), noise)
    s = np.asarray(samples).reshape(-1, 2)
    np.testing.assert_allclose(s.mean(0), MU, atol=0.15)
    np.testing.assert_allclose(s.std(0), DATA_STD, atol=0.15)

    # order-2 + substeps path also runs and stays sane
    samples2 = d.forward_test(
        params, jax.random.PRNGKey(15), noise[:64],
        test_cfg_override=dict(num_timesteps=8, num_substeps=2, order=2))
    s2 = np.asarray(samples2).reshape(-1, 2)
    assert np.isfinite(s2).all()
    np.testing.assert_allclose(s2.mean(0), MU, atol=0.3)


def test_forward_u_plain_and_guided():
    d = make_gmflow(k=4)
    params = init_params(d)
    x = jax.random.normal(jax.random.PRNGKey(16), (2, 1, 1, 2))
    t = jnp.full((2,), 500.0)
    u = d.forward_u(params, x, t)
    assert u.shape == x.shape
    # guided path needs 2B-batched conditioning; toy denoiser is uncond so
    # just exercise the code path
    x2 = jnp.concatenate([x, x], 0)
    u_g = d.forward_u(params, x, t, guidance_scale=0.3)
    assert u_g.shape == x.shape and bool(jnp.isfinite(u_g).all())
