import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from arcflow_tpu.diffusion import GaussianFlow
from arcflow_tpu.models import ToyMLPDenoiser

MU = jnp.array([1.5, -0.5])


class AnalyticPointMassDenoiser:
    """Exact u-predictor for a point-mass data distribution at MU.

    x_t = (1-sigma) mu + sigma eps  =>  eps = (x_t - (1-sigma) mu) / sigma
    u = eps - x0 = (x_t - (1-sigma) mu) / sigma - mu
    """

    def __init__(self, num_timesteps=1000):
        self.num_timesteps = num_timesteps

    def apply(self, variables, x_t, t, **kwargs):
        sigma = (t / self.num_timesteps).reshape(-1, 1)
        sigma = jnp.maximum(sigma, 1e-6)
        return (x_t - (1 - sigma) * MU) / sigma - MU


def make_flow(sampler='FlowEulerODE', **test_cfg):
    return GaussianFlow(
        denoising=AnalyticPointMassDenoiser(),
        flow_loss=dict(type='DiffusionMSELoss',
                       data_info=dict(pred='u_t_pred', target='u_t')),
        num_timesteps=1000,
        test_cfg=dict(sampler=sampler, **test_cfg))


def test_forward_diffusion_interpolation():
    flow = make_flow()
    x0 = jnp.ones((4, 2))
    noise = jnp.zeros((4, 2))
    x_t, mean, std = flow.sample_forward_diffusion(x0, jnp.full((4,), 250.0), noise)
    np.testing.assert_allclose(np.asarray(x_t), 0.75 * np.ones((4, 2)), rtol=1e-6)


def test_euler_ode_recovers_point_mass():
    flow = make_flow('FlowEulerODE', num_timesteps=64)
    rng = jax.random.PRNGKey(0)
    noise = jax.random.normal(rng, (8, 2))
    x = flow.forward_test({}, rng, noise)
    # exact u-field: every sample must land exactly on MU regardless of steps
    np.testing.assert_allclose(np.asarray(x), np.tile(np.asarray(MU), (8, 1)),
                               atol=2e-3)


def test_sde_recovers_point_mass():
    flow = make_flow('FlowSDE', num_timesteps=32, sampler_kwargs=dict(h=1.0))
    rng = jax.random.PRNGKey(1)
    noise = jax.random.normal(rng, (8, 2))
    x = flow.forward_test({}, rng, noise)
    np.testing.assert_allclose(np.asarray(x), np.tile(np.asarray(MU), (8, 1)),
                               atol=2e-3)


def test_sde_h_inf_is_ancestral_and_h0_is_ode():
    from arcflow_tpu.diffusion import FlowSDEScheduler
    b = 4
    sample = jax.random.normal(jax.random.PRNGKey(2), (b, 2))
    u = jax.random.normal(jax.random.PRNGKey(3), (b, 2))
    rng = jax.random.PRNGKey(4)
    sigma, sigma_next = jnp.array(0.8), jnp.array(0.6)

    ode = FlowSDEScheduler(h=0.0)
    out_ode = ode.step(u, sample, sigma, sigma_next, rng=rng)
    # h=0 -> m=1 -> noise coefficient 0 -> deterministic Euler-consistent step
    x0 = sample - sigma * u
    eps = sample + (1 - sigma) * u
    expected = (1 - sigma_next) * x0 + sigma_next * eps
    np.testing.assert_allclose(np.asarray(out_ode), np.asarray(expected), rtol=1e-5)

    anc = FlowSDEScheduler(h='inf')
    out1 = anc.step(u, sample, sigma, sigma_next, rng=jax.random.PRNGKey(5))
    out2 = anc.step(u, sample, sigma, sigma_next, rng=jax.random.PRNGKey(6))
    # h=inf -> epsilon fully resampled -> different keys give different results
    assert float(jnp.abs(out1 - out2).max()) > 1e-3


def test_guidance_orthogonal_projection():
    from arcflow_tpu.diffusion import apply_guidance
    pos = jax.random.normal(jax.random.PRNGKey(7), (4, 16))
    neg = jax.random.normal(jax.random.PRNGKey(8), (4, 16))
    bias = apply_guidance(pos, neg, 5.0, orthogonal=True)
    # orthogonal bias has (approximately) zero mean-projection onto pos
    proj = (bias * pos).mean(axis=1) / (pos * pos).mean(axis=1)
    np.testing.assert_allclose(np.asarray(proj), np.zeros(4), atol=1e-5)
    bias_plain = apply_guidance(pos, neg, 5.0, orthogonal=False)
    np.testing.assert_allclose(np.asarray(bias_plain),
                               np.asarray((pos - neg) * 4.0), rtol=1e-6)


def test_forward_u_with_cfg_batching():
    flow = make_flow()
    b = 4
    x = jax.random.normal(jax.random.PRNGKey(9), (b, 2))
    t = jnp.full((b,), 500.0)
    u_plain = flow.forward_u({}, x, t, guidance_scale=1.0)
    u_cfg = flow.forward_u({}, x, t, guidance_scale=3.0)
    # analytic denoiser is condition-free: pos == neg -> bias == 0
    np.testing.assert_allclose(np.asarray(u_cfg), np.asarray(u_plain), rtol=1e-5)


def test_training_loss_decreases_on_toy_data():
    denoiser = ToyMLPDenoiser(out_channels=2, hidden=(64, 64))
    flow = GaussianFlow(
        denoising=denoiser,
        flow_loss=dict(type='DiffusionMSELoss',
                       data_info=dict(pred='u_t_pred', target='u_t')),
        num_timesteps=1000)

    rng = jax.random.PRNGKey(0)
    params = denoiser.init(rng, jnp.zeros((2, 2)), jnp.zeros((2,)))['params']
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    data = jax.random.normal(jax.random.PRNGKey(1), (512, 2)) * 0.3 + MU

    @jax.jit
    def step(params, opt_state, rng, x0):
        def loss_fn(p):
            loss, lv = flow.forward_train(p, rng, x0)
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(60):
        rng, rng_i = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, rng_i, data)
        losses.append(float(loss))
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) * 0.7
    assert np.isfinite(losses).all()
