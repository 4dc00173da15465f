"""Class-conditional latent diffusion (UNet) + high-order flow solvers."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from arcflow_tpu.diffusion import GaussianFlow
from arcflow_tpu.diffusion.schedulers import (FlowDPMSolverScheduler,
                                              FlowUniPCScheduler)
from arcflow_tpu.models import DenoisingUnetMod, LatentDiffusionClassImage
from arcflow_tpu.runner import EmaConfig, TrainState, build_train_step

MU = jnp.array([0.8, -0.3])


class AnalyticGaussianDenoiser:
    """Exact u for x0 ~ N(MU, s^2) — channel-last image shaped."""

    def __init__(self, s=0.25, num_timesteps=1000):
        self.s2 = s * s
        self.T = num_timesteps

    def apply(self, variables, x_t, t, **kw):
        sigma = (t / self.T).reshape(-1, 1, 1, 1)
        alpha = 1 - sigma
        var = alpha ** 2 * self.s2 + sigma ** 2
        mu = MU.reshape(1, 1, 1, 2)
        x0_hat = mu + alpha * self.s2 / var * (x_t - alpha * mu)
        eps_hat = sigma * (x_t - alpha * mu) / var
        return eps_hat - x0_hat


@pytest.mark.parametrize('sampler', ['FlowDPMSolver', 'FlowUniPC',
                                     'FlowDEIS', 'FlowSASolver'])
def test_high_order_solvers_recover_target(sampler):
    flow = GaussianFlow(denoising=AnalyticGaussianDenoiser(),
                        num_timesteps=1000,
                        test_cfg=dict(sampler=sampler, num_timesteps=8))
    noise = jax.random.normal(jax.random.PRNGKey(0), (512, 1, 1, 2))
    x = np.asarray(flow.forward_test({}, jax.random.PRNGKey(1), noise))
    np.testing.assert_allclose(x.reshape(-1, 2).mean(0), np.asarray(MU),
                               atol=0.06)
    np.testing.assert_allclose(x.reshape(-1, 2).std(0), 0.25, atol=0.06)


def test_dpmsolver_beats_euler_at_few_steps():
    """2nd-order solver should land closer than Euler with the same budget."""
    def run(sampler, steps):
        flow = GaussianFlow(denoising=AnalyticGaussianDenoiser(),
                            num_timesteps=1000,
                            test_cfg=dict(sampler=sampler,
                                          num_timesteps=steps))
        noise = jax.random.normal(jax.random.PRNGKey(2), (1024, 1, 1, 2))
        x = np.asarray(flow.forward_test({}, jax.random.PRNGKey(3), noise))
        x = x.reshape(-1, 2)
        return abs(x.std(0).mean() - 0.25) + np.abs(x.mean(0)
                                                    - np.asarray(MU)).mean()

    err_euler = run('FlowEulerODE', 4)
    err_dpm = run('FlowDPMSolver', 4)
    assert err_dpm < err_euler, (err_dpm, err_euler)
    err_deis = run('FlowDEIS', 4)
    assert err_deis < err_euler, (err_deis, err_euler)


def test_sasolver_tau_zero_equals_dpmsolver():
    """tau=0 must reduce SA-Solver exactly to the deterministic
    DPM-Solver++(2M) path."""
    from arcflow_tpu.diffusion.schedulers import FlowSASolverScheduler

    def run(sampler_kwargs):
        flow = GaussianFlow(denoising=AnalyticGaussianDenoiser(),
                            num_timesteps=1000,
                            test_cfg=dict(sampler='FlowSASolver',
                                          sampler_kwargs=sampler_kwargs,
                                          num_timesteps=6))
        noise = jax.random.normal(jax.random.PRNGKey(5), (64, 1, 1, 2))
        return np.asarray(flow.forward_test({}, jax.random.PRNGKey(6), noise))

    flow_dpm = GaussianFlow(denoising=AnalyticGaussianDenoiser(),
                            num_timesteps=1000,
                            test_cfg=dict(sampler='FlowDPMSolver',
                                          num_timesteps=6))
    noise = jax.random.normal(jax.random.PRNGKey(5), (64, 1, 1, 2))
    ref = np.asarray(flow_dpm.forward_test({}, jax.random.PRNGKey(6), noise))
    np.testing.assert_allclose(run(dict(tau=0.0)), ref, atol=1e-5)
    # tau > 0 is genuinely stochastic yet stays on-distribution
    x = run(dict(tau=1.0)).reshape(-1, 2)
    assert np.abs(x - ref.reshape(-1, 2)).max() > 1e-3
    assert np.abs(x.mean(0) - np.asarray(MU)).max() < 0.15


def test_flow_adapter_dispatch():
    """Reference FlowAdapterScheduler config names resolve to the native
    solver family (default = UniPC, flow_adapter.py:36)."""
    from arcflow_tpu.registry import SCHEDULERS
    from arcflow_tpu.diffusion.schedulers import (
        FlowDEISScheduler, FlowSASolverScheduler, FlowUniPCScheduler)
    build = SCHEDULERS.get('FlowAdapterScheduler')
    assert isinstance(build(), FlowUniPCScheduler)
    assert isinstance(build(base_scheduler='DEISMultistep', shift=3.2),
                      FlowDEISScheduler)
    sa = build(base_scheduler='SASolver', tau=0.5)
    assert isinstance(sa, FlowSASolverScheduler) and sa.tau == 0.5
    with pytest.raises(AttributeError):
        build(base_scheduler='Nope')


def test_unet_shapes_and_class_conditioning():
    unet = DenoisingUnetMod(in_channels=4, base_channels=32,
                            channel_mult=(1, 2), num_res_blocks=1,
                            attn_resolutions=(4,), num_classes=10,
                            num_heads=4)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 8, 4))
    t = jnp.full((2,), 500.0)
    y = jnp.array([3, 7])
    params = unet.init(jax.random.PRNGKey(5), x, t, label=y)['params']
    out = unet.apply({'params': params}, x, t, label=y)
    assert out.shape == x.shape
    out_null = unet.apply({'params': params}, x, t,
                          label=jnp.array([10, 10]))   # null class works
    assert np.isfinite(np.asarray(out_null)).all()


def test_class_image_train_step_and_val():
    model = LatentDiffusionClassImage(
        diffusion=dict(
            type='GaussianFlow',
            denoising=dict(type='DenoisingUnetMod', in_channels=4,
                           base_channels=32, channel_mult=(1, 2),
                           num_res_blocks=1, attn_resolutions=(4,),
                           num_classes=10, num_heads=4),
            flow_loss=dict(type='DiffusionMSELoss',
                           data_info=dict(pred='u_t_pred', target='u_t')),
            num_timesteps=1000),
        num_classes=10, prob_class=0.2, latent_shape=(8, 8, 4),
        test_cfg=dict(sampler='FlowEulerODE', num_timesteps=4))

    trainable, frozen = model.init_params(jax.random.PRNGKey(6))
    opt = {'diffusion': optax.adamw(1e-4)}
    state = TrainState.create(jax.random.PRNGKey(7), trainable, frozen, opt,
                              ema_keys=model.ema_keys)
    step = build_train_step(model, opt, ema_cfg=EmaConfig(), donate=False)
    batch = dict(latents=jax.random.normal(jax.random.PRNGKey(8), (4, 8, 8, 4)),
                 label=jnp.array([1, 2, 3, 4]))
    state, logs = step(state, batch)
    assert np.isfinite(float(logs['loss']))

    out = model.val_step(state, jax.random.PRNGKey(9),
                         dict(label=jnp.array([5, 6])), guidance_scale=2.0)
    assert out['pred_latents'].shape == (2, 8, 8, 4)
    assert np.isfinite(np.asarray(out['pred_latents'])).all()
