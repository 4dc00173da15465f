"""ArcFlow distillation math: segment loss, multi-step training, 2-NFE sampling."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from arcflow_tpu.diffusion import (ArcFlowImitation, ArcFlowImitationDataFree,
                                   multistep_train_loss)
from arcflow_tpu.models import ToyArcFlowDenoiser

MU = jnp.array([1.5, -0.5])
NUM_T = 1000


def analytic_teacher_fn(x_t, t):
    """Exact teacher u for a Gaussian N(MU, s^2) data distribution.

    For x0 ~ N(mu, s^2 I):  x_t ~ N((1-sig) mu, ((1-sig)^2 s^2 + sig^2) I) and
    u(x,sig) = E[eps - x0 | x_t] — affine in x_t, smooth at sig=0 (unlike a
    point mass, whose u is singular there).
    """
    s2 = 0.25 ** 2
    sigma = (t / NUM_T).reshape(-1, 1)
    alpha = 1 - sigma
    var_t = alpha ** 2 * s2 + sigma ** 2
    # posterior mean of x0 given x_t
    x0_hat = MU + alpha * s2 / var_t * (x_t - alpha * MU)
    eps_hat = sigma * (x_t - alpha * MU) / var_t
    return eps_hat - x0_hat


def make_diffusion(cls=ArcFlowImitationDataFree, nfe=2, k=8, **train_cfg):
    denoiser = ToyArcFlowDenoiser(out_channels=2, num_gaussians=k,
                                  hidden=(64, 64))
    d = cls(
        denoising=denoiser,
        flow_loss=dict(type='DiffusionMSELoss',
                       data_info=dict(pred='u_t_pred', target='u_t'),
                       rescale_cfg=dict(scale=30.0)),
        num_timesteps=NUM_T,
        train_cfg=dict(nfe=nfe, total_substeps=128, num_intermediate_states=4,
                       window_substeps=3, num_decay_iters=100, **train_cfg),
        test_cfg=dict(nfe=nfe, timestep_ratio=1.0))
    params = denoiser.init(jax.random.PRNGKey(0), jnp.zeros((2, 2)),
                           jnp.zeros((2,)))['params']
    return d, params


def test_datafree_multistep_loss_and_grads():
    d, params = make_diffusion()
    x0_dummy = jnp.zeros((4, 2))

    def loss_fn(p, rng):
        return multistep_train_loss(
            d, p, rng, x0_dummy, teacher_fn=analytic_teacher_fn,
            running_status=dict(iteration=0))

    (loss, log_vars), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    # both NFE steps contributed
    assert 'loss_diffusion_step0' in log_vars and 'loss_diffusion_step1' in log_vars
    gmax = max(float(jnp.abs(g).max()) for g in jax.tree.leaves(grads))
    assert np.isfinite(gmax) and gmax > 0


def test_teacher_ratio_decay_schedule():
    d, params = make_diffusion()
    r0, _ = d._teacher_ratio(dict(iteration=0))
    r50, _ = d._teacher_ratio(dict(iteration=50))
    r100, _ = d._teacher_ratio(dict(iteration=100))
    r200, _ = d._teacher_ratio(dict(iteration=200))
    assert float(r0) == 1.0 and abs(float(r50) - 0.5) < 1e-6
    assert float(r100) == 0.0 and float(r200) == 0.0


def test_databased_imitation_forward_train():
    d, params = make_diffusion(cls=ArcFlowImitation)
    x0 = jax.random.normal(jax.random.PRNGKey(2), (4, 2)) * 0.3 + MU

    def loss_fn(p, rng):
        return d.forward_train(p, rng, x0, teacher_fn=analytic_teacher_fn,
                               running_status=dict(iteration=50))

    (loss, log_vars), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))
    assert float(log_vars['teacher_ratio']) == 0.5


def test_sample_t_snaps_to_grid():
    d, _ = make_diffusion(cls=ArcFlowImitation, nfe=4)
    raw_src, sigma_src, t_src, seg = d.sample_t(jax.random.PRNGKey(4), 4096)
    raw_src = np.asarray(raw_src)
    # nfe=4, timestep_ratio=1: grid sources are {0.25, 0.5, 0.75, 1.0}
    grid = np.array([0.25, 0.5, 0.75, 1.0])
    dists = np.abs(raw_src[:, None] - grid[None]).min(axis=1)
    assert dists.max() < 1e-5
    np.testing.assert_allclose(np.asarray(seg), 0.25, rtol=1e-5)


def test_distillation_learns_gaussian_target():
    """End-to-end: distill the analytic teacher into a 2-NFE student."""
    d, params = make_diffusion(nfe=2, k=4)
    x0_dummy = jnp.zeros((64, 2))
    opt = optax.chain(optax.clip_by_global_norm(50.0), optax.adam(3e-3))
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, rng, iteration):
        def loss_fn(p):
            loss, lv = multistep_train_loss(
                d, p, rng, x0_dummy, teacher_fn=analytic_teacher_fn,
                running_status=dict(iteration=iteration))
            return loss, lv
        (loss, lv), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = jax.random.PRNGKey(5)
    losses = []
    for i in range(300):
        rng, rng_i = jax.random.split(rng)
        params, opt_state, loss = train_step(params, opt_state, rng_i,
                                             jnp.asarray(i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    # compare within the pure-student regime (teacher_ratio == 0 from iter 100)
    assert np.mean(losses[-50:]) < np.mean(losses[100:150]) * 0.7, \
        f'{np.mean(losses[100:150]):.3f} -> {np.mean(losses[-50:]):.3f}'

    # 2-NFE sampling should now land near MU from pure noise
    noise = jax.random.normal(jax.random.PRNGKey(6), (256, 2))
    samples = d.forward_test(params, jax.random.PRNGKey(7), noise)
    err = np.abs(np.asarray(samples).mean(axis=0) - np.asarray(MU))
    assert err.max() < 0.3, f'2-NFE samples off target: {err}'


def test_forward_test_jits():
    d, params = make_diffusion(nfe=2, k=4)
    noise = jax.random.normal(jax.random.PRNGKey(8), (8, 2))

    @jax.jit
    def sample(p, noise):
        return d.forward_test(p, jax.random.PRNGKey(0), noise)

    x = sample(params, noise)
    assert x.shape == (8, 2) and bool(jnp.isfinite(x).all())
