import jax
import jax.numpy as jnp
import numpy as np

from arcflow_tpu.diffusion import ContinuousTimeStepSampler


def test_warp_unwarp_roundtrip():
    s = ContinuousTimeStepSampler(num_timesteps=1000, shift=3.2)
    t = jnp.linspace(0.01, 1.0, 64)
    np.testing.assert_allclose(np.asarray(s.unwarp_t(s.warp_t(t))),
                               np.asarray(t), rtol=1e-5)


def test_shift_identity_when_one():
    s = ContinuousTimeStepSampler(num_timesteps=1000, shift=1.0)
    t = jnp.linspace(0.0, 1.0, 16)
    np.testing.assert_allclose(np.asarray(s.warp_t(t)), np.asarray(t), rtol=1e-6)


def test_warp_endpoints_fixed():
    s = ContinuousTimeStepSampler(num_timesteps=1000, shift=5.0)
    assert float(s.warp_t(jnp.array(0.0))) == 0.0
    np.testing.assert_allclose(float(s.warp_t(jnp.array(1.0))), 1.0, rtol=1e-6)


def test_dynamic_shift_log_linear():
    s = ContinuousTimeStepSampler(
        num_timesteps=1000, use_dynamic_shifting=True,
        base_seq_len=256, max_seq_len=4096, base_logshift=0.5, max_logshift=1.15)
    np.testing.assert_allclose(s.get_shift(seq_len=256), np.exp(0.5), rtol=1e-6)
    np.testing.assert_allclose(s.get_shift(seq_len=4096), np.exp(1.15), rtol=1e-6)
    mid = s.get_shift(seq_len=(256 + 4096) // 2)
    np.testing.assert_allclose(mid, np.exp((0.5 + 1.15) / 2), rtol=1e-6)


def test_sample_range_and_scaling():
    s = ContinuousTimeStepSampler(num_timesteps=1000, shift=3.0)
    t = s.sample(jax.random.PRNGKey(0), 4096)
    t = np.asarray(t)
    assert t.min() > 0.0 and t.max() <= 1000.0
    raw = s.sample(jax.random.PRNGKey(0), 4096, warp_t=False, scale_t=False)
    raw = np.asarray(raw)
    assert raw.min() > 0.0 and raw.max() <= 1.0
    # shift>1 pushes sigma mass toward 1 (noisier times)
    assert t.mean() / 1000.0 > raw.mean()


def test_sample_raw_t_range():
    s = ContinuousTimeStepSampler(num_timesteps=1000)
    t = np.asarray(s.sample(jax.random.PRNGKey(1), 2048, warp_t=False,
                            scale_t=False, raw_t_range=(0.8, 0.3)))
    assert t.min() >= 0.3 and t.max() <= 0.8


def test_logit_normal():
    s = ContinuousTimeStepSampler(num_timesteps=1000, logit_normal_enable=True,
                                  logit_normal_mean=0.0, logit_normal_std=1.0)
    t = np.asarray(s.sample(jax.random.PRNGKey(2), 8192, warp_t=False,
                            scale_t=False))
    assert 0.0 < t.min() and t.max() < 1.0
    np.testing.assert_allclose(t.mean(), 0.5, atol=0.02)


def test_sampler_is_jittable():
    s = ContinuousTimeStepSampler(num_timesteps=1000, shift=2.0)

    @jax.jit
    def f(key):
        return s.sample(key, 8)

    t = f(jax.random.PRNGKey(3))
    assert t.shape == (8,)
