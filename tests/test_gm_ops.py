"""GM math library property tests (the reference had none; SURVEY.md §4)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arcflow_tpu.ops.gm import (gaussian_samples_to_gm_samples, gm1d_inverse_cdf,
                                gm1d_pdf_cdf, gm_entropy, gm_kl_div,
                                gm_logprob, gm_mul_gm, gm_mul_iso_gaussian,
                                gm_samples_to_gaussian_samples, gm_temperature,
                                gm_to_gaussian, gm_to_iso_gaussian, gm_to_mean,
                                gm_to_sample, iso_gaussian_logprob,
                                iso_gaussian_mul_iso_gaussian)


def make_gm(key, b=2, k=4, h=3, w=3, c=2, logstd=-0.5):
    k1, k2 = jax.random.split(key)
    means = jax.random.normal(k1, (b, k, h, w, c))
    logweights = jax.nn.log_softmax(
        jax.random.normal(k2, (b, k, h, w, 1)), axis=1)
    return dict(means=means, logstds=jnp.full((b, 1, 1, 1, 1), logstd),
                logweights=logweights)


def test_gm_to_mean_and_iso_moments_match_sampling():
    gm = make_gm(jax.random.PRNGKey(0))
    mean = gm_to_mean(gm)
    gauss, _ = gm_to_iso_gaussian(gm)
    np.testing.assert_allclose(np.asarray(gauss['mean']), np.asarray(mean),
                               rtol=1e-5)

    samples = gm_to_sample(jax.random.PRNGKey(1), gm, n_samples=20000)
    emp_mean = np.asarray(samples).mean(axis=1)
    np.testing.assert_allclose(emp_mean, np.asarray(mean), atol=0.05)
    emp_var = np.asarray(samples).var(axis=1).mean(-1, keepdims=True)
    np.testing.assert_allclose(emp_var, np.asarray(gauss['var']), rtol=0.08)


def test_gm_to_gaussian_cov_psd_and_consistent():
    gm = make_gm(jax.random.PRNGKey(2))
    gauss, _ = gm_to_gaussian(gm)
    cov = np.asarray(gauss['cov'])
    eigs = np.linalg.eigvalsh(cov)
    assert (eigs > 0).all()
    iso, _ = gm_to_iso_gaussian(gm)
    np.testing.assert_allclose(
        np.trace(cov, axis1=-2, axis2=-1) / cov.shape[-1],
        np.asarray(iso['var'])[..., 0], rtol=1e-4)


def test_gm_logprob_matches_manual():
    gm = make_gm(jax.random.PRNGKey(3), b=1, k=3, h=1, w=1, c=2)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 5, 1, 1, 2))
    lp, _ = gm_logprob(gm, x)

    means = np.asarray(gm['means'])[0, :, 0, 0]      # (K, C)
    lw = np.asarray(gm['logweights'])[0, :, 0, 0, 0]
    std = math.exp(float(gm['logstds'][0, 0, 0, 0, 0]))
    xs = np.asarray(x)[0, :, 0, 0]                   # (N, C)
    manual = []
    for xi in xs:
        comps = lw + (-0.5 * ((xi - means) / std) ** 2
                      - math.log(std) - 0.5 * math.log(2 * math.pi)).sum(-1)
        manual.append(np.logaddexp.reduce(comps))
    np.testing.assert_allclose(np.asarray(lp)[0, :, 0, 0], manual, rtol=1e-5)


def test_single_component_gm_equals_gaussian_logprob():
    gm = make_gm(jax.random.PRNGKey(5), k=1)
    gm['logweights'] = jnp.zeros_like(gm['logweights'])
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 4, 3, 3, 2))
    lp, _ = gm_logprob(gm, x)
    gauss = dict(mean=gm['means'].squeeze(1),
                 var=jnp.exp(2 * gm['logstds']).squeeze(1))
    lp_g = iso_gaussian_logprob(gauss, x)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp_g), rtol=1e-5)


def test_gm_mul_iso_gaussian_bayes_identity():
    """GM * N must equal the normalized product density (checked pointwise)."""
    gm = make_gm(jax.random.PRNGKey(7), b=1, k=3, h=1, w=1, c=2)
    gauss = dict(mean=jnp.asarray(np.random.RandomState(0).randn(1, 1, 1, 2),
                                  jnp.float32),
                 var=jnp.full((1, 1, 1, 1), 0.49))
    out, _ = gm_mul_iso_gaussian(gm, gauss, 1.0, 1.0)

    xs = jnp.asarray(np.random.RandomState(1).randn(1, 7, 1, 1, 2),
                     jnp.float32)
    lp_out, _ = gm_logprob(out, xs)
    lp_gm, _ = gm_logprob(gm, xs)
    lp_g = iso_gaussian_logprob(gauss, xs)
    lp_prod = lp_gm + lp_g
    # equal up to an additive constant (normalization)
    diff = np.asarray(lp_out - lp_prod)
    np.testing.assert_allclose(diff - diff.mean(), 0.0, atol=1e-4)


def test_gm_mul_gm_identity():
    gm1 = make_gm(jax.random.PRNGKey(8), b=1, k=2, h=1, w=1, c=2)
    gm2 = make_gm(jax.random.PRNGKey(9), b=1, k=3, h=1, w=1, c=2)
    out = gm_mul_gm(gm1, gm2)
    assert out['means'].shape[1] == 6
    xs = jnp.asarray(np.random.RandomState(2).randn(1, 7, 1, 1, 2), jnp.float32)
    lp_out, _ = gm_logprob(out, xs)
    lp_prod = gm_logprob(gm1, xs)[0] + gm_logprob(gm2, xs)[0]
    diff = np.asarray(lp_out - lp_prod)
    np.testing.assert_allclose(diff - diff.mean(), 0.0, atol=1e-4)


def test_iso_mul_iso():
    g1 = dict(mean=jnp.ones((1, 1, 1, 2)), var=jnp.ones((1, 1, 1, 1)))
    g2 = dict(mean=-jnp.ones((1, 1, 1, 2)), var=jnp.ones((1, 1, 1, 1)))
    out = iso_gaussian_mul_iso_gaussian(g1, g2, 1.0, 1.0)
    np.testing.assert_allclose(np.asarray(out['mean']), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out['var']), 0.5, rtol=1e-5)


def test_temperature_limits():
    gm = make_gm(jax.random.PRNGKey(10))
    hot = gm_temperature(gm, 0.2)
    w_hot = np.exp(np.asarray(hot['logweights']))
    w = np.exp(np.asarray(gm['logweights']))
    assert w_hot.max() > w.max()
    # logstd shift: var scaled by T
    np.testing.assert_allclose(np.asarray(hot['logstds'] - gm['logstds']),
                               0.5 * math.log(0.2), rtol=1e-6)


def test_gm1d_inverse_cdf_roundtrip():
    key = jax.random.PRNGKey(11)
    b, g, h, w, n = 2, 4, 3, 3, 6
    means = jax.random.normal(key, (b, g, h, w)) * 2
    logweights = jax.nn.log_softmax(
        jax.random.normal(jax.random.PRNGKey(12), (b, g, h, w)), axis=-3)
    gm1d = dict(means=means, logstds=jnp.full((b, 1, 1, 1), -0.3),
                logweights=logweights)
    x_true = jax.random.normal(jax.random.PRNGKey(13), (b, n, h, w)) * 1.5
    _, cdf = gm1d_pdf_cdf(dict(**gm1d), x_true)
    x_rec = gm1d_inverse_cdf(dict(**gm1d), cdf, n_steps=16, backward_steps=2,
                             use_pallas=False)
    # the inversion is ill-conditioned where the CDF saturates; compare the
    # non-saturated bulk tightly
    mask = np.abs(np.asarray(cdf)) < 0.999
    err = np.abs(np.asarray(x_rec) - np.asarray(x_true))
    assert err[mask].max() < 2e-3, err[mask].max()
    assert mask.mean() > 0.8


def test_kr_roundtrip():
    """gaussian -> GM samples -> gaussian must return the original draws."""
    gm = make_gm(jax.random.PRNGKey(14), b=1, k=3, h=2, w=2, c=3,
                 logstd=-0.2)
    z = jax.random.normal(jax.random.PRNGKey(15), (1, 8, 2, 2, 3))
    x = gaussian_samples_to_gm_samples(gm, z, n_steps=24, use_pallas=False)
    z_rec = gm_samples_to_gaussian_samples(gm, x)
    np.testing.assert_allclose(np.asarray(z_rec), np.asarray(z), atol=5e-3)


def test_kr_samples_match_gm_distribution():
    """KR-transported gaussian samples follow the mixture's moments."""
    gm = make_gm(jax.random.PRNGKey(16), b=1, k=3, h=1, w=1, c=2,
                 logstd=-0.7)
    z = jax.random.normal(jax.random.PRNGKey(17), (1, 20000, 1, 1, 2))
    x = gaussian_samples_to_gm_samples(gm, z, n_steps=24, use_pallas=False)
    mean = gm_to_mean(gm)
    np.testing.assert_allclose(np.asarray(x).mean(1), np.asarray(mean),
                               atol=0.05)
    gauss, _ = gm_to_iso_gaussian(gm)
    emp_var = np.asarray(x).var(1).mean(-1, keepdims=True)
    np.testing.assert_allclose(emp_var, np.asarray(gauss['var']), rtol=0.08)


def test_kl_entropy_sanity():
    gm = make_gm(jax.random.PRNGKey(18))
    kl_self = gm_kl_div(jax.random.PRNGKey(19), gm, gm, n_samples=64)
    np.testing.assert_allclose(np.asarray(kl_self), 0.0, atol=1e-5)
    gm2 = make_gm(jax.random.PRNGKey(20))
    kl = gm_kl_div(jax.random.PRNGKey(21), gm, gm2, n_samples=256)
    assert float(kl.mean()) > 0
    ent = gm_entropy(jax.random.PRNGKey(22), gm, n_samples=64)
    assert np.isfinite(np.asarray(ent)).all()


def test_gmflow_nll_loss_uses_gm_logprob():
    from arcflow_tpu.diffusion import GMFlowNLLLoss
    gm = make_gm(jax.random.PRNGKey(23), b=2, k=4, h=3, w=3, c=2)
    target = jax.random.normal(jax.random.PRNGKey(24), (2, 3, 3, 2))
    loss_fn = GMFlowNLLLoss()
    loss, info = loss_fn(dict(means=gm['means'], logstds=gm['logstds'],
                              logweights=gm['logweights'], u_t=target,
                              timesteps=jnp.zeros((2,))))
    assert np.isfinite(float(loss))
    lp, _ = gm_logprob(gm, target[:, None])
    expected = (-lp.squeeze(1) / 2).reshape(2, -1).mean(1).mean()
    np.testing.assert_allclose(float(loss), float(expected), rtol=1e-5)
