"""Gaussian-mixture operations library (pure JAX).

Equivalent capability to the reference GM library
(``lakonlab/ops/gmflow_ops/gmflow_ops.py``, ~1.1k LoC of torch +
torch.jit.script): moment matching, Gaussian/GM products, sampling, log-probs,
spectral log-probs, KL/entropy estimates, Knothe-Rosenblatt transport in both
directions, and the Newton-Raphson 1-D inverse CDF (see ``inverse_cdf.py``
for the Pallas TPU kernel of the hot NR loop).

Conventions (channel-last, TPU-native; the reference is channels-first):
    GM dict:
        means      (*B, K, H, W, C)
        logstds    broadcastable to means, typically (*B, 1, 1, 1, 1)
        logweights (*B, K, H, W, 1), normalized over K
        [cached: gm_vars, gm_weights]
    Full-covariance GM (from gm_to_gaussian products):
        means (*B, K, H, W, C), covs (*B, 1|K, H, W, C, C),
        logweights (*B, K, H, W, 1)
    Gaussian dict: mean (*B, H, W, C), var (*B, H, W, 1) (iso) or
        cov (*B, H, W, C, C)
    Samples: (*B, N, H, W, C)

Axis indices from the right: K at -4 of means, C at -1. Functions are pure
and jittable; sampling takes explicit PRNG keys.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array
SQRT2 = math.sqrt(2.0)
LOG_SQRT_2PI = 0.5 * math.log(2 * math.pi)


def _gm_vars(gm: Dict[str, Array]) -> Array:
    if 'gm_vars' in gm:
        return gm['gm_vars']
    return jnp.exp(2.0 * gm['logstds'])


def _gm_weights(gm: Dict[str, Array]) -> Array:
    if 'gm_weights' in gm:
        return gm['gm_weights']
    return jnp.exp(gm['logweights'])


# ---------------------------------------------------------------- moments ----

def gm_to_mean(gm: Dict[str, Array], gm_power: float = 1.0) -> Array:
    """Mixture mean (optionally of the power-sharpened mixture) ->
    (*B, H, W, C)."""
    w = jax.nn.softmax(gm['logweights'] * gm_power, axis=-4)
    return (w * gm['means']).sum(axis=-4)


def gm_to_iso_gaussian(gm: Dict[str, Array]
                       ) -> Tuple[Dict[str, Array], Array]:
    """Moment-match to an isotropic Gaussian.

    Returns (gaussian {mean (*B,H,W,C), var (*B,H,W,1)}, gm_diffs
    (*B,K,H,W,C)). Variance is the channel-averaged total variance
    (reference ``gm_to_iso_gaussian_jit``).
    """
    if 'covs' in gm:
        w = _gm_weights(gm)
        mean = (w * gm['means']).sum(axis=-4)
        diffs = gm['means'] - mean[..., None, :, :, :]
        covs = gm['covs']
        comp_var = jnp.diagonal(covs, axis1=-2, axis2=-1).mean(
            axis=-1, keepdims=True)            # (*B, 1|K, H, W, 1)
        if comp_var.shape[-4] > 1:
            comp_var = (w * comp_var).sum(axis=-4)
        else:
            comp_var = comp_var.squeeze(-4)
        var = (w * jnp.square(diffs)).sum(axis=-4).mean(-1, keepdims=True) \
            + comp_var
        return dict(mean=mean, var=var), diffs
    w = _gm_weights(gm)
    mean = (w * gm['means']).sum(axis=-4)                     # (*B,H,W,C)
    diffs = gm['means'] - mean[..., None, :, :, :]            # (*B,K,H,W,C)
    gv = _gm_vars(gm)                                         # bcastable
    if gv.shape[-4] > 1:                                      # per-component
        gv = (w * gv).sum(axis=-4)
    else:
        gv = gv.squeeze(-4)
    gv = gv.mean(-1, keepdims=True) if gv.shape[-1] > 1 else gv
    var = (w * jnp.square(diffs)).sum(axis=-4).mean(-1, keepdims=True) + gv
    return dict(mean=mean, var=var), diffs


def gm_to_gaussian(gm: Dict[str, Array], cov_scale: float = 1.0
                   ) -> Tuple[Dict[str, Array], Array]:
    """Moment-match to a full-covariance Gaussian.

    Returns (gaussian {mean (*B,H,W,C), cov (*B,H,W,C,C)}, gm_diffs).
    """
    c = gm['means'].shape[-1]
    w = _gm_weights(gm)
    mean = (w * gm['means']).sum(axis=-4)
    diffs = gm['means'] - mean[..., None, :, :, :]
    cov = (w[..., None] * diffs[..., :, None] * diffs[..., None, :]
           ).sum(axis=-5)                                      # (*B,H,W,C,C)
    if 'covs' in gm:
        covs = gm['covs']
        if covs.shape[-5] > 1:
            covs = (w[..., None] * covs).sum(axis=-5)
        else:
            covs = covs.squeeze(-5)
        cov = cov + covs
    else:
        cov = cov + jnp.eye(c) * _gm_vars(gm)[..., None].squeeze(-5)
    return dict(mean=mean, cov=cov * cov_scale), diffs


# ---------------------------------------------------------------- products ----

def iso_gaussian_mul_iso_gaussian(g1: Dict[str, Array], g2: Dict[str, Array],
                                  power1: float = 1.0, power2: float = 1.0,
                                  eps: float = 1e-6) -> Dict[str, Array]:
    """Precision-weighted product of two isotropic Gaussians (with powers)."""
    norm = jnp.maximum(power1 * g2['var'] + power2 * g1['var'], eps)
    var = g1['var'] * g2['var'] / norm
    mean = (power1 * g2['var'] * g1['mean']
            + power2 * g1['var'] * g2['mean']) / norm
    return dict(mean=mean, var=var)


def gaussian_mul_gaussian(g1: Dict[str, Array], g2: Dict[str, Array],
                          power1: float = 1.0, power2: float = 1.0
                          ) -> Dict[str, Array]:
    """Full-covariance Gaussian product."""
    p1 = power1 * jnp.linalg.inv(g1['cov'])
    p2 = power2 * jnp.linalg.inv(g2['cov'])
    cov = jnp.linalg.inv(p1 + p2)
    mean = (cov @ (p1 @ g1['mean'][..., None]
                   + p2 @ g2['mean'][..., None]))[..., 0]
    return dict(mean=mean, cov=cov)


def gm_mul_iso_gaussian(gm: Dict[str, Array], gaussian: Dict[str, Array],
                        gm_power: float = 1.0, gaussian_power: float = 1.0,
                        eps: float = 1e-6) -> Tuple[Dict[str, Array], float]:
    """GM^a * N^b -> GM (posterior fusion; reference
    ``gm_mul_iso_gaussian_jit``). Gaussian var is (*B, H, W, 1)."""
    g_mean = gaussian['mean'][..., None, :, :, :]     # (*B,1,H,W,C)
    g_var = gaussian['var'][..., None, :, :, :]       # (*B,1,H,W,1)
    g_logstd = gaussian.get('logstd')
    if g_logstd is None:
        g_logstd = 0.5 * jnp.log(g_var)
    else:
        g_logstd = g_logstd[..., None, :, :, :]
    gm_vars = _gm_vars(gm)

    diffs = gm['means'] - g_mean
    power_ratio = gaussian_power / gm_power
    norm = jnp.maximum(g_var + power_ratio * gm_vars, eps)
    out_means = (g_var * gm['means'] + power_ratio * gm_vars * g_mean) / norm
    lw_delta = jnp.square(diffs).sum(-1, keepdims=True) \
        * (-0.5 * power_ratio / norm)
    out_logweights = jax.nn.log_softmax(gm['logweights'] + lw_delta, axis=-4)
    out_logstds = gm['logstds'] + g_logstd - 0.5 * jnp.log(norm)
    return dict(means=out_means, logstds=out_logstds,
                logweights=out_logweights), gm_power


def gm_mul_gaussian(gm: Dict[str, Array], gaussian: Dict[str, Array],
                    gm_power: float = 1.0, gaussian_power: float = 1.0
                    ) -> Tuple[Dict[str, Array], float]:
    """GM^a * N^b with a full-covariance Gaussian -> full-cov GM
    (reference ``gm_mul_gaussian``)."""
    c = gm['means'].shape[-1]
    gm_vars = _gm_vars(gm)[..., None]                  # (*B,1,1,1,1,1)
    g_mean = gaussian['mean']                          # (*B,H,W,C)
    g_cov = gaussian['cov']                            # (*B,H,W,C,C)

    eye = jnp.eye(c)
    gm_prec = eye / gm_vars.squeeze(-5)                # (*B,1,1,C,C)-ish
    g_prec = (gaussian_power / gm_power) * jnp.linalg.inv(g_cov)
    out_covs = jnp.linalg.inv(gm_prec + g_prec)        # (*B,H,W,C,C)

    rhs = (gm['means'] / _gm_vars(gm)) \
        + (g_prec @ g_mean[..., None])[..., 0][..., None, :, :, :]
    out_means = (out_covs[..., None, :, :, :, :] @ rhs[..., None])[..., 0]

    gm_covs = eye * _gm_vars(gm)[..., None]
    diffs = gm['means'] - g_mean[..., None, :, :, :]
    mix_cov = gm_covs * gaussian_power \
        + g_cov[..., None, :, :, :, :] * gm_power
    sol = jnp.linalg.solve(mix_cov, diffs[..., None])[..., 0]
    lw_delta = (-0.5 * gaussian_power) * (diffs * sol).sum(-1, keepdims=True)
    out_logweights = jax.nn.log_softmax(gm['logweights'] + lw_delta, axis=-4)
    return dict(means=out_means, covs=out_covs[..., None, :, :, :, :],
                logweights=out_logweights), gm_power


def gm_mul_gm(gm1: Dict[str, Array], gm2: Dict[str, Array]
              ) -> Dict[str, Array]:
    """Product of two isotropic GMs -> GM with K1*K2 components."""
    m1 = gm1['means'][..., :, None, :, :, :]      # (*B,K1,1,H,W,C)
    m2 = gm2['means'][..., None, :, :, :, :]      # (*B,1,K2,H,W,C)
    v1 = _gm_vars(gm1)[..., :, None, :, :, :]
    v2 = _gm_vars(gm2)[..., None, :, :, :, :]
    lw1 = gm1['logweights'][..., :, None, :, :, :]
    lw2 = gm2['logweights'][..., None, :, :, :, :]

    norm = v1 + v2
    out_means = (v2 * m1 + v1 * m2) / norm
    lw_delta = jnp.square(m1 - m2).sum(-1, keepdims=True) * (-0.5 / norm)
    out_logweights = lw1 + lw2 + lw_delta

    # collapse (K1, K2) at axes (-5, -4) into one component axis
    shp = out_means.shape
    out_means = out_means.reshape(*shp[:-5], shp[-5] * shp[-4], *shp[-3:])
    out_logweights = jnp.broadcast_to(
        out_logweights, shp[:-1] + (1,))
    lw_shp = out_logweights.shape
    out_logweights = jax.nn.log_softmax(out_logweights.reshape(
        *lw_shp[:-5], lw_shp[-5] * lw_shp[-4], *lw_shp[-3:]), axis=-4)
    out_logstds = gm1['logstds'] + gm2['logstds'] - 0.5 * jnp.logaddexp(
        2 * gm1['logstds'], 2 * gm2['logstds'])
    return dict(means=out_means, logstds=out_logstds,
                logweights=out_logweights)


# ---------------------------------------------------------------- sampling ----

def gm_to_sample(rng: Array, gm: Dict[str, Array], gm_power: float = 1.0,
                 n_samples: int = 1, cov_sharpen: bool = False) -> Array:
    """Categorical + reparameterized draw -> (*B, N, H, W, C)."""
    means = gm['means']
    k = means.shape[-4]
    logits = (gm['logweights'] * gm_power).squeeze(-1)      # (*B,K,H,W)
    logits = jnp.moveaxis(logits, -3, -1)                   # (*B,H,W,K)
    rng_cat, rng_norm = jax.random.split(rng)
    inds = jax.random.categorical(rng_cat, logits, axis=-1,
                                  shape=(n_samples,) + logits.shape[:-1])
    inds = jnp.moveaxis(inds, 0, -3)                        # (*B,N,H,W)

    means_hw = jnp.moveaxis(means, -4, -3)                  # (*B,H,W,K,C)? no:
    # gather along K: one_hot on small K keeps everything dense/TPU-friendly
    one_hot = jax.nn.one_hot(inds, k, axis=-1)              # (*B,N,H,W,K)
    sel_means = jnp.einsum('...nhwk,...khwc->...nhwc', one_hot, means)

    stds = jnp.exp(gm['logstds'])
    if cov_sharpen:
        stds = stds / math.sqrt(gm_power)
    if stds.shape[-4] == k and k > 1:       # per-component stds
        sel_stds = jnp.einsum('...nhwk,...khwc->...nhwc', one_hot,
                              jnp.broadcast_to(stds, means.shape))
    else:
        sel_stds = stds.squeeze(-4)[..., None, :, :, :]
    noise = jax.random.normal(rng_norm, sel_means.shape, sel_means.dtype)
    return sel_means + sel_stds * noise


# ---------------------------------------------------------------- log-probs ----

def iso_gaussian_logprob(gaussian: Dict[str, Array], samples: Array) -> Array:
    """log N(samples; mean, var I) summed over channels -> (*B, N, H, W)."""
    mean = gaussian['mean'][..., None, :, :, :]
    var = gaussian['var'][..., None, :, :, :]
    c = mean.shape[-1]
    diff2 = jnp.square(samples - mean).sum(-1)
    return (-0.5 * diff2 / var.squeeze(-1)
            - 0.5 * c * jnp.log(var.squeeze(-1))
            - c * LOG_SQRT_2PI)


def gm_logprob(gm: Dict[str, Array], samples: Array
               ) -> Tuple[Array, Array]:
    """Mixture log-density of samples.

    Returns (logprob (*B, N, H, W), per-component gaussian logprobs
    (*B, N, K, H, W)).
    """
    c = gm['means'].shape[-1]
    const = -c * LOG_SQRT_2PI
    if 'covs' in gm:
        covs = gm['covs']                                  # (*B,1|K,H,W,C,C)
        invcov_trils = gm.get('invcov_trils')
        if invcov_trils is None:
            invcov_trils = jnp.linalg.cholesky(jnp.linalg.inv(covs))
        logdets = gm.get('logdets')
        if logdets is None:
            sign, logdets = jnp.linalg.slogdet(covs)
        diffs = samples[..., :, None, :, :, :] \
            - gm['means'][..., None, :, :, :, :]           # (*B,N,K,H,W,C)
        dw = jnp.einsum('...c,...cd->...d', diffs,
                        invcov_trils[..., None, :, :, :, :, :])
        glp = -0.5 * (jnp.square(dw).sum(-1)
                      + logdets[..., None, :, :, :]) + const
    else:
        inv_std = jnp.exp(-gm['logstds'])                  # bcast (*B,1,1,1,1)
        diffs = (samples[..., :, None, :, :, :]
                 - gm['means'][..., None, :, :, :, :]) \
            * inv_std[..., None, :, :, :, :]
        # sum of per-channel log stds (broadcast-safe for per-K/per-C stds)
        sum_logstd = jnp.broadcast_to(
            gm['logstds'], gm['means'].shape).sum(-1)      # (*B,K,H,W)
        glp = -0.5 * jnp.square(diffs).sum(-1) \
            - sum_logstd[..., None, :, :, :] + const
    lw = gm['logweights'].squeeze(-1)[..., None, :, :, :]  # (*B,1,K,H,W)
    logprob = jax.nn.logsumexp(lw + glp, axis=-3)
    return logprob, glp


def gm_spectral_logprobs(gm: Dict[str, Array], samples: Array,
                         power_spectrum: Optional[Array] = None,
                         spectral_samples: Optional[Array] = None,
                         n_axes: Optional[int] = None, eps: float = 1e-6,
                         axis_aligned: bool = True) -> Array:
    """Spatially-summed logprob with an optional FFT power-spectrum reweighting
    term (reference ``gm_spectral_logprobs``). Returns (*B, N)."""
    logprobs = gm_logprob(gm, samples)[0].sum(axis=(-2, -1))
    if power_spectrum is not None:
        if spectral_samples is None:
            z_kr = gm_samples_to_gaussian_samples(
                gm, samples, n_axes=n_axes, eps=eps, axis_aligned=axis_aligned)
            z_fft = jnp.fft.fft2(z_kr, axes=(-3, -2), norm='ortho')
            spectral_samples = z_fft.real + z_fft.imag
        c = spectral_samples.shape[-1]
        # power_spectrum: (*B, H, W, 1) or (*B, H, W, C)
        ps = power_spectrum[..., None, :, :, :]
        diff = -0.5 * jnp.square(spectral_samples).sum(-1) \
            * (jnp.exp(-ps).squeeze(-1) - 1.0) - 0.5 * c * ps.squeeze(-1)
        logprobs = logprobs + diff.sum(axis=(-2, -1))
    return logprobs


def gm_kl_div(rng: Array, gm_p: Dict[str, Array], gm_q: Dict[str, Array],
              n_samples: int = 32) -> Array:
    """MC estimate of KL(p || q) -> (*B, 1, H, W)."""
    samples = gm_to_sample(rng, gm_p, 1.0, n_samples=n_samples)
    kl = gm_logprob(gm_p, samples)[0] - gm_logprob(gm_q, samples)[0]
    return kl.mean(axis=-3, keepdims=True)


def gm_entropy(rng: Array, gm: Dict[str, Array], n_samples: int = 32) -> Array:
    samples = gm_to_sample(rng, gm, 1.0, n_samples=n_samples)
    return -gm_logprob(gm, samples)[0].mean(axis=-3, keepdims=True)


# ------------------------------------------------------------- temperature ----

def gm_temperature(gm: Dict[str, Array], temperature: float,
                   eps: float = 1e-6) -> Dict[str, Array]:
    """Sharpen/soften: logweights/T (+ logstd shift) — the mechanism the
    reference intended for ArcFlow's inference temperature
    (``gm_temperature``, gmflow_ops.py:1136-1144)."""
    gm = dict(gm)
    temperature = max(temperature, eps)
    gm['logweights'] = jax.nn.log_softmax(
        gm['logweights'] / temperature, axis=-4)
    if 'logstds' in gm:
        gm['logstds'] = gm['logstds'] + 0.5 * math.log(temperature)
    if 'gm_vars' in gm:
        gm['gm_vars'] = gm['gm_vars'] * temperature
    return gm


def gm_transpose_t_first(gm: Dict[str, Array]) -> Dict[str, Array]:
    """Video GM: (B, K, T, H, W, C) -> (B, T, K, H, W, C) (reference
    ``gm_transpose_t_first``)."""
    return {k: jnp.moveaxis(v, -4 - 1, -5) if v.ndim >= 5 else v
            for k, v in gm.items()}


# ------------------------------------------------- 1-D mixture inverse CDF ----

def gm1d_pdf_cdf(gm1d: Dict[str, Array], samples: Array
                 ) -> Tuple[Array, Array]:
    """1-D mixture pdf and [-1,1]-scaled cdf.

    gm1d: means/logweights (..., G, H, W), logstds broadcastable
    (..., 1, 1, 1); samples (..., N, H, W). Returns pdf, cdf (..., N, H, W).
    """
    logstds = gm1d['logstds'][..., None, :, :, :]
    stds = jnp.exp(logstds)
    logweights = gm1d['logweights'][..., None, :, :, :]
    weights = gm1d.get('gm_weights')
    weights = jnp.exp(logweights) if weights is None \
        else weights[..., None, :, :, :]
    norm_diffs = (samples[..., :, None, :, :]
                  - gm1d['means'][..., None, :, :, :]) / stds
    pdf = jnp.exp(-0.5 * jnp.square(norm_diffs) - logstds
                  + logweights).sum(-3) / math.sqrt(2 * math.pi)
    cdf = (weights * jax.lax.erf(norm_diffs / SQRT2)).sum(-3)
    return pdf, cdf


def gm1d_inverse_cdf(gm1d: Dict[str, Array], scaled_cdfs: Array,
                     n_steps: int = 8, eps: float = 1e-6,
                     max_step_size: float = 1.5,
                     gaussian_samples: Optional[Array] = None,
                     backward_steps: int = 2,
                     use_pallas: Optional[bool] = None) -> Array:
    """Invert the 1-D mixture CDF by Newton-Raphson.

    Mirrors the reference's two-tier design (CUDA kernel for the first
    ``n_steps - backward_steps`` iterations under stop-gradient + a
    differentiable fallback for the last ``backward_steps``;
    reference gmflow_ops.py:102-145): here the no-grad portion runs the
    Pallas TPU kernel when available, else a jitted fori_loop.

    Args:
        scaled_cdfs: target CDF values in [-1, 1], shape (..., N, H, W).
    Returns samples (..., N, H, W).
    """
    means = gm1d['means']
    logweights = gm1d['logweights']
    weights = gm1d.get('gm_weights', jnp.exp(logweights))
    logstds = gm1d['logstds']
    stds = jnp.exp(logstds)

    # isotropic proxy for initialization
    w = weights
    mean = (w * means).sum(-3, keepdims=True)              # (...,1,H,W)
    var = (w * jnp.square(means - mean)).sum(-3, keepdims=True) \
        + jnp.square(stds)
    if gaussian_samples is None:
        gaussian_samples = jax.lax.erf_inv(
            jnp.clip(scaled_cdfs, -1 + eps, 1 - eps)) * SQRT2
    init = gaussian_samples * jnp.sqrt(var) + mean

    nograd_steps = max(n_steps - backward_steps, 0)
    clamp = max_step_size * stds

    def nr_step(samples):
        pdf, cdf = gm1d_pdf_cdf(
            dict(means=means, logstds=logstds, logweights=logweights,
                 gm_weights=weights), samples)
        delta = 0.5 * (cdf - scaled_cdfs) / jnp.maximum(pdf, eps)
        return samples - jnp.clip(delta, -clamp, clamp)

    samples = init
    if nograd_steps > 0:
        if use_pallas is None:
            use_pallas = jax.default_backend() == 'tpu'
        if use_pallas:
            from .inverse_cdf import gm1d_inverse_cdf_pallas
            samples = gm1d_inverse_cdf_pallas(
                means, logweights, weights, logstds, scaled_cdfs, samples,
                n_steps=nograd_steps, eps=eps, max_step_size=max_step_size)
        else:
            samples = jax.lax.fori_loop(
                0, nograd_steps, lambda i, s: nr_step(s), samples)
        samples = jax.lax.stop_gradient(samples)

    # differentiable refinement (reference runs n_steps more here; we follow)
    for _ in range(n_steps if backward_steps > 0 else 0):
        samples = nr_step(samples)
    return samples


# ----------------------------------------------- Knothe-Rosenblatt transport ----

def _kr_eigvecs(gm, axis_aligned: bool):
    gaussian, _ = gm_to_gaussian(gm)
    covs = gaussian['cov']                                  # (*B,H,W,C,C)
    if axis_aligned:
        covs = covs.mean(axis=(-4, -3), keepdims=True)      # (*B,1,1,C,C)
    _, eigvecs = jnp.linalg.eigh(covs)
    return jax.lax.stop_gradient(eigvecs[..., ::-1])        # descending order


def gm_samples_to_gaussian_samples(gm: Dict[str, Array], gm_samples: Array,
                                   n_axes: Optional[int] = None,
                                   eps: float = 1e-6,
                                   rng: Optional[Array] = None,
                                   axis_aligned: bool = True) -> Array:
    """KR transport GM -> standard Gaussian (reference
    gmflow_ops.py:889-983): rotate onto the mixture covariance eigenbasis,
    then per axis apply the conditional 1-D CDF followed by the standard
    normal inverse CDF.

    gm_samples: (*B, N, H, W, C) -> gaussian samples of the same shape.
    """
    assert 'covs' not in gm
    means = gm['means']                                     # (*B,K,H,W,C)
    c = means.shape[-1]
    if n_axes is None:
        n_axes = c
    eigvecs = _kr_eigvecs(gm, axis_aligned)                 # (*B,1|H,1|W,C,C)
    ev = eigvecs[..., :n_axes]

    # rotate means/samples: (*B,K|N,H,W,C) @ (C,C)
    means_rot = jnp.einsum('...khwc,...hwcd->...khwd', means, ev)
    samples_rot = jnp.einsum('...nhwc,...hwcd->...nhwd', gm_samples, ev)

    stds = jnp.exp(gm['logstds'])                           # (*B,1,1,1,1)
    # (*B,N,K,H,W,A)
    norm_diffs = (samples_rot[..., :, None, :, :, :]
                  - means_rot[..., None, :, :, :, :]) / stds[..., None, :, :, :, :]
    nd_sq = jnp.square(norm_diffs)
    nd_sq_cum = jnp.cumsum(nd_sq[..., :-1], axis=-1)        # (*B,N,K,H,W,A-1)
    lw = gm['logweights'][..., None, :, :, :, :]            # (*B,1,K,H,W,1)
    slice_logw = lw - 0.5 * nd_sq_cum
    slice_w = jax.nn.softmax(slice_logw, axis=-4)
    w0 = jnp.broadcast_to(_gm_weights(gm)[..., None, :, :, :, :],
                          slice_w.shape[:-1] + (1,))
    slice_w = jnp.concatenate([w0, slice_w], axis=-1)       # (*B,N,K,H,W,A)

    cdf = (slice_w * jax.lax.erf(norm_diffs / SQRT2)).sum(-4)  # (*B,N,H,W,A)
    out_rot = jax.lax.erf_inv(jnp.clip(cdf, -1 + eps, 1 - eps)) * SQRT2

    if n_axes < c:
        assert rng is not None, 'rng needed when n_axes < channels'
        tail = jax.random.normal(rng, out_rot.shape[:-1] + (c - n_axes,),
                                 out_rot.dtype)
        out_rot = jnp.concatenate([out_rot, tail], axis=-1)

    if axis_aligned:
        return out_rot
    return jnp.einsum('...nhwd,...hwcd->...nhwc', out_rot, eigvecs)


def gaussian_samples_to_gm_samples(gm: Dict[str, Array],
                                   gaussian_samples: Array,
                                   n_axes: Optional[int] = None,
                                   n_steps: int = 16, backward_steps: int = 0,
                                   eps: float = 1e-6,
                                   rng: Optional[Array] = None,
                                   axis_aligned: bool = True,
                                   use_pallas: Optional[bool] = None) -> Array:
    """KR transport standard Gaussian -> GM (reference
    gmflow_ops.py:997-1124): per eigen-axis, numerically invert the
    conditional 1-D mixture CDF chain.

    gaussian_samples: (*B, N, H, W, C) -> GM samples of the same shape.
    """
    assert 'covs' not in gm
    means = gm['means']
    c = means.shape[-1]
    if n_axes is None:
        n_axes = c
    eigvecs = _kr_eigvecs(gm, axis_aligned)
    ev = eigvecs[..., :n_axes]

    means_rot = jnp.einsum('...khwc,...hwcd->...khwd', means, eigvecs)
    if axis_aligned:
        samples_rot = gaussian_samples
    else:
        samples_rot = jnp.einsum('...nhwc,...hwcd->...nhwd',
                                 gaussian_samples, ev)

    stds = jnp.exp(gm['logstds'])                            # (*B,1,1,1,1)
    logstds_b = gm['logstds'].squeeze(-1)                    # (*B,1,1,1)
    uniform = jax.lax.erf(samples_rot / SQRT2)               # (*B,N,H,W,A)

    # per-axis chain; axis 0 uses the marginal weights, later axes use
    # conditional slice weights from all previous axes
    lw0 = gm['logweights'].squeeze(-1)                       # (*B,K,H,W)
    out_axes = []
    nd_sq_cum = 0.0
    last = None
    lw_cur = lw0[..., None, :, :, :]                         # (*B,1,K,H,W)
    for axis_id in range(n_axes):
        m_axis = means_rot[..., axis_id]                     # (*B,K,H,W)
        if axis_id > 0:
            prev_m = means_rot[..., axis_id - 1][..., None, :, :, :]
            nd_prev = (last[..., :, None, :, :] - prev_m) / stds.squeeze(-1)[
                ..., None, :, :, :]
            nd_sq_cum = nd_sq_cum + jnp.square(nd_prev)
            lw_cur = jax.nn.log_softmax(
                lw0[..., None, :, :, :] - 0.5 * nd_sq_cum, axis=-3)
        gm1d = dict(
            means=m_axis if axis_id == 0 else m_axis[..., None, :, :, :],
            logstds=logstds_b if axis_id == 0
            else logstds_b[..., None, :, :, :],
            logweights=lw0 if axis_id == 0 else lw_cur)
        if axis_id == 0:
            tgt = uniform[..., axis_id]                      # (*B,N,H,W)
            gs = samples_rot[..., axis_id]
        else:
            # fold the sample axis into the batch so per-sample conditional
            # weights broadcast (reference does the same via shape juggling)
            tgt = uniform[..., axis_id][..., :, None, :, :]  # (*B,N,1,H,W)
            gs = samples_rot[..., axis_id][..., :, None, :, :]
        s = gm1d_inverse_cdf(gm1d, tgt, n_steps=n_steps, eps=eps,
                             max_step_size=1.5, gaussian_samples=gs,
                             backward_steps=backward_steps,
                             use_pallas=use_pallas)
        last = s if axis_id == 0 else s.squeeze(-3)
        out_axes.append(last)

    out_rot = jnp.stack(out_axes, axis=-1)                   # (*B,N,H,W,A)

    if n_axes < c:
        assert rng is not None, 'rng needed when n_axes < channels'
        prev_m = means_rot[..., n_axes - 1][..., None, :, :, :]
        nd_prev = (last[..., :, None, :, :] - prev_m) / stds.squeeze(-1)[
            ..., None, :, :, :]
        nd_sq_cum = nd_sq_cum + jnp.square(nd_prev)
        lw_tail = jax.nn.log_softmax(
            lw0[..., None, :, :, :] - 0.5 * nd_sq_cum, axis=-3)
        # sample remaining channels from the conditional mixture: categorical
        # over K with per-sample weights, then gaussian reparam
        logits = jnp.moveaxis(lw_tail, -3, -1)               # (*B,N,H,W,K)
        rng_c, rng_n = jax.random.split(rng)
        inds = jax.random.categorical(rng_c, logits, axis=-1)
        one_hot = jax.nn.one_hot(inds, means.shape[-4], axis=-1)
        tail_means = jnp.einsum('...nhwk,...khwa->...nhwa', one_hot,
                                means_rot[..., n_axes:])
        noise = jax.random.normal(rng_n, tail_means.shape, tail_means.dtype)
        tail = tail_means + jnp.exp(gm['logstds']).squeeze(-4)[
            ..., None, :, :, :] * noise
        out_rot = jnp.concatenate([out_rot, tail], axis=-1)

    return jnp.einsum('...nhwd,...hwcd->...nhwc', out_rot, eigvecs)
