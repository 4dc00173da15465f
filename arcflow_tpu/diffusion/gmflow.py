"""GMFlow: Gaussian-mixture flow matching (prior work retained by the
reference; ``lakonlab/models/diffusions/gmflow.py``).

The denoiser outputs a full mixture over the velocity field
``{means (B,K,H,W,C), logstds, logweights (B,K,H,W,1)}``. Training regresses
the *transition* distribution x_{t_low} | x_{t_high} (GM NLL); sampling runs
GM-SDE/ODE steps with optional probabilistic CFG, posterior-mean substeps and
a 2nd-order mean correction.

Functional redesign: the 2nd-order cache (reference mutable ``self.prev_*``,
gmflow.py:361-365) is a scan carry; probabilistic CFG keeps the uniform 2B
batch; all sampling steps compile into one lax.scan body.
"""

from __future__ import annotations

import copy
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.gm import (gaussian_samples_to_gm_samples, gm_mul_iso_gaussian,
                      gm_to_iso_gaussian, gm_to_mean, gm_to_sample,
                      iso_gaussian_mul_iso_gaussian)
from ..registry import MODULES, build_module
from .gaussian_flow import GaussianFlow, _bview

Array = jax.Array


def probabilistic_guidance(cond_mean: Array, total_var: Array,
                           uncond_mean: Array, guidance_scale: float,
                           orthogonal: float = 1.0,
                           orthogonal_axis: Optional[Array] = None):
    """Variance-calibrated CFG bias (reference ``probabilistic_guidance_jit``,
    gmflow.py:20-40). guidance_scale in (0, 1)."""
    dims = tuple(range(1, cond_mean.ndim))
    bias = cond_mean - uncond_mean
    if orthogonal > 0.0:
        axis = cond_mean if orthogonal_axis is None else orthogonal_axis
        proj = (bias * axis).mean(dims, keepdims=True) / jnp.maximum(
            (axis * axis).mean(dims, keepdims=True), 1e-6)
        bias = bias - proj * axis * orthogonal
    bias_power = jnp.square(bias).mean(dims, keepdims=True)
    avg_var = total_var.mean(dims, keepdims=True)
    bias = bias * (jnp.sqrt(avg_var / jnp.maximum(bias_power, 1e-6))
                   * guidance_scale)
    gaussian = dict(mean=cond_mean + bias,
                    var=total_var * (1 - guidance_scale ** 2))
    return gaussian, bias, avg_var


def gmflow_posterior(gm_x0: Dict[str, Array], x_t: Array, x_t_src: Array,
                     sigma_t: Array, sigma_t_src: Array, eps: float = 1e-6
                     ) -> Dict[str, Array]:
    """Bayes-fuse an x0-space GM with the bridge Gaussian implied by having
    observed both x_{t_src} and x_t (reference ``gmflow_posterior_jit``,
    gmflow.py:43-74). sigmas are (B,)."""
    nd = x_t.ndim
    s_src = _bview(sigma_t_src, nd)
    s_t = _bview(sigma_t, nd)
    a_src = 1 - s_src
    a_t = 1 - s_t
    denom = jnp.maximum(jnp.square(a_t) * jnp.square(s_src)
                        - jnp.square(a_src) * jnp.square(s_t), eps)
    g_mean = (a_t * jnp.square(s_src) * x_t
              - a_src * jnp.square(s_t) * x_t_src) / denom
    g_var = jnp.square(s_t) * jnp.square(s_src) / denom

    gaussian = dict(mean=g_mean, var=g_var[..., :1])
    return gm_mul_iso_gaussian(gm_x0, gaussian, 1.0, 1.0, eps=eps)[0]


def gmflow_posterior_mean(gm_x0, x_t, x_t_src, sigma_t, sigma_t_src,
                          eps: float = 1e-6) -> Array:
    return gm_to_mean(gmflow_posterior(gm_x0, x_t, x_t_src, sigma_t,
                                       sigma_t_src, eps=eps))


@MODULES.register_module()
class GMFlow(GaussianFlow):

    def __init__(self, *args, spectrum_net=None, spectral_loss_weight=1.0,
                 **kwargs):
        super().__init__(*args, **kwargs)
        self.spectrum_net = build_module(spectrum_net)
        self.spectral_loss_weight = spectral_loss_weight

    # ---- param plumbing: optionally a {'denoising','spectrum_net'} dict ----
    @staticmethod
    def _split_params(params):
        if isinstance(params, dict) and 'denoising' in params:
            return params['denoising'], params.get('spectrum_net')
        return params, None

    def pred(self, params, x_t, t, **kwargs):
        den_params, _ = self._split_params(params)
        return super().pred(den_params, x_t, t, **kwargs)

    # ---- GM-space conversions ------------------------------------------------
    def u_to_x_0(self, denoising_output, x_t, t=None, sigma=None,
                 eps: float = 1e-6):
        """Velocity-space GM/Gaussian/sample -> x0 space (reference
        GMFlowMixin.u_to_x_0)."""
        if sigma is None:
            sigma = jnp.asarray(t, jnp.float32) / self.num_timesteps
        if isinstance(denoising_output, dict) and \
                'logweights' in denoising_output:
            s = _bview(sigma, x_t.ndim)[..., None, :, :, :]
            means = x_t[..., None, :, :, :] - s * denoising_output['means']
            logstds = denoising_output['logstds'] \
                + jnp.log(jnp.maximum(s, eps))
            return dict(means=means, logstds=logstds,
                        logweights=denoising_output['logweights'])
        if isinstance(denoising_output, dict):
            s = _bview(sigma, x_t.ndim)
            return dict(mean=x_t - s * denoising_output['mean'],
                        var=denoising_output['var'] * jnp.square(s))
        s = _bview(sigma, x_t.ndim)
        return x_t - s * denoising_output

    def reverse_transition(self, denoising_output, x_t_high, sigma_low,
                           sigma_high, rng: Optional[Array] = None,
                           eps: float = 1e-6, prediction_type: str = 'u'):
        """Reverse bridge x_{t_low} | x_{t_high}, x0-estimate (reference
        ``reverse_transition``, gmflow.py:198-258). sigmas are (B,)."""
        nd = x_t_high.ndim
        sigma = _bview(sigma_high, nd)
        sigma_to = _bview(sigma_low, nd)
        alpha = 1 - sigma
        alpha_to = 1 - sigma_to
        r_sig = sigma_to / jnp.maximum(sigma, eps)
        r_alp = alpha / jnp.maximum(alpha_to, eps)
        beta_over_sigma_sq = 1 - jnp.square(r_sig * r_alp)
        c1 = jnp.square(r_sig) * r_alp
        c2 = beta_over_sigma_sq * alpha_to

        if isinstance(denoising_output, dict):
            x_high = x_t_high[..., None, :, :, :]
            c1k, c2k = c1[..., None, :, :, :], c2[..., None, :, :, :]
            c3 = (beta_over_sigma_sq * jnp.square(sigma_to))[..., None, :, :, :]
            sk = sigma[..., None, :, :, :]
            if prediction_type == 'u':
                means_x0 = x_high - sk * denoising_output['means']
                logstds = jnp.logaddexp(
                    2 * (denoising_output['logstds']
                         + jnp.log(jnp.maximum(sk * c2k, eps))),
                    jnp.log(jnp.maximum(c3, eps))) / 2
            elif prediction_type == 'x0':
                means_x0 = denoising_output['means']
                logstds = jnp.logaddexp(
                    2 * (denoising_output['logstds']
                         + jnp.log(jnp.maximum(c2k, eps))),
                    jnp.log(jnp.maximum(c3, eps))) / 2
            else:
                raise ValueError(f'invalid prediction_type {prediction_type}')
            return dict(means=c1k * x_high + c2k * means_x0,
                        logstds=logstds,
                        logweights=denoising_output['logweights'])

        assert rng is not None, 'sample-mode reverse transition needs rng'
        c3_sqrt = jnp.sqrt(jnp.maximum(beta_over_sigma_sq, 0.0)) * sigma_to
        x_0 = x_t_high - sigma * denoising_output if prediction_type == 'u' \
            else denoising_output
        noise = jax.random.normal(rng, x_t_high.shape, jnp.float32)
        return c1 * x_t_high + c2 * x_0 + c3_sqrt * noise

    # ---- training ---------------------------------------------------------------
    def transition_loss(self, denoising_output, x_t_low, x_t_high, t_low,
                        t_high):
        gm_low = self.reverse_transition(
            denoising_output, x_t_high, t_low / self.num_timesteps,
            t_high / self.num_timesteps)
        loss_kwargs = dict(gm_low)
        loss_kwargs.update(x_t_low=x_t_low, timesteps=t_high)
        return self.flow_loss(loss_kwargs)

    def spectral_loss(self, spec_params, denoising_output, x_0, x_t, t,
                      eps: float = 1e-6):
        """Spectrum-net NLL on KR-whitened residuals (reference
        ``spectral_loss``, gmflow.py:398-418)."""
        inv_sigma = self.num_timesteps / jnp.maximum(
            _bview(jnp.asarray(t, jnp.float32), x_t.ndim), eps)
        gauss_x0 = self.u_to_x_0(gm_to_iso_gaussian(denoising_output)[0],
                                 x_t, t)
        u = (x_t - x_0) * inv_sigma
        z_kr = jax.lax.stop_gradient(
            gm_samples_to_gaussian_samples_cl(denoising_output, u))
        z_fft = jnp.fft.fft2(z_kr, axes=(-3, -2), norm='ortho')
        z = z_fft.real + z_fft.imag
        log_var = self.spectrum_net.apply({'params': spec_params},
                                          gauss_x0['mean'], gauss_x0['var'])
        loss = jnp.square(z) * (jnp.exp(-log_var) - 1) + log_var
        return loss.mean() * (0.5 * self.spectral_loss_weight)

    def forward_train(self, params, rng, x_0, **kwargs):
        den_params, spec_params = self._split_params(params)
        num_batches = x_0.shape[0]
        seq_len = int(np.prod(x_0.shape[1:-1])) if x_0.ndim > 2 else None
        trans_ratio = self.train_cfg.get('trans_ratio', 1.0)
        eps = self.train_cfg.get('eps', 1e-4)

        rng_t, rng_n0, rng_n1 = jax.random.split(rng, 3)
        t_high = jnp.clip(self.timestep_sampler(rng_t, num_batches,
                                                seq_len=seq_len),
                          eps, self.num_timesteps)
        t_low = jnp.clip(jnp.minimum(t_high * (1 - trans_ratio),
                                     t_high - eps), 0.0, None)

        noise_0 = jax.random.normal(rng_n0, x_0.shape, jnp.float32)
        x_t_low, _, _ = self.sample_forward_diffusion(x_0, t_low, noise_0)
        x_t_high = self.sample_forward_transition(
            rng_n1, x_t_low, t_low / self.num_timesteps,
            t_high / self.num_timesteps)

        denoising_output = super().pred(den_params, x_t_high, t_high, **kwargs)
        loss, log_info = self.transition_loss(
            denoising_output, x_t_low, x_t_high, t_low, t_high)
        log_vars = dict(loss_transition=loss, **log_info)

        if self.spectrum_net is not None:
            loss_spectral = self.spectral_loss(
                spec_params, denoising_output, x_0, x_t_high, t_high)
            log_vars['loss_spectral'] = loss_spectral
            loss = loss + loss_spectral

        log_vars['loss_diffusion'] = loss
        return loss, log_vars

    # ---- CFG in GM space ------------------------------------------------------
    def _apply_probabilistic_cfg(self, gm_x0, num_batches, guidance_scale,
                                 orthogonal):
        gm_uncond = {k: v[:num_batches] for k, v in gm_x0.items()}
        gm_cond = {k: v[num_batches:] for k, v in gm_x0.items()}
        uncond_mean = gm_to_mean(gm_uncond)
        gaussian_cond = gm_to_iso_gaussian(gm_cond)[0]
        gaussian_cond['var'] = gaussian_cond['var'].mean(
            axis=(-3, -2), keepdims=True)
        gaussian_out, cfg_bias, avg_var = probabilistic_guidance(
            gaussian_cond['mean'], gaussian_cond['var'], uncond_mean,
            guidance_scale, orthogonal=orthogonal)
        gm_out = gm_mul_iso_gaussian(
            gm_cond,
            iso_gaussian_mul_iso_gaussian(gaussian_out, gaussian_cond, 1, -1),
            1, 1)[0]
        return gm_out, gaussian_out, gm_cond, gaussian_cond, cfg_bias, avg_var

    # ---- sampling ----------------------------------------------------------------
    def forward_test(self, params, rng, noise, guidance_scale: float = 0.0,
                     test_cfg_override=None, **kwargs):
        """GM-SDE/ODE sampling (reference forward_test, gmflow.py:467-622).

        Order-2 correction and posterior-mean substeps supported; the
        second-order cache rides the scan carry.
        """
        den_params, spec_params = self._split_params(params)
        cfg = copy.deepcopy(self.test_cfg)
        cfg.update(test_cfg_override or {})

        output_mode = cfg.get('output_mode', 'mean')
        num_timesteps = cfg.get('num_timesteps', 32)
        num_substeps = cfg.get('num_substeps', 1)
        orthogonal = cfg.get('orthogonal_guidance', 1.0)
        order = cfg.get('order', 1)
        ca, cb = cfg.get('gm2_coefs', [0.005, 1.0])
        use_guidance = 0.0 < guidance_scale < 1.0
        assert order in (1, 2)

        scheduler = self.build_test_scheduler(cfg)
        seq_len = int(np.prod(noise.shape[1:-1])) if noise.ndim > 2 else None
        sigmas = jnp.asarray(scheduler.set_timesteps(
            num_timesteps * num_substeps, seq_len=seq_len))

        num_batches = noise.shape[0]
        x = jnp.asarray(noise, jnp.float32)
        ori_dtype = noise.dtype
        k_comp = None  # inferred at first pred

        def gm_zero_like(gm):
            return jax.tree.map(jnp.zeros_like, gm)

        def step(carry, step_id):
            x, rng, prev = carry
            rng, rng_step = jax.random.split(rng)
            idx = step_id * num_substeps
            sigma = sigmas[idx]
            t = jnp.broadcast_to(sigma * self.num_timesteps, (num_batches,))

            x_in, t_in = x, t
            if use_guidance:
                x_in = jnp.concatenate([x, x], axis=0)
                t_in = jnp.concatenate([t, t], axis=0)
            gm_u = super(GMFlow, self).pred(den_params, x_in, t_in, **kwargs)
            gm_u = {k: jnp.asarray(v, jnp.float32) for k, v in gm_u.items()}
            gm_x0 = self.u_to_x_0(gm_u, x_in, t_in)

            if use_guidance:
                (gm_out, gaussian_out, gm_cond, gaussian_cond, cfg_bias,
                 avg_var) = self._apply_probabilistic_cfg(
                    gm_x0, num_batches, guidance_scale, orthogonal)
            else:
                gm_out = gm_x0
                gaussian_out = gm_to_iso_gaussian(gm_out)[0]
                gm_cond = gaussian_cond = cfg_bias = avg_var = None

            if order == 2:
                gm_out, gaussian_out = self._gm_2nd_order(
                    gm_out, gaussian_out, x, sigma, step_id, sigmas,
                    num_substeps, prev,
                    guidance_scale if use_guidance else 0.0,
                    gm_cond, gaussian_cond, avg_var, cfg_bias, ca, cb)
                prev = dict(gm=gm_out, x_t=x, sigma=sigma,
                            h=sigma - sigmas[jnp.minimum(
                                idx + num_substeps, len(sigmas) - 1)],
                            valid=jnp.ones(()))

            # substep 0: model output from the (possibly corrected) GM
            if output_mode == 'mean':
                model_output = gm_to_mean(gm_out)
            else:
                model_output = gm_to_sample(rng_step, gm_out,
                                            n_samples=1).squeeze(1)
            x_new = scheduler.step(model_output, x, sigma, sigmas[idx + 1],
                                   prediction_type='x0', rng=rng_step)
            # posterior-mean substeps
            x_base, sigma_base = x, sigma
            for sub in range(1, num_substeps):
                s_sub = sigmas[idx + sub]
                model_output = gmflow_posterior_mean(
                    gm_out, x_new, x_base,
                    jnp.broadcast_to(s_sub, (num_batches,)),
                    jnp.broadcast_to(sigma_base, (num_batches,)))
                x_new = scheduler.step(model_output, x_new, s_sub,
                                       sigmas[idx + sub + 1],
                                       prediction_type='x0', rng=rng_step)
            return (x_new, rng, prev), None

        # order-2 needs a GM-shaped cache in the carry; build a zero one via
        # abstract shape evaluation (no compute)
        if order == 2:
            x_guided = jnp.concatenate([x, x], axis=0) if use_guidance else x
            n_g = x_guided.shape[0]
            gm_shape = jax.eval_shape(
                lambda p, xx, tt: super(GMFlow, self).pred(p, xx, tt, **kwargs),
                den_params, x_guided, jnp.zeros((n_g,)))
            gm0 = {k: jnp.zeros(v.shape, jnp.float32)
                   for k, v in gm_shape.items()}
            gm0 = self.u_to_x_0(gm0, x_guided, jnp.zeros((n_g,)))
            if use_guidance:   # cache holds the conditional-half GM
                gm0 = {k: v[:num_batches] for k, v in gm0.items()}
            prev0 = dict(gm=gm_zero_like(gm0), x_t=jnp.zeros_like(x),
                         sigma=jnp.zeros(()), h=jnp.ones(()),
                         valid=jnp.zeros(()))
        else:
            prev0 = 0.0   # placeholder carry leaf; never touched at order 1

        (x, _, _), _ = jax.lax.scan(step, (x, rng, prev0),
                                    jnp.arange(num_timesteps))
        return x.astype(ori_dtype)

    def _gm_2nd_order(self, gm_out, gaussian_out, x_t, sigma, step_id, sigmas,
                      num_substeps, prev, guidance_scale, gm_cond,
                      gaussian_cond, avg_var, cfg_bias, ca, cb):
        """2nd-order mean correction fused with the CFG bias (reference
        ``gm_2nd_order``, gmflow.py:288-359). ``prev['valid']`` gates the
        correction on the first step (branchless)."""
        dims = tuple(range(1, x_t.ndim))
        if cfg_bias is not None:
            gm_mean = gm_to_mean(gm_out)
            base_gaussian = gaussian_cond
            base_gm = gm_cond
        else:
            gm_mean = gaussian_out['mean']
            base_gaussian = dict(
                mean=gaussian_out['mean'],
                var=gaussian_out['var'].mean(axis=(-3, -2), keepdims=True))
            avg_var = base_gaussian['var'].mean(dims, keepdims=True)
            base_gm = gm_out
            cfg_bias = jnp.zeros_like(gm_mean)

        b = x_t.shape[0]
        mean_from_prev = gmflow_posterior_mean(
            prev['gm'], x_t, prev['x_t'],
            jnp.broadcast_to(sigma, (b,)),
            jnp.broadcast_to(prev['sigma'], (b,)))

        h = sigma - sigmas[jnp.minimum((step_id + 1) * num_substeps,
                                       len(sigmas) - 1)]
        k = 0.5 * h / jnp.maximum(prev['h'], 1e-8)
        prev_h_norm = prev['h']
        gs = guidance_scale * cb
        err_power = avg_var * (gs * gs + ca)
        scale = jnp.sqrt(jnp.clip(
            1 - err_power / jnp.maximum(prev_h_norm ** 2, 1e-12), 0.0, None)) * k
        mean_diff = (gm_mean - mean_from_prev) * scale
        mean_diff = mean_diff * prev['valid']   # first step: no correction

        bias = mean_diff + cfg_bias
        bias_power = jnp.square(bias).mean(dims, keepdims=True)
        bias = bias * jnp.sqrt(jnp.minimum(
            avg_var / jnp.maximum(bias_power, 1e-6), 1.0))
        gaussian_new = dict(
            mean=base_gaussian['mean'] + bias,
            var=base_gaussian['var'] * jnp.maximum(
                1 - bias_power / jnp.maximum(avg_var, 1e-6), 1e-6))
        gm_new = gm_mul_iso_gaussian(
            base_gm,
            iso_gaussian_mul_iso_gaussian(gaussian_new, base_gaussian, 1, -1),
            1, 1)[0]
        return gm_new, gaussian_new

    # ---- teacher-style u query ---------------------------------------------------
    def forward_u(self, params, x_t, t, guidance_scale: float = 0.0,
                  test_cfg_override=None, **kwargs):
        den_params, _ = self._split_params(params)
        cfg = copy.deepcopy(self.test_cfg)
        cfg.update(test_cfg_override or {})
        orthogonal = cfg.get('orthogonal_guidance', 1.0)
        use_guidance = 0.0 < guidance_scale < 1.0

        x_in, t_in = x_t, t
        if use_guidance:
            x_in = jnp.concatenate([x_t, x_t], axis=0)
            t_in = jnp.concatenate([t, t], axis=0)
        gm_u = super().pred(den_params, x_in, t_in, **kwargs)
        gm_u = {k: jnp.asarray(v, jnp.float32) for k, v in gm_u.items()}
        if use_guidance:
            num_batches = x_t.shape[0]
            gm_x0 = self.u_to_x_0(gm_u, x_in, t_in)
            gm_out = self._apply_probabilistic_cfg(
                gm_x0, num_batches, guidance_scale, orthogonal)[0]
            # back to u space: u = (x_t - x0)/sigma
            sigma = _bview(jnp.asarray(t, jnp.float32) / self.num_timesteps,
                           x_t.ndim)
            return (x_t - gm_to_mean(gm_out)) / jnp.maximum(sigma, 1e-6)
        return gm_to_mean(gm_u)


def gm_samples_to_gaussian_samples_cl(gm_u, u):
    """Channel-last wrapper used by the spectral loss: u (B, H, W, C)."""
    from ..ops.gm import gm_samples_to_gaussian_samples
    return gm_samples_to_gaussian_samples(gm_u, u[:, None]).squeeze(1)
