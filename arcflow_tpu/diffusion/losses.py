"""Flow/diffusion training losses (pure functions of an outputs dict).

Equivalent capability to the reference loss stack
(``lakonlab/models/losses/diffusion_loss.py``): MSE with 0.5 factor and
constant rescale, Gaussian NLL, and GM NLL. Redesigned functionally:
``__call__(outputs) -> (scalar_loss, log_info)`` where ``log_info`` carries
per-sample losses/variances/timesteps for the host-side quartile EMA logger
(the reference mutates registered buffers + dist.all_gather inside the loss;
here logging state lives outside the jitted step).
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..registry import MODULES

Array = jax.Array


def _flatmean(x: Array) -> Array:
    """Mean over all non-batch dims -> (B,)."""
    return x.reshape(x.shape[0], -1).mean(axis=1)


def mse_loss(pred: Array, target: Array, weight: Optional[Array] = None) -> Array:
    err = jnp.square(jnp.asarray(pred, jnp.float32) - jnp.asarray(target, jnp.float32))
    if weight is not None:
        err = err * weight
    return _flatmean(err)


def gaussian_nll_loss(pred: Array, target: Array, logstd: Array,
                      weight: Optional[Array] = None, eps: float = 1e-4) -> Array:
    """0.5*((pred-target)/std)^2 + log std + const (reference diffusion_loss.py:13-18)."""
    inv_std = jnp.minimum(jnp.exp(-logstd), 1.0 / eps)
    diff_w = (pred - target) * inv_std
    loss = 0.5 * (jnp.square(diff_w) + math.log(2 * math.pi)) + logstd
    if weight is not None:
        loss = loss * weight
    return _flatmean(loss)


class _BaseDiffusionLoss:
    """Shared plumbing: data_info key remapping + constant rescale + reduction."""

    _default_data_info: Dict[str, str] = {}

    def __init__(self, rescale_mode='constant', rescale_cfg=None, data_info=None,
                 reduction='mean', loss_name='loss', log_cfgs=None, sampler=None,
                 weight=None):
        assert rescale_mode in ('constant',), \
            f'unsupported rescale_mode {rescale_mode}'
        rescale_cfg = rescale_cfg or dict(scale=1.0)
        self.scale = float(rescale_cfg.get('scale', 1.0))
        self.data_info = dict(data_info) if data_info is not None \
            else dict(self._default_data_info)
        assert reduction in ('mean', 'sum', 'none')
        self.reduction = reduction
        self.loss_name = loss_name
        self.log_cfgs = log_cfgs

    def _gather(self, outputs: Dict[str, Array]) -> Dict[str, Array]:
        return {k: outputs.get(v) for k, v in self.data_info.items()}

    def _reduce(self, per_sample: Array) -> Array:
        if self.reduction == 'mean':
            return per_sample.mean()
        if self.reduction == 'sum':
            return per_sample.sum()
        return per_sample

    def per_sample(self, outputs: Dict[str, Array]) -> Array:
        raise NotImplementedError

    def variance(self, outputs: Dict[str, Array]) -> Optional[Array]:
        """Per-sample predicted variance for quartile logging (or None)."""
        return None

    def __call__(self, outputs: Dict[str, Array]) -> Tuple[Array, Dict[str, Array]]:
        per_sample = self.per_sample(outputs) * self.scale
        log_info = {'per_sample_loss': jax.lax.stop_gradient(per_sample)}
        if 'timesteps' in outputs:
            log_info['timesteps'] = outputs['timesteps']
        var = self.variance(outputs)
        if var is not None:
            log_info['per_sample_var'] = jax.lax.stop_gradient(var)
        return self._reduce(per_sample), log_info


@MODULES.register_module()
class DiffusionMSELoss(_BaseDiffusionLoss):
    """0.5 * MSE with configurable pred/target mapping.

    The ArcFlow configs use ``data_info=dict(pred='u_t_pred', target='u_t')``
    and ``rescale_cfg=dict(scale=30)``
    (reference ``configs/flux/arcflux_2nfe_k16.py:51-55``).
    """

    _default_data_info = dict(pred='eps_t_pred', target='noise')

    def per_sample(self, outputs):
        d = self._gather(outputs)
        weight = outputs.get(self.data_info.get('weight')) \
            if 'weight' in self.data_info else outputs.get('weight')
        return 0.5 * mse_loss(d['pred'], d['target'], weight=weight)


@MODULES.register_module()
class DiffusionNLLLoss(_BaseDiffusionLoss):
    _default_data_info = dict(pred='u_t_pred', target='u_t', logstd='logstd')

    def per_sample(self, outputs):
        d = self._gather(outputs)
        weight = outputs.get('weight')
        return gaussian_nll_loss(d['pred'], d['target'], d['logstd'], weight=weight)

    def variance(self, outputs):
        logstd = outputs[self.data_info['logstd']]
        var = jnp.exp(2.0 * logstd)
        var = jnp.broadcast_to(var, outputs[self.data_info['pred']].shape)
        return _flatmean(var)


@MODULES.register_module()
class GMFlowNLLLoss(_BaseDiffusionLoss):
    """Negative log-likelihood of target under a Gaussian-mixture prediction.

    Mixture axis convention: (B, K, *data) like the rest of the framework
    (the reference uses (bs, *, K, c, h, w) with K at axis -4).
    """

    _default_data_info = dict(pred_means='means', target='u_t',
                              pred_logstds='logstds', pred_logweights='logweights')

    def per_sample(self, outputs):
        from ..ops.gm import gm_logprob
        d = self._gather(outputs)
        num_channels = d['pred_means'].shape[-1]
        gm = dict(means=d['pred_means'], logstds=d['pred_logstds'],
                  logweights=d['pred_logweights'])
        logprob, _ = gm_logprob(gm, d['target'][:, None])   # (B, 1, H, W)
        loss = -logprob.squeeze(1) / num_channels           # (B, H, W)
        weight = outputs.get('weight')
        if weight is not None:
            loss = loss * weight
        return _flatmean(loss)

    def variance(self, outputs):
        d = self._gather(outputs)
        w = jnp.exp(d['pred_logweights'])
        mean = (w * d['pred_means']).sum(axis=1, keepdims=True)
        var = (w * (jnp.square(d['pred_means'] - mean)
                    + jnp.exp(2.0 * d['pred_logstds']))).sum(axis=1)
        return _flatmean(var)
