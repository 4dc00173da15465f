"""Tiny CPU-debuggable denoisers for the 2-D toy path.

The reference keeps a minimal stack (checkerboard data + small MLP via
``Diffusion2D``, reference ``lakonlab/models/diffusion_2d.py``) as its
CPU-runnable smoke fixture; these play that role here — and double as the
unit-test denoisers for the flow/distillation math.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..registry import MODULES
from .layers import LoRADense

Array = jax.Array


def _trunk_dense(width: int) -> LoRADense:
    """fp32 LoRADense (rank 0 = plain Dense) for toy trunks: routing the toy
    MLPs through the SAME kernel the production models use makes the
    checkerboard stack a quality gate for the int8/w8a8 serving modes
    (quantize_weights_int8 only applies to LoRADense-read kernels)."""
    return LoRADense(width, dtype=jnp.float32)


def timestep_embedding(t: Array, dim: int, max_period: float = 10000.0) -> Array:
    """Standard sinusoidal embedding of (B,) timesteps -> (B, dim)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[:, None].astype(jnp.float32) * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def fourier_features(x: Array, n_freqs: int) -> Array:
    """NeRF-style positional features on raw coordinates (B, C) ->
    (B, C*2*n_freqs); empty when n_freqs=0.

    Plain MLPs underfit the high-frequency structure of multimodal 2-D
    targets (spectral bias): on the 4x4 checkerboard the raw-coordinate
    flow model plateaus at ~64% of samples in-support, with leaked mass
    deep inside wrong cells; with these features it resolves the cells.
    """
    if n_freqs <= 0:
        return jnp.zeros((*x.shape[:-1], 0), x.dtype)
    freqs = (2.0 ** jnp.arange(n_freqs, dtype=jnp.float32)) * jnp.pi
    ang = x[..., None].astype(jnp.float32) * freqs
    out = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    return out.reshape(*x.shape[:-1], -1).astype(x.dtype)


@MODULES.register_module()
class ToyMLPDenoiser(nn.Module):
    """MLP u-predictor for low-dimensional data (B, C)."""

    out_channels: int = 2
    hidden: Sequence[int] = (256, 256, 256)
    time_embed_dim: int = 64
    num_timesteps: int = 1000
    fourier_freqs: int = 0   # 0 keeps the legacy raw-coordinate input

    @nn.compact
    def __call__(self, x_t: Array, t: Array, **kwargs) -> Array:
        temb = timestep_embedding(t / self.num_timesteps * 1000.0,
                                  self.time_embed_dim)
        h = jnp.concatenate(
            [x_t, fourier_features(x_t, self.fourier_freqs), temb], axis=-1)
        for width in self.hidden:
            h = nn.silu(_trunk_dense(width)(h))
        return nn.Dense(self.out_channels)(h)


@MODULES.register_module()
class ToyGMFlowDenoiser(nn.Module):
    """MLP emitting a GMFlow velocity mixture for (B, H, W, C) data.

    Output: means (B, K, H, W, C), logstds (B, 1, 1, 1, 1) (learned global
    scalar, the GMFlow parameterization), logweights (B, K, H, W, 1).
    """

    out_channels: int = 2
    num_gaussians: int = 8
    hidden: Sequence[int] = (256, 256, 256)
    time_embed_dim: int = 64
    num_timesteps: int = 1000

    @nn.compact
    def __call__(self, x_t: Array, t: Array, **kwargs) -> dict:
        b = x_t.shape[0]
        hw = x_t.shape[1:3]
        k, c = self.num_gaussians, self.out_channels
        temb = timestep_embedding(t / self.num_timesteps * 1000.0,
                                  self.time_embed_dim)
        h = jnp.concatenate([x_t.reshape(b, -1), temb], axis=-1)
        for width in self.hidden:
            h = nn.silu(nn.Dense(width)(h))
        n_pix = hw[0] * hw[1]
        means = nn.Dense(k * n_pix * c, name='out_means')(h).reshape(
            b, k, *hw, c)
        logweights = jax.nn.log_softmax(
            nn.Dense(k * n_pix, kernel_init=nn.initializers.zeros,
                     name='out_logweights')(h).reshape(b, k, *hw, 1), axis=1)
        logstd = self.param('logstd', nn.initializers.constant(-1.0), (1,))
        logstds = jnp.broadcast_to(logstd.reshape(1, 1, 1, 1, 1),
                                   (b, 1, 1, 1, 1))
        return dict(means=means, logstds=logstds, logweights=logweights)


@MODULES.register_module()
class SpectrumMLP(nn.Module):
    """Predicts a log power spectrum from iso-Gaussian x0 stats (the
    reference's config-gated ``spectrum_net`` slot; no implementation ships
    with it, so this is the minimal functional filler)."""

    height: int = 1
    width: int = 1
    hidden: int = 128

    @nn.compact
    def __call__(self, mean: Array, var: Array) -> Array:
        b = mean.shape[0]
        c = mean.shape[-1]
        feat = jnp.concatenate([mean.reshape(b, -1), var.reshape(b, -1)],
                               axis=-1)
        h = nn.silu(nn.Dense(self.hidden)(feat))
        out = nn.Dense(self.height * self.width * c,
                       kernel_init=nn.initializers.zeros)(h)
        return out.reshape(b, self.height, self.width, c)


@MODULES.register_module()
class ToyArcFlowDenoiser(nn.Module):
    """MLP emitting ArcFlow mixture params for (B, C) data.

    Output dict matches the ArcFlux head contract
    (reference ``arcflow/arcflux.py:244-257``): means (B, K, C),
    logweights (B, K, 1) log-softmaxed over K, loggammas (B, K-1, 1) with the
    bias initialized to log-spaced rates in [0.2, 4.0]
    (reference ``arcflux.py:115-132``).
    """

    out_channels: int = 2
    num_gaussians: int = 8
    hidden: Sequence[int] = (256, 256, 256)
    time_embed_dim: int = 64
    num_timesteps: int = 1000
    fourier_freqs: int = 0   # 0 keeps the legacy raw-coordinate input
    # >0: insert an expert-choice MoE FFN (layers.MoEFeedForward, the same
    # module the DiT blocks use, params under a 'moe' scope for EP
    # placement) mid-trunk, treating the point batch as the routed sequence
    # — different checkerboard regions route to different experts. Makes
    # the toy path a TRAINED quality gate for MoE/EP
    # (tests/test_quantized_quality.py::test_moe_student_distillation_quality).
    moe_experts: int = 0
    moe_capacity_factor: float = 2.0

    @nn.compact
    def __call__(self, x_t: Array, t: Array, **kwargs) -> dict:
        k, c = self.num_gaussians, self.out_channels
        temb = timestep_embedding(t / self.num_timesteps * 1000.0,
                                  self.time_embed_dim)
        h = jnp.concatenate(
            [x_t, fourier_features(x_t, self.fourier_freqs), temb], axis=-1)
        for i, width in enumerate(self.hidden):
            h = nn.silu(_trunk_dense(width)(h))
            if self.moe_experts > 0 and i == len(self.hidden) // 2:
                from .layers import MoEFeedForward
                h = h + MoEFeedForward(
                    width, self.moe_experts,
                    capacity_factor=self.moe_capacity_factor, mult=2,
                    dtype=jnp.float32, name='moe')(h[None])[0]

        def gamma_bias_init(key, shape, dtype=jnp.float32):
            del key
            target = jnp.logspace(math.log10(0.2), math.log10(4.0), k - 1)
            return jnp.log(target).reshape(shape).astype(dtype)

        def means_bias_init(key, shape, dtype=jnp.float32):
            return 0.1 * jax.random.normal(key, shape, dtype)

        means = nn.Dense(k * c, kernel_init=nn.initializers.zeros,
                         bias_init=means_bias_init,
                         name='proj_out_means')(h).reshape(-1, k, c)
        logweights = nn.Dense(k, kernel_init=nn.initializers.zeros,
                              name='proj_out_logweights')(h).reshape(-1, k, 1)
        logweights = jax.nn.log_softmax(logweights, axis=1)
        loggammas = nn.Dense(k - 1, kernel_init=nn.initializers.zeros,
                             bias_init=gamma_bias_init,
                             name='proj_out_loggamma')(h).reshape(-1, k - 1, 1)
        return dict(means=means, logweights=logweights, loggammas=loggammas)
