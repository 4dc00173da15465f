"""Qwen-Image VAE (the Wan 2.1 3D-causal video VAE) in flax, image mode.

Behavioral equivalent of the reference's ``PretrainedVAEQwenImage``
(``lakonlab/models/architecture/diffusers/pretrained.py:104-149``), which
wraps diffusers ``AutoencoderKLQwenImage`` — the Wan 3D-causal VAE — and
runs it on single frames with per-channel latent mean/std normalization.

Image-mode reduction (exact, not an approximation): with a single frame and
an empty feature cache,

  * every ``WanCausalConv3d`` (kernel t=3, causal front zero-pad 2) sees
    inputs [0, 0, x0], so its output is the 2-D convolution with the *last*
    temporal kernel slice ``w[:, :, -1]``;
  * the temporal ``time_conv`` of every ``WanResample`` is skipped on the
    first frame (the torch code only applies it once a cache entry exists),
    so up/downsampling is spatial-only;

hence a 2-D network with temporally-sliced kernels reproduces the torch
model's single-frame output exactly. The weight converter
(``pipelines/convert.py:torch_qwen_vae_to_flax``) performs that slicing.

Geometry (Qwen/Qwen-Image vae/config.json): base_dim=96, z_dim=16,
dim_mult=(1,2,4,4), num_res_blocks=2, attn_scales=(), 8x spatial factor.
Channel-last (NHWC) throughout — XLA's native TPU conv layout.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..registry import MODULES

Array = jax.Array
Dtype = Any


class WanRMSNorm(nn.Module):
    """Channel RMS norm: x / ||x||_c * sqrt(c) * gamma (diffusers
    WanRMS_norm with channel_first semantics, translated to channel-last)."""

    dim: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        gamma = self.param('gamma', nn.initializers.ones, (self.dim,),
                           jnp.float32)
        xf = x.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True)) + 1e-12
        return (xf / norm * (self.dim ** 0.5) * gamma).astype(x.dtype)


class WanResidualBlock(nn.Module):
    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_dim = x.shape[-1]
        h = WanRMSNorm(in_dim, name='norm1')(x)
        h = nn.Conv(self.out_dim, (3, 3), padding=1, dtype=self.dtype,
                    name='conv1')(nn.silu(h))
        h = WanRMSNorm(self.out_dim, name='norm2')(h)
        h = nn.Conv(self.out_dim, (3, 3), padding=1, dtype=self.dtype,
                    name='conv2')(nn.silu(h))
        if in_dim != self.out_dim:
            x = nn.Conv(self.out_dim, (1, 1), dtype=self.dtype,
                        name='conv_shortcut')(x)
        return x + h


class WanAttentionBlock(nn.Module):
    """Single-head spatial self-attention with fused qkv 1x1 conv."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        res = x
        x = WanRMSNorm(c, name='norm')(x)
        qkv = nn.Conv(c * 3, (1, 1), dtype=self.dtype, name='to_qkv')(x)
        q, k, v = jnp.split(qkv.reshape(b, h * w, 3 * c), 3, axis=-1)
        attn = jax.nn.dot_product_attention(
            q[:, :, None], k[:, :, None], v[:, :, None]).squeeze(2)
        out = nn.Conv(c, (1, 1), dtype=self.dtype, name='proj')(
            attn.reshape(b, h, w, c))
        return res + out


class WanMidBlock(nn.Module):
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = WanResidualBlock(self.dim, dtype=self.dtype, name='resnets_0')(x)
        x = WanAttentionBlock(self.dim, dtype=self.dtype,
                              name='attentions_0')(x)
        x = WanResidualBlock(self.dim, dtype=self.dtype, name='resnets_1')(x)
        return x


class WanDownsample(nn.Module):
    """Spatial 2x downsample (the temporal path is first-frame-skipped)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(self.dim, (3, 3), strides=2, padding='VALID',
                       dtype=self.dtype, name='resample_conv')(x)


class WanUpsample(nn.Module):
    """Nearest 2x + conv to dim//2 (Wan's upsample halves the width)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), 'nearest')
        return nn.Conv(self.dim // 2, (3, 3), padding=1, dtype=self.dtype,
                       name='resample_conv')(x)


class QwenVAEEncoder(nn.Module):
    base_dim: int = 96
    z_dim: int = 16
    dim_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        dims = [self.base_dim * u for u in (1,) + tuple(self.dim_mult)]
        h = nn.Conv(dims[0], (3, 3), padding=1, dtype=self.dtype,
                    name='conv_in')(x)
        # flat down_blocks list mirroring diffusers WanEncoder3d ordering:
        # [res x num_res_blocks, resample] per stage, no resample on last
        idx = 0
        for i, (in_dim, out_dim) in enumerate(zip(dims[:-1], dims[1:])):
            for _ in range(self.num_res_blocks):
                h = WanResidualBlock(out_dim, dtype=self.dtype,
                                     name=f'down_blocks_{idx}')(h)
                idx += 1
            if i != len(self.dim_mult) - 1:
                h = WanDownsample(out_dim, dtype=self.dtype,
                                  name=f'down_blocks_{idx}')(h)
                idx += 1
        h = WanMidBlock(dims[-1], dtype=self.dtype, name='mid_block')(h)
        h = WanRMSNorm(dims[-1], name='norm_out')(h)
        return nn.Conv(self.z_dim * 2, (3, 3), padding=1, dtype=self.dtype,
                       name='conv_out')(nn.silu(h))


class QwenVAEUpBlock(nn.Module):
    out_dim: int
    num_resnets: int
    upsample: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for j in range(self.num_resnets):
            x = WanResidualBlock(self.out_dim, dtype=self.dtype,
                                 name=f'resnets_{j}')(x)
        if self.upsample:
            x = WanUpsample(self.out_dim, dtype=self.dtype,
                            name='upsampler')(x)
        return x


class QwenVAEDecoder(nn.Module):
    base_dim: int = 96
    z_dim: int = 16
    dim_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    out_channels: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: Array) -> Array:
        # diffusers WanDecoder3d: dims = base * ([last] + reversed(mult)),
        # each up block's conv halves the width, so stage i>0 enters at
        # dims[i] // 2.
        mult = tuple(self.dim_mult)
        dims = [self.base_dim * u for u in (mult[-1],) + mult[::-1]]
        h = nn.Conv(dims[0], (3, 3), padding=1, dtype=self.dtype,
                    name='conv_in')(z)
        h = WanMidBlock(dims[0], dtype=self.dtype, name='mid_block')(h)
        for i, out_dim in enumerate(dims[1:]):
            h = QwenVAEUpBlock(out_dim, self.num_res_blocks + 1,
                               upsample=i != len(mult) - 1, dtype=self.dtype,
                               name=f'up_blocks_{i}')(h)
        h = WanRMSNorm(h.shape[-1], name='norm_out')(h)
        return nn.Conv(self.out_channels, (3, 3), padding=1,
                       dtype=self.dtype, name='conv_out')(nn.silu(h))


@MODULES.register_module()
class PretrainedVAEQwenImage:
    """Qwen-Image VAE wrapper: Wan geometry in image mode + per-channel
    latent mean/std normalization (reference pretrained.py:104-149).

    encode: images (B, H, W, 3) in [-1, 1] -> (z - mean) / std, NHWC
    decode: latents -> images in [-1, 1]
    """

    def __init__(self, base_dim: int = 96, z_dim: int = 16,
                 dim_mult: Sequence[int] = (1, 2, 4, 4),
                 num_res_blocks: int = 2, out_channels: int = 3,
                 latents_mean: Optional[Sequence[float]] = None,
                 latents_std: Optional[Sequence[float]] = None,
                 sample_posterior: bool = False,
                 from_pretrained: Optional[str] = None,
                 freeze: bool = True, dtype: str = 'bfloat16', **kwargs):
        self.z_dim = z_dim
        self.latent_channels = z_dim
        self.spatial_factor = 2 ** (len(dim_mult) - 1)
        self.latents_mean = jnp.asarray(latents_mean) \
            if latents_mean is not None else jnp.zeros((z_dim,))
        self.latents_std = jnp.asarray(latents_std) \
            if latents_std is not None else jnp.ones((z_dim,))
        self.sample_posterior = sample_posterior
        self.from_pretrained = from_pretrained
        net_dtype = getattr(jnp, dtype)
        net_kw = dict(base_dim=base_dim, z_dim=z_dim, dim_mult=dim_mult,
                      num_res_blocks=num_res_blocks, dtype=net_dtype)
        self.encoder = QwenVAEEncoder(**net_kw)
        self.decoder = QwenVAEDecoder(out_channels=out_channels, **net_kw)
        # Wan's 1x1x1 quant convs reduce to channel mixes in image mode
        self.quant_conv = nn.Conv(z_dim * 2, (1, 1), dtype=net_dtype)
        self.post_quant_conv = nn.Conv(z_dim, (1, 1), dtype=net_dtype)

    def init_params(self, rng, image_size: int = 32):
        ks = jax.random.split(rng, 4)
        s = self.spatial_factor
        enc = self.encoder.init(
            ks[0], jnp.zeros((1, image_size, image_size, 3)))['params']
        dec = self.decoder.init(
            ks[1], jnp.zeros((1, image_size // s, image_size // s,
                              self.z_dim)))['params']
        qc = self.quant_conv.init(
            ks[2], jnp.zeros((1, 1, 1, self.z_dim * 2)))['params']
        pqc = self.post_quant_conv.init(
            ks[3], jnp.zeros((1, 1, 1, self.z_dim)))['params']
        params = dict(encoder=enc, decoder=dec, quant_conv=qc,
                      post_quant_conv=pqc)
        if self.from_pretrained is not None:
            from ..pipelines.convert import (load_safetensors_state,
                                             torch_qwen_vae_to_flax,
                                             graft_pretrained)
            state = load_safetensors_state(self.from_pretrained)
            tree, _ = torch_qwen_vae_to_flax(state)
            params, missing, unexpected = graft_pretrained(params, tree)
            if missing or unexpected:
                raise ValueError(
                    f'qwen vae load mismatch: missing {missing[:3]}, '
                    f'unexpected {unexpected[:3]}')
        return params

    def encode(self, params, images: Array, rng: Optional[Array] = None
               ) -> Array:
        moments = self.encoder.apply({'params': params['encoder']}, images)
        moments = self.quant_conv.apply({'params': params['quant_conv']},
                                        moments)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        z = mean
        if self.sample_posterior:
            assert rng is not None
            z = mean + jnp.exp(0.5 * jnp.clip(logvar, -30, 20)) * \
                jax.random.normal(rng, mean.shape, mean.dtype)
        return ((jnp.asarray(z, jnp.float32) - self.latents_mean)
                / self.latents_std)

    def decode(self, params, latents: Array) -> Array:
        z = jnp.asarray(latents, jnp.float32) * self.latents_std \
            + self.latents_mean
        z = self.post_quant_conv.apply({'params': params['post_quant_conv']},
                                       z.astype(self.post_quant_conv.dtype))
        img = self.decoder.apply({'params': params['decoder']}, z)
        return jnp.asarray(img, jnp.float32)
