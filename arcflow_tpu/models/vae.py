"""AutoencoderKL (SD/FLUX-style VAE) in flax — channel-last, TPU-native.

Equivalent capability to the reference's pretrained VAE wrappers
(``lakonlab/models/architecture/diffusers/pretrained.py:23-149``:
``PretrainedVAE`` / ``PretrainedVAEDecoder`` / ``PretrainedVAEEncoder`` with
scaling/shift factor handling, and ``PretrainedVAEQwenImage`` with
per-channel latent mean/std normalization). The network itself is the
standard diffusers AutoencoderKL geometry (resnet stacks + one mid attention
block), rebuilt in linen with NHWC convs (XLA's native TPU layout).

Weight conversion from diffusers safetensors lives in pipelines/convert.py.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..registry import MODULES

Array = jax.Array
Dtype = Any


class ResnetBlock(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32,
                         name='norm1')(x)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name='conv1')(nn.silu(h))
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32,
                         name='norm2')(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name='conv2')(nn.silu(h))
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name='conv_shortcut')(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head full self-attention over spatial positions (VAE mid)."""

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        res = x
        x = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32,
                         name='group_norm')(x)
        x = x.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name='to_q')(x)
        k = nn.Dense(c, dtype=self.dtype, name='to_k')(x)
        v = nn.Dense(c, dtype=self.dtype, name='to_v')(x)
        attn = jax.nn.dot_product_attention(q[:, :, None], k[:, :, None],
                                            v[:, :, None]).squeeze(2)
        out = nn.Dense(c, dtype=self.dtype, name='to_out')(attn)
        return res + out.reshape(b, h, w, c)


class Downsample(nn.Module):
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # diffusers pads (0,1,0,1) then strides 2 with VALID
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(self.channels, (3, 3), strides=2, padding='VALID',
                       dtype=self.dtype, name='conv')(x)


class Upsample(nn.Module):
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), 'nearest')
        return nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                       name='conv')(x)


class Encoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        ch = self.block_out_channels
        h = nn.Conv(ch[0], (3, 3), padding=1, dtype=self.dtype,
                    name='conv_in')(x)
        for i, c in enumerate(ch):
            for j in range(self.layers_per_block):
                h = ResnetBlock(c, dtype=self.dtype,
                                name=f'down_{i}_res_{j}')(h)
            if i < len(ch) - 1:
                h = Downsample(c, dtype=self.dtype, name=f'down_{i}_ds')(h)
        h = ResnetBlock(ch[-1], dtype=self.dtype, name='mid_res_1')(h)
        h = AttnBlock(ch[-1], dtype=self.dtype, name='mid_attn')(h)
        h = ResnetBlock(ch[-1], dtype=self.dtype, name='mid_res_2')(h)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32,
                         name='conv_norm_out')(h)
        h = nn.Conv(2 * self.latent_channels, (3, 3), padding=1,
                    dtype=self.dtype, name='conv_out')(nn.silu(h))
        return h   # (B, H/8, W/8, 2*latent) = [mean, logvar]


# NOTE (measured, do not re-try blindly): running the GroupNorms in bf16
# instead of fp32 (threading a norm_dtype through every block) was measured
# on the real chip at 1024px decode: 91.8 -> 91.7 ms (0.1%), with
# max|out diff| 0.033 on a 6.2 output range. XLA already fuses the
# norm->silu->conv chains, so the fp32 intermediates never hit HBM; the
# knob buys nothing and was reverted.
class Decoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    out_channels: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: Array) -> Array:
        ch = list(reversed(self.block_out_channels))   # (512,512,256,128)
        h = nn.Conv(ch[0], (3, 3), padding=1, dtype=self.dtype,
                    name='conv_in')(z)
        h = ResnetBlock(ch[0], dtype=self.dtype, name='mid_res_1')(h)
        h = AttnBlock(ch[0], dtype=self.dtype, name='mid_attn')(h)
        h = ResnetBlock(ch[0], dtype=self.dtype, name='mid_res_2')(h)
        for i, c in enumerate(ch):
            for j in range(self.layers_per_block + 1):
                h = ResnetBlock(c, dtype=self.dtype, name=f'up_{i}_res_{j}')(h)
            if i < len(ch) - 1:
                h = Upsample(c, dtype=self.dtype, name=f'up_{i}_us')(h)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32,
                         name='conv_norm_out')(h)
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                       name='conv_out')(nn.silu(h))


@MODULES.register_module()
class PretrainedVAE:
    """VAE wrapper with diffusers scaling semantics (reference
    pretrained.py:23-100).

    encode: images [-1,1] -> latents z' = (z - shift) * scale
    decode: latents -> images [-1,1], z = z'/scale + shift
    Variants: ``latents_mean/std`` per-channel normalization instead of
    scalar scale/shift (the Qwen-Image VAE convention, pretrained.py:104-149).
    """

    def __init__(self, latent_channels: int = 16, out_channels: int = 3,
                 block_out_channels: Sequence[int] = (128, 256, 512, 512),
                 scaling_factor: float = 0.3611, shift_factor: float = 0.1159,
                 latents_mean: Optional[Sequence[float]] = None,
                 latents_std: Optional[Sequence[float]] = None,
                 sample_posterior: bool = False,
                 layers_per_block: int = 2,
                 use_quant_conv: bool = False,
                 use_post_quant_conv: bool = False,
                 from_pretrained: Optional[str] = None, subfolder: str = '',
                 freeze: bool = True, dtype: str = 'bfloat16', **kwargs):
        self.latent_channels = latent_channels
        self.scaling_factor = scaling_factor
        self.shift_factor = shift_factor
        self.latents_mean = jnp.asarray(latents_mean) \
            if latents_mean is not None else None
        self.latents_std = jnp.asarray(latents_std) \
            if latents_std is not None else None
        self.sample_posterior = sample_posterior
        self.from_pretrained = from_pretrained
        self.subfolder = subfolder
        net_dtype = getattr(jnp, dtype)
        self.encoder = Encoder(block_out_channels=block_out_channels,
                               latent_channels=latent_channels,
                               layers_per_block=layers_per_block,
                               dtype=net_dtype)
        self.decoder = Decoder(block_out_channels=block_out_channels,
                               out_channels=out_channels,
                               layers_per_block=layers_per_block,
                               dtype=net_dtype)
        # SD-family VAEs have 1x1 (post_)quant convs; FLUX's does not
        self.quant_conv = nn.Conv(2 * latent_channels, (1, 1),
                                  dtype=net_dtype) if use_quant_conv else None
        self.post_quant_conv = nn.Conv(latent_channels, (1, 1),
                                       dtype=net_dtype) \
            if use_post_quant_conv else None

    # ---- params --------------------------------------------------------
    def init_params(self, rng, image_size: int = 64):
        ks = jax.random.split(rng, 4)
        params = {}
        if self.encoder is not None:
            params['encoder'] = self.encoder.init(
                ks[0], jnp.zeros((1, image_size, image_size, 3)))['params']
            if self.quant_conv is not None:
                params['quant_conv'] = self.quant_conv.init(
                    ks[2], jnp.zeros((1, 1, 1, 2 * self.latent_channels))
                )['params']
        if self.decoder is not None:
            params['decoder'] = self.decoder.init(
                ks[1], jnp.zeros((1, image_size // 8, image_size // 8,
                                  self.latent_channels)))['params']
            if self.post_quant_conv is not None:
                params['post_quant_conv'] = self.post_quant_conv.init(
                    ks[3], jnp.zeros((1, 1, 1, self.latent_channels))
                )['params']
        return self._maybe_load_pretrained(params)

    def _maybe_load_pretrained(self, params):
        if self.from_pretrained is None:
            return params
        from ..pipelines.convert import (load_safetensors_state,
                                         torch_vae_to_flax, graft_pretrained)
        import os
        path = os.path.join(self.from_pretrained, self.subfolder) \
            if self.subfolder else self.from_pretrained
        tree, _ = torch_vae_to_flax(load_safetensors_state(path))
        # encoder/decoder-only variants load their half of the checkpoint
        tree = {k: v for k, v in tree.items() if k in params}
        params, missing, unexpected = graft_pretrained(params, tree)
        if missing or unexpected:
            raise ValueError(f'vae load mismatch: missing {missing[:3]}, '
                             f'unexpected {unexpected[:3]}')
        return params

    def _normalize(self, z: Array) -> Array:
        if self.latents_mean is not None:
            return (z - self.latents_mean) / self.latents_std
        return (z - self.shift_factor) * self.scaling_factor

    def _denormalize(self, z: Array) -> Array:
        if self.latents_mean is not None:
            return z * self.latents_std + self.latents_mean
        return z / self.scaling_factor + self.shift_factor

    def encode(self, params, images: Array, rng: Optional[Array] = None
               ) -> Array:
        """images (B, H, W, 3) in [-1, 1] -> normalized latents."""
        moments = self.encoder.apply({'params': params['encoder']}, images)
        if self.quant_conv is not None:
            moments = self.quant_conv.apply({'params': params['quant_conv']},
                                            moments)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        z = mean
        if self.sample_posterior:
            assert rng is not None
            z = mean + jnp.exp(0.5 * jnp.clip(logvar, -30, 20)) * \
                jax.random.normal(rng, mean.shape, mean.dtype)
        return self._normalize(jnp.asarray(z, jnp.float32))

    def decode(self, params, latents: Array) -> Array:
        """normalized latents -> images (B, H, W, 3) in [-1, 1]."""
        z = self._denormalize(jnp.asarray(latents, jnp.float32))
        if self.post_quant_conv is not None:
            z = self.post_quant_conv.apply(
                {'params': params['post_quant_conv']},
                z.astype(self.post_quant_conv.dtype))
        img = self.decoder.apply({'params': params['decoder']}, z)
        return jnp.asarray(img, jnp.float32)


@MODULES.register_module()
class PretrainedVAEDecoder(PretrainedVAE):
    """Decoder-only variant (the training configs delete the encoder;
    reference pretrained.py:80-91)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.encoder = None
        self.quant_conv = None

    def encode(self, *a, **kw):
        raise RuntimeError('decoder-only VAE')


@MODULES.register_module()
class PretrainedVAEEncoder(PretrainedVAE):
    """Encoder-only variant (latent cachers; reference pretrained.py:92-100)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.decoder = None
        self.post_quant_conv = None

    def decode(self, *a, **kw):
        raise RuntimeError('encoder-only VAE')


# The Qwen-Image VAE (Wan 3D-causal architecture, image mode) lives in
# qwen_vae.py — a real re-implementation, not an SD-geometry stand-in.
