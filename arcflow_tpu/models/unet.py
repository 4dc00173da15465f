"""ADM-style denoising UNet for class-conditional latent diffusion.

Equivalent capability to the reference ``DenoisingUnetMod``
(``lakonlab/models/architecture/ddpm/denoising.py`` + ``modules.py``):
resnet down/up stacks with grouped self-attention at selected resolutions
(the reference's ``MultiHeadAttentionMod`` with SDPA), timestep + class-label
embeddings, u-prediction output. Channel-last flax convs.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..registry import MODULES
from .toy import timestep_embedding

Array = jax.Array
Dtype = Any


class UNetResBlock(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, emb: Array) -> Array:
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32,
                         name='norm1')(x)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name='conv1')(nn.silu(h))
        # scale-shift conditioning (ADM style)
        cond = nn.Dense(2 * self.out_channels, dtype=self.dtype,
                        name='emb_proj')(nn.silu(emb))
        scale, shift = jnp.split(cond[:, None, None], 2, axis=-1)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32,
                         name='norm2')(h)
        h = h * (1 + scale) + shift
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    kernel_init=nn.initializers.zeros, name='conv2')(
            nn.silu(h))
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name='skip')(x)
        return x + h


class UNetAttnBlock(nn.Module):
    channels: int
    num_heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        res = x
        x = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32,
                         name='norm')(x).reshape(b, h * w, c)
        head_dim = c // self.num_heads
        qkv = nn.Dense(3 * c, dtype=self.dtype, name='qkv')(x)
        q, k, v = jnp.split(qkv.reshape(b, h * w, self.num_heads,
                                        3 * head_dim), 3, axis=-1)
        out = jax.nn.dot_product_attention(q, k, v).reshape(b, h * w, c)
        out = nn.Dense(c, dtype=self.dtype,
                       kernel_init=nn.initializers.zeros, name='proj')(out)
        return res + out.reshape(b, h, w, c)


@MODULES.register_module()
class DenoisingUnetMod(nn.Module):
    """Class-conditional UNet u-predictor on (B, H, W, C) latents."""

    in_channels: int = 4
    base_channels: int = 128
    channel_mult: Sequence[int] = (1, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (16, 8)
    num_classes: Optional[int] = 1000
    num_heads: int = 8
    num_timesteps: int = 1000
    dtype: Dtype = jnp.float32

    def _trunk(self, x_t: Array, t: Array, label: Optional[Array]) -> Array:
        """Shared UNet body up to (but not including) the output head; must
        be called from within a compact ``__call__``."""
        emb_dim = self.base_channels * 4
        temb = timestep_embedding(t / self.num_timesteps * 1000.0,
                                  self.base_channels)
        emb = nn.Dense(emb_dim, name='time_mlp1')(temb)
        emb = nn.Dense(emb_dim, name='time_mlp2')(nn.silu(emb))
        if self.num_classes is not None:
            assert label is not None, 'class-conditional UNet needs labels'
            # +1 slot: index num_classes is the null (CFG-negative) class
            class_emb = nn.Embed(self.num_classes + 1, emb_dim,
                                 name='class_embed')(label.astype(jnp.int32))
            emb = emb + class_emb

        h = nn.Conv(self.base_channels, (3, 3), padding=1, dtype=self.dtype,
                    name='conv_in')(x_t)
        skips = [h]
        res = x_t.shape[1]
        for level, mult in enumerate(self.channel_mult):
            ch = self.base_channels * mult
            for j in range(self.num_res_blocks):
                h = UNetResBlock(ch, dtype=self.dtype,
                                 name=f'down_{level}_{j}')(h, emb)
                if res in self.attn_resolutions:
                    h = UNetAttnBlock(ch, self.num_heads, dtype=self.dtype,
                                      name=f'down_attn_{level}_{j}')(h)
                skips.append(h)
            if level < len(self.channel_mult) - 1:
                h = nn.Conv(ch, (3, 3), strides=2, padding=1,
                            dtype=self.dtype, name=f'down_{level}_ds')(h)
                skips.append(h)
                res //= 2

        h = UNetResBlock(h.shape[-1], dtype=self.dtype, name='mid_1')(h, emb)
        h = UNetAttnBlock(h.shape[-1], self.num_heads, dtype=self.dtype,
                          name='mid_attn')(h)
        h = UNetResBlock(h.shape[-1], dtype=self.dtype, name='mid_2')(h, emb)

        for level, mult in reversed(list(enumerate(self.channel_mult))):
            ch = self.base_channels * mult
            for j in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = UNetResBlock(ch, dtype=self.dtype,
                                 name=f'up_{level}_{j}')(h, emb)
                if res in self.attn_resolutions:
                    h = UNetAttnBlock(ch, self.num_heads, dtype=self.dtype,
                                      name=f'up_attn_{level}_{j}')(h)
            if level > 0:
                b, hh, ww, cc = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, cc), 'nearest')
                h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                            name=f'up_{level}_us')(h)
                res *= 2

        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32,
                         name='norm_out')(h)
        return nn.silu(h)

    @nn.compact
    def __call__(self, x_t: Array, t: Array, label: Optional[Array] = None,
                 **kwargs) -> Array:
        h = self._trunk(x_t, t, label)
        return nn.Conv(self.in_channels, (3, 3), padding=1,
                       kernel_init=nn.initializers.zeros, dtype=jnp.float32,
                       name='conv_out')(h)


@MODULES.register_module()
class ArcDenoisingUnetMod(DenoisingUnetMod):
    """ArcFlow student UNet: the same trunk + 3 mixture heads (the UNet
    analogue of the ArcFlux heads, reference arcflux.py:85-132 init
    semantics at patch_size=1).

    Output dict: means (B, K, H, W, C), logweights (B, K, H, W, 1)
    log-softmax over K, loggammas (B, K-1, H, W, 1).
    """

    num_gaussians: int = 8

    @nn.compact
    def __call__(self, x_t: Array, t: Array, label: Optional[Array] = None,
                 **kwargs) -> dict:
        b, hh, ww, c = x_t.shape
        k = self.num_gaussians
        h = self._trunk(x_t, t, label)

        def means_bias_init(key, shape, dtype=jnp.float32):
            noise = 0.1 * jax.random.normal(key, (k, c), dtype)
            return noise.reshape(shape)

        def gamma_bias_init(key, shape, dtype=jnp.float32):
            del key
            import math
            target = jnp.logspace(math.log10(0.2), math.log10(4.0), k - 1)
            return jnp.log(target).astype(dtype)

        means = nn.Conv(k * c, (3, 3), padding=1,
                        kernel_init=nn.initializers.zeros,
                        bias_init=means_bias_init, dtype=jnp.float32,
                        name='proj_out_means')(h)
        logweights = nn.Conv(k, (3, 3), padding=1,
                             kernel_init=nn.initializers.zeros,
                             dtype=jnp.float32,
                             name='proj_out_logweights')(h)
        loggammas = nn.Conv(k - 1, (3, 3), padding=1,
                            kernel_init=nn.initializers.zeros,
                            bias_init=gamma_bias_init, dtype=jnp.float32,
                            name='proj_out_loggamma')(h)
        means = means.reshape(b, hh, ww, k, c).transpose(0, 3, 1, 2, 4)
        logweights = jax.nn.log_softmax(
            logweights, axis=-1).transpose(0, 3, 1, 2)[..., None]
        loggammas = loggammas.transpose(0, 3, 1, 2)[..., None]
        return dict(means=means, logweights=logweights, loggammas=loggammas)


# trainable surface of the Arc UNet student (heads only; the trunk is the
# teacher's, frozen — mirrors ARCFLUX_ADAPTER_KEYS)
ARCUNET_ADAPTER_KEYS = ('proj_out_means', 'proj_out_logweights',
                        'proj_out_loggamma')
