"""Qwen-Image MM-DiT family: teacher + ArcQwen student with mixture heads.

Behavioral equivalent of the reference
(``lakonlab/models/architecture/arcflow/arcqwen.py`` and
``.../diffusers/qwen.py``): 60 dual-stream joint blocks (no single-stream
stage), RMSNorm on the raw text stream, timestep-only embedding (no pooled
text), centered multi-axis RoPE, text-mask truncation, and the same three
ArcFlow output heads + init semantics as ArcFlux (``arcqwen.py:66-104``).

Same TPU-first design as flux.py: channel-last latents, nn.scan + remat
blocks, bf16 compute, substring-partitioned adapter.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..registry import MODULES
from .flux import MLPEmbedder, make_img_ids, patchify, unpatchify
from .layers import (AdaLayerNormContinuous, AdaLayerNormZero, FeedForward,
                     JointAttention, LoRADense, RMSNorm, layer_norm_no_affine,
                     rope_frequencies, timestep_sinusoidal)

Array = jax.Array
Dtype = Any

ARCQWEN_ADAPTER_KEYS = ('proj_out_means', 'proj_out_logweights',
                        'proj_out_loggamma', 'norm_out', 'lora')


class QwenJointBlock(nn.Module):
    """Dual-stream MMDiT block with text-mask-aware joint attention.

    ``moe_experts > 0`` swaps both stream MLPs for expert-choice MoE FFNs
    (layers.MoEFeedForward — beyond-reference; EP over the 'expert'
    mesh axis), same surface as FluxJointBlock."""

    dim: int
    num_heads: int
    head_dim: int
    lora_rank: int = 0
    lora_dropout: float = 0.0
    moe_experts: int = 0
    moe_capacity_factor: float = 1.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, carry, rope_temb_mask):
        img, txt = carry
        rope, temb, txt_mask = rope_temb_mask
        h_img, gate_i, shift_mlp_i, scale_mlp_i, gate_mlp_i = AdaLayerNormZero(
            self.dim, dtype=self.dtype, name='img_norm1')(img, temb)
        h_txt, gate_t, shift_mlp_t, scale_mlp_t, gate_mlp_t = AdaLayerNormZero(
            self.dim, dtype=self.dtype, name='txt_norm1')(txt, temb)

        # joint-sequence key mask: [txt_mask, ones(img)]
        mask = None
        if txt_mask is not None:
            b, s_txt = txt_mask.shape
            key_mask = jnp.concatenate(
                [txt_mask.astype(bool),
                 jnp.ones((b, img.shape[1]), bool)], axis=1)
            mask = key_mask[:, None, None, :]     # (B, 1, 1, S_kv)

        attn_img, attn_txt = JointAttention(
            self.dim, self.num_heads, self.head_dim, dtype=self.dtype,
            name='attn')(h_img, h_txt, rope, mask=mask)
        img = img + gate_i * attn_img
        txt = txt + gate_t * attn_txt

        h_img = layer_norm_no_affine(img) * (1 + scale_mlp_i) + shift_mlp_i
        h_txt = layer_norm_no_affine(txt) * (1 + scale_mlp_t) + shift_mlp_t
        img = img + gate_mlp_i * FeedForward(
            self.dim, lora_rank=self.lora_rank,
                lora_dropout=self.lora_dropout,
            moe_experts=self.moe_experts,
            moe_capacity_factor=self.moe_capacity_factor, dtype=self.dtype,
            name='ff_img')(h_img)
        txt = txt + gate_mlp_t * FeedForward(
            self.dim, lora_rank=self.lora_rank,
                lora_dropout=self.lora_dropout,
            moe_experts=self.moe_experts,
            moe_capacity_factor=self.moe_capacity_factor, dtype=self.dtype,
            name='ff_txt')(h_txt)
        return (img, txt), None


def make_qwen_img_ids(h_tokens: int, w_tokens: int, scale_rope: bool = True
                      ) -> Array:
    """Latent position ids; ``scale_rope`` centers the spatial coordinates
    (the reference QwenEmbedRope's scaled rope)."""
    ids = make_img_ids(h_tokens, w_tokens)
    if scale_rope:
        center = jnp.array([0, h_tokens // 2, w_tokens // 2], jnp.int32)
        ids = ids - center[None]
    return ids


class QwenBackbone(nn.Module):
    """Shared Qwen-Image trunk (embedders + 60 joint blocks)."""

    family = 'qwen'   # converter key-map family (pipelines/convert.py)

    in_channels: int = 64
    num_layers: int = 60
    attention_head_dim: int = 128
    num_attention_heads: int = 24
    joint_attention_dim: int = 3584
    axes_dims_rope: Tuple[int, int, int] = (16, 56, 56)
    rope_theta: float = 10000.0
    scale_rope: bool = True
    max_text_len: Optional[int] = None
    lora_rank: int = 0
    lora_dropout: float = 0.0
    moe_experts: int = 0              # >0: MoE joint-block MLPs (EP-ready)
    moe_capacity_factor: float = 1.0
    checkpointing: bool = True
    dtype: Dtype = jnp.bfloat16

    @property
    def inner_dim(self):
        return self.num_attention_heads * self.attention_head_dim

    @nn.compact
    def trunk(self, packed: Array, t: Array, encoder_hidden_states: Array,
              encoder_hidden_states_mask: Optional[Array],
              img_ids: Array) -> Tuple[Array, Array]:
        dt = self.dtype
        if self.max_text_len is not None and \
                encoder_hidden_states.shape[1] > self.max_text_len:
            # text truncation (reference arcqwen.py:325-332)
            encoder_hidden_states = encoder_hidden_states[:, :self.max_text_len]
            if encoder_hidden_states_mask is not None:
                encoder_hidden_states_mask = \
                    encoder_hidden_states_mask[:, :self.max_text_len]

        img = LoRADense(self.inner_dim, dtype=dt, name='img_in')(
            packed.astype(dt))
        txt = RMSNorm(self.joint_attention_dim, dtype=dt, name='txt_norm')(
            encoder_hidden_states.astype(dt))
        txt = LoRADense(self.inner_dim, dtype=dt, name='txt_in')(txt)

        t_feat = timestep_sinusoidal(t.astype(jnp.float32) * 1000.0,
                                     256).astype(dt)
        temb = MLPEmbedder(self.inner_dim, lora_rank=self.lora_rank,
            lora_dropout=self.lora_dropout, dtype=dt,
                           name='timestep_embedder')(t_feat)

        txt_ids = jnp.zeros((txt.shape[1], 3), jnp.int32)
        ids = jnp.concatenate([txt_ids, img_ids], axis=0)
        rope = rope_frequencies(ids, self.axes_dims_rope, self.rope_theta)

        from .flux import _apply_stacked_blocks, _scan_blocks
        block_kw = dict(dim=self.inner_dim,
                        num_heads=self.num_attention_heads,
                        head_dim=self.attention_head_dim,
                        lora_rank=self.lora_rank,
                        lora_dropout=self.lora_dropout,
                        moe_experts=self.moe_experts,
                        moe_capacity_factor=self.moe_capacity_factor,
                        dtype=dt)
        blocks = _scan_blocks(
            QwenJointBlock, self.num_layers, 'transformer_blocks',
            remat=self.checkpointing, **block_kw)
        img, txt = _apply_stacked_blocks(
            self, blocks, 'transformer_blocks', QwenJointBlock,
            self.num_layers, self.checkpointing, block_kw, (img, txt),
            (rope, temb, encoder_hidden_states_mask))
        return img, temb


@MODULES.register_module()
class QwenImageTransformer2DModel(QwenBackbone):
    """Teacher: u-prediction (reference diffusers/qwen.py:14)."""

    patch_size: int = 2

    @nn.compact
    def __call__(self, hidden_states: Array, t: Array,
                 encoder_hidden_states: Array = None,
                 encoder_hidden_states_mask: Optional[Array] = None,
                 **kwargs) -> Array:
        b, h, w, c = hidden_states.shape
        p = self.patch_size
        packed = patchify(hidden_states, p)
        img_ids = make_qwen_img_ids(h // p, w // p, self.scale_rope)
        hidden, temb = self.trunk(packed, t, encoder_hidden_states,
                                  encoder_hidden_states_mask, img_ids)
        hidden = AdaLayerNormContinuous(self.inner_dim, dtype=self.dtype,
                                        name='norm_out')(hidden, temb)
        out = LoRADense(p * p * c, dtype=jnp.float32, name='proj_out')(
            hidden.astype(jnp.float32))
        return unpatchify(out, h, w, p)


@MODULES.register_module()
class ArcQwenImageTransformer2DModel(QwenBackbone):
    """Student: Qwen trunk + 3 ArcFlow mixture heads (reference
    arcqwen.py:176-353). Output contract identical to ArcFlux."""

    patch_size: int = 2
    num_gaussians: int = 16

    @nn.compact
    def __call__(self, hidden_states: Array, t: Array,
                 encoder_hidden_states: Array = None,
                 encoder_hidden_states_mask: Optional[Array] = None,
                 **kwargs) -> dict:
        b, h, w, c = hidden_states.shape
        p = self.patch_size
        k = self.num_gaussians
        packed = patchify(hidden_states, p)
        img_ids = make_qwen_img_ids(h // p, w // p, self.scale_rope)
        hidden, temb = self.trunk(packed, t, encoder_hidden_states,
                                  encoder_hidden_states_mask, img_ids)
        hidden = AdaLayerNormContinuous(self.inner_dim, dtype=self.dtype,
                                        name='norm_out')(hidden, temb)
        hidden = hidden.astype(jnp.float32)
        n = hidden.shape[1]

        def means_bias_init(key, shape, dtype=jnp.float32):
            noise = 0.1 * jax.random.normal(key, (k, c), dtype)
            return jnp.broadcast_to(noise[:, None, :],
                                    (k, p * p, c)).reshape(shape)

        def gamma_bias_init(key, shape, dtype=jnp.float32):
            del key
            target = jnp.logspace(math.log10(0.2), math.log10(4.0), k - 1)
            return jnp.broadcast_to(jnp.log(target)[:, None],
                                    (k - 1, p * p)).reshape(shape).astype(dtype)

        means = LoRADense(k * p * p * c, dtype=jnp.float32,
                          kernel_init=nn.initializers.zeros,
                          bias_init=means_bias_init,
                          name='proj_out_means')(hidden)
        logweights = LoRADense(k * p * p, dtype=jnp.float32,
                               kernel_init=nn.initializers.zeros,
                               name='proj_out_logweights')(hidden)
        loggammas = LoRADense((k - 1) * p * p, dtype=jnp.float32,
                              kernel_init=nn.initializers.zeros,
                              bias_init=gamma_bias_init,
                              name='proj_out_loggamma')(hidden)

        means = means.reshape(b, n, k, p * p, c)
        logweights = jax.nn.log_softmax(
            logweights.reshape(b, n, k, p * p, 1), axis=2)
        loggammas = loggammas.reshape(b, n, k - 1, p * p, 1)

        def to_pixel(x, kk, ch):
            x = x.transpose(0, 2, 1, 3, 4).reshape(b * kk, n, p * p * ch)
            x = unpatchify(x, h, w, p)
            return x.reshape(b, kk, h, w, ch)

        return dict(means=to_pixel(means, k, c),
                    logweights=to_pixel(logweights, k, 1),
                    loggammas=to_pixel(loggammas, k - 1, 1))
