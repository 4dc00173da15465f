"""Native flax Qwen2.5 text tower for Qwen-Image prompt encoding.

The reference runs the Qwen2.5-VL-7B text stack through transformers/torch
(``lakonlab/models/architecture/diffusers/pretrained.py:194-238``). Here the
decoder (the only part prompt encoding uses — images never enter the
template) is a native flax module, so prompt encoding is one jitted XLA
program on the TPU instead of a host-CPU torch forward serialized against
the train step.

Text-only inputs make Qwen's mrope degenerate to standard rotary embeddings
(all three position sections carry the same sequential index), so the
standard llama-style half-split rope is exact here.

Weights convert from the HF torch checkpoint (safetensors) — see
``load_qwen25_text_params``. Cross-checked against the torch
Qwen2_5_VLForConditionalGeneration on fabricated tiny checkpoints in
tests/test_text_encoders.py.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array


def _rms_norm(x: Array, weight: Array, eps: float) -> Array:
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32))


def _rope_half(x: Array, cos: Array, sin: Array) -> Array:
    """Llama/Qwen half-split rotary: cos/sin are (S, D) with the frequency
    block repeated twice (HF ``rotate_half`` convention — NOT the
    interleaved-pairs layout the FLUX DiT uses)."""
    x32 = x.astype(jnp.float32)
    half = x32.shape[-1] // 2
    x1, x2 = x32[..., :half], x32[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return (x32 * cos[None, :, None, :] + rotated * sin[None, :, None, :]
            ).astype(x.dtype)


class Qwen25DecoderLayer(nn.Module):
    hidden_size: int
    num_heads: int
    num_kv_heads: int
    intermediate_size: int
    rms_norm_eps: float
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, cos: Array, sin: Array, bias: Array
                 ) -> Array:
        dt = self.dtype
        hd = self.hidden_size // self.num_heads
        b, s, _ = x.shape
        ln_w = self.param('input_layernorm', nn.initializers.ones,
                          (self.hidden_size,), jnp.float32)
        h = _rms_norm(x, ln_w, self.rms_norm_eps).astype(dt)

        q = nn.Dense(self.num_heads * hd, dtype=dt, name='q_proj')(h)
        k = nn.Dense(self.num_kv_heads * hd, dtype=dt, name='k_proj')(h)
        v = nn.Dense(self.num_kv_heads * hd, dtype=dt, name='v_proj')(h)
        q = q.reshape(b, s, self.num_heads, hd)
        k = k.reshape(b, s, self.num_kv_heads, hd)
        v = v.reshape(b, s, self.num_kv_heads, hd)
        q = _rope_half(q, cos, sin)
        k = _rope_half(k, cos, sin)
        rep = self.num_heads // self.num_kv_heads
        if rep > 1:
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)

        # (B, H, Sq, Skv) logits in fp32 with causal+padding bias
        logits = jnp.einsum('bqhd,bkhd->bhqk', q.astype(jnp.float32),
                            k.astype(jnp.float32)) / np.sqrt(hd)
        probs = jax.nn.softmax(logits + bias, axis=-1)
        attn = jnp.einsum('bhqk,bkhd->bqhd', probs.astype(jnp.float32),
                          v.astype(jnp.float32))
        attn = attn.reshape(b, s, self.num_heads * hd).astype(dt)
        x = x + nn.Dense(self.hidden_size, use_bias=False, dtype=dt,
                         name='o_proj')(attn)

        ln2_w = self.param('post_attention_layernorm', nn.initializers.ones,
                           (self.hidden_size,), jnp.float32)
        h = _rms_norm(x, ln2_w, self.rms_norm_eps).astype(dt)
        gate = nn.Dense(self.intermediate_size, use_bias=False, dtype=dt,
                        name='gate_proj')(h)
        up = nn.Dense(self.intermediate_size, use_bias=False, dtype=dt,
                      name='up_proj')(h)
        down = nn.Dense(self.hidden_size, use_bias=False, dtype=dt,
                        name='down_proj')(nn.silu(gate) * up)
        return x + down


class Qwen25TextModel(nn.Module):
    """Qwen2.5 decoder returning post-final-norm hidden states — equal to
    the torch model's ``output_hidden_states[-1]`` / ``last_hidden_state``.
    """

    vocab_size: int
    hidden_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    intermediate_size: int
    rope_theta: float = 1e6
    rms_norm_eps: float = 1e-6
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, input_ids: Array, attention_mask: Array) -> Array:
        b, s = input_ids.shape
        emb = nn.Embed(self.vocab_size, self.hidden_size,
                       dtype=self.dtype, name='embed_tokens')(input_ids)

        hd = self.hidden_size // self.num_heads
        inv = 1.0 / (self.rope_theta
                     ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd))
        ang = jnp.arange(s, dtype=jnp.float32)[:, None] * inv[None]
        cos = jnp.concatenate([jnp.cos(ang)] * 2, axis=-1)
        sin = jnp.concatenate([jnp.sin(ang)] * 2, axis=-1)

        causal = jnp.tril(jnp.ones((s, s), bool))
        keep = causal[None, :, :] & (attention_mask[:, None, :] > 0)
        bias = jnp.where(keep, 0.0, -1e30)[:, None, :, :]   # (B,1,Sq,Skv)

        x = emb
        for i in range(self.num_layers):
            x = Qwen25DecoderLayer(
                self.hidden_size, self.num_heads, self.num_kv_heads,
                self.intermediate_size, self.rms_norm_eps, self.dtype,
                name=f'layers_{i}')(x, cos, sin, bias)
        norm_w = self.param('norm', nn.initializers.ones,
                            (self.hidden_size,), jnp.float32)
        return _rms_norm(x, norm_w, self.rms_norm_eps)


def load_qwen25_text_params(model_dir: str, dtype: Any = jnp.bfloat16):
    """(flax Qwen25TextModel, params) from an HF Qwen2.5(-VL) checkpoint
    directory: reads config.json (text_config for VL checkpoints) and
    converts the ``model.[language_model.]*`` torch tensors; visual-tower
    and lm_head tensors are ignored."""
    from ..pipelines.convert import load_safetensors_state
    with open(os.path.join(model_dir, 'config.json')) as f:
        cfg = json.load(f)
    tc = cfg.get('text_config', cfg)
    model = Qwen25TextModel(
        vocab_size=tc['vocab_size'], hidden_size=tc['hidden_size'],
        num_layers=tc['num_hidden_layers'],
        num_heads=tc['num_attention_heads'],
        num_kv_heads=tc.get('num_key_value_heads',
                            tc['num_attention_heads']),
        intermediate_size=tc['intermediate_size'],
        rope_theta=float(tc.get('rope_theta', 1e6)),
        rms_norm_eps=float(tc.get('rms_norm_eps', 1e-6)),
        dtype=dtype)

    state = load_safetensors_state(model_dir)
    # strip the decoder prefix (transformers moved it across versions)
    for prefix in ('model.language_model.', 'language_model.model.',
                   'model.'):
        if any(k.startswith(prefix + 'embed_tokens') for k in state):
            state = {k[len(prefix):]: v for k, v in state.items()
                     if k.startswith(prefix)}
            break
    else:
        raise ValueError(f'no Qwen text decoder found in {model_dir}')

    def t(key):
        return jnp.asarray(np.asarray(state[key], np.float32))

    params = {'embed_tokens': {'embedding': t('embed_tokens.weight')},
              'norm': t('norm.weight')}
    n_layers = model.num_layers
    for i in range(n_layers):
        p = f'layers.{i}.'
        lp = {
            'input_layernorm': t(p + 'input_layernorm.weight'),
            'post_attention_layernorm':
                t(p + 'post_attention_layernorm.weight'),
        }
        for name in ('q_proj', 'k_proj', 'v_proj'):
            lp[name] = {'kernel': t(p + f'self_attn.{name}.weight').T,
                        'bias': t(p + f'self_attn.{name}.bias')}
        lp['o_proj'] = {'kernel': t(p + 'self_attn.o_proj.weight').T}
        for name in ('gate_proj', 'up_proj', 'down_proj'):
            lp[name] = {'kernel': t(p + f'mlp.{name}.weight').T}
        params[f'layers_{i}'] = lp
    return model, params
