"""Pallas flash-attention path vs XLA attention, incl. the key-padding
(segment-ids) lowering that puts Qwen's masked joint attention on the
tuned kernel (reference builds the mask at arcqwen.py:325-332).

Runs the kernel in interpreter mode on the CPU CI mesh (the compiled path
is exercised on real TPU by bench.py / the verify drive).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from arcflow_tpu.models.layers import (_flash_call, attention,
                                       key_padding_mask)


def make_qkv(b=2, s=512, h=2, d=128, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (b, s, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, s, h, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, s, h, d), jnp.float32)
    return q, k, v


def test_flash_matches_xla_unmasked():
    q, k, v = make_qkv()
    ref = jax.nn.dot_product_attention(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        out = _flash_call(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_flash_matches_xla_key_padding_mask():
    """Per-sample text padding (the Qwen case): different valid lengths per
    batch row; flash with segment ids must equal XLA with the boolean
    key mask at every (valid-query, any-key) position."""
    q, k, v = make_qkv(seed=1)
    b, s = q.shape[0], q.shape[1]
    valid_len = jnp.array([s - 100, s - 37])
    kv_valid = jnp.arange(s)[None, :] < valid_len[:, None]
    ref = jax.nn.dot_product_attention(q, k, v,
                                       mask=kv_valid[:, None, None, :])
    with pltpu.force_tpu_interpret_mode():
        out = _flash_call(q, k, v, kv_valid=kv_valid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_key_padding_mask_detection():
    b, s = 2, 16
    kv = jnp.arange(s)[None, :] < jnp.array([[10], [12]])
    got = key_padding_mask(kv[:, None, None, :], s)
    assert got is not None and got.shape == (b, s)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(kv))
    # a full (B, 1, S, S) mask is NOT a key-padding mask
    full = jnp.ones((b, 1, s, s), bool)
    assert key_padding_mask(full, s) is None
    assert key_padding_mask(None, s) is None


def test_attention_masked_fallback_matches_manual():
    """attention() with a key-padding mask on CPU (no flash) must equal a
    manual fp32 softmax with -inf at padded keys."""
    q, k, v = make_qkv(s=64, d=32, seed=2)
    s = q.shape[1]
    kv_valid = jnp.arange(s)[None, :] < jnp.array([[40], [64]])
    out = attention(q, k, v, mask=kv_valid[:, None, None, :])
    logits = jnp.einsum('bqhd,bkhd->bhqk', q, k) / np.sqrt(q.shape[-1])
    logits = jnp.where(kv_valid[:, None, None, :], logits, -jnp.inf)
    ref = jnp.einsum('bhqk,bkhd->bqhd', jax.nn.softmax(logits, axis=-1), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
