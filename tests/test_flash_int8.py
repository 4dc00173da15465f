"""int8-QK^T flash attention kernel (ops/flash_int8.py): interpret-mode
parity against an XLA reference on the SAME quantized rows, masked-path
parity, and an error bound vs full-precision attention.

The kernel is a measured perf NEGATIVE at serving shapes (see its module
docstring) and is not wired into the serving path — these tests pin its
correctness so the do-not-retry note stays trustworthy (the r4 pattern:
negatives are committed with their evidence, e.g. the chunked block scan).
"""

import jax
import jax.numpy as jnp
import numpy as np

from arcflow_tpu.ops.flash_int8 import flash_attention_int8, rowwise_int8

B, S, H, D = 2, 512, 3, 128


def _inputs():
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    return tuple(jax.random.normal(k, (B, S, H, D), jnp.float32)
                 for k in ks)


def _reference(q, k, v, kv_valid=None):
    """Attention on the same int8-rounded q/k rows (exact rank-1 rescale),
    P in f32, V through bf16 — what the kernel computes, without flash."""
    qq, qs = rowwise_int8(q.transpose(0, 2, 1, 3))
    kq, kss = rowwise_int8(k.transpose(0, 2, 1, 3))
    qd = qq.astype(jnp.float32) * qs
    kd = kq.astype(jnp.float32) * kss
    s = jnp.einsum('bhqd,bhkd->bhqk', qd, kd) / (D ** 0.5)
    if kv_valid is not None:
        s = jnp.where(kv_valid[:, None, None, :], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    vb = v.transpose(0, 2, 1, 3).astype(jnp.bfloat16).astype(jnp.float32)
    return jnp.einsum('bhqk,bhkd->bhqd', p, vb).transpose(0, 2, 1, 3)


def test_parity_same_quantized_rows():
    q, k, v = _inputs()
    out = flash_attention_int8(q, k, v, block_q=256, block_k=256,
                               interpret=True)
    want = _reference(q, k, v)
    err = np.abs(np.asarray(out, np.float32) - np.asarray(want)).max()
    assert err < 2e-2, err


def test_masked_parity_and_padded_keys_excluded():
    q, k, v = _inputs()
    valid = (jnp.arange(S)[None, :]
             < jnp.array([[S // 2], [S - 64]])).astype(jnp.int32)
    out = flash_attention_int8(q, k, v, kv_valid=valid, block_q=256,
                               block_k=256, interpret=True)
    want = _reference(q, k, v, kv_valid=valid.astype(bool))
    err = np.abs(np.asarray(out, np.float32) - np.asarray(want)).max()
    assert err < 2e-2, err
    # masking changed the result (the mask actually engaged)
    base = flash_attention_int8(q, k, v, block_q=256, block_k=256,
                                interpret=True)
    assert np.abs(np.asarray(out) - np.asarray(base)).max() > 1e-3


def test_close_to_full_precision_attention():
    q, k, v = _inputs()
    out = np.asarray(flash_attention_int8(q, k, v, block_q=256,
                                          block_k=256, interpret=True),
                     np.float64)
    full = np.asarray(jax.nn.dot_product_attention(q, k, v), np.float64)
    cos = (out.ravel() @ full.ravel()
           / (np.linalg.norm(out) * np.linalg.norm(full)))
    assert cos > 0.999, cos
