"""Pallas TPU kernel: forward-only flash attention with int8 QK^T.

**MEASURED NEGATIVE — kept for the record, NOT wired into the serving
path.** At the FLUX serving shape (B1, S4608, H24, D128) on the real v5e:
int8-QK^T flash = 3.27 ms/call at (bq=512, bk=1024), 3.26 ms at
(bq=512, bk=512), 2.91 ms at
(bq=1536, bk=512) vs the tuned bf16 Pallas flash at **2.078 ms**
(numerics fine: cos 0.999963 vs the bf16 kernel on-chip). Why int8 loses
here: attention at D=128 contraction is softmax/VPU-bound, not
QK-MXU-bound — the bf16 dot emits the fp32 score tile directly, while the
int8 dot adds an int32->f32 convert plus two rescale passes (q-row and
k-row scales) over every (bq, bk) score tile, more VPU work than the MXU
time the int8 rate saves. Do not retry without removing those VPU passes
(e.g. per-tensor scales folded into sm_scale AND a fused convert+exp),
and e2e-remeasure — the 237 ms attention share of the 841 ms w8a8
transformer bounds the best case at ~+7% e2e.

Design (correct and tested, tests/test_flash_int8.py): q and k quantize
per row (symmetric int8, per-(batch, head, token) scales), the S x S
score tile computes as one int8 x int8 -> int32 MXU dot, the online
softmax runs in fp32 on the exactly-rescaled scores — scores are
(q_i8 @ k_i8^T) * (s_q s_k^T), a rank-1 exact rescale, so softmax sees
the true dot products of the int8-rounded rows — and P @ V stays bf16.
Key-padding masks (the Qwen text mask) lower to an in-kernel validity
row, same semantics as layers.key_padding_mask.

No reference counterpart: the reference serves attention through torch
SDPA in bf16; this probed TPU-native headroom on top of its
quantized-matmul serving path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_NEG_INF = -1e30


def rowwise_int8(x: Array) -> tuple[Array, Array]:
    """Per-row symmetric int8: (..., D) bf16 -> ((..., D) int8, (..., 1) f32
    scales). Elementwise — XLA fuses it into the producing ops (RoPE /
    qk-norm epilogues)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-6) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _flash_int8_kernel(q_ref, qs_ref, k_ref, ks_ref, v_ref, mask_ref, o_ref,
                       *, block_k: int, sm_scale: float, masked: bool):
    q = q_ref[0]                       # (bq, D) int8
    qs = qs_ref[0] * sm_scale          # (bq, 1) f32 — fold the 1/sqrt(D)
    bq, d = q.shape
    s_kv = k_ref.shape[1]
    nk = s_kv // block_k

    def body(j, carry):
        m, l, acc = carry
        kj = k_ref[0, pl.ds(j * block_k, block_k), :]       # (bk, D) int8
        ksj = ks_ref[0, pl.ds(j * block_k, block_k), 0]     # (bk,) f32
        s32 = jax.lax.dot_general(
            q, kj, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)                # (bq, bk)
        s = s32.astype(jnp.float32) * qs * ksj[None, :]
        if masked:
            valid = mask_ref[0, pl.ds(j * block_k, block_k)] > 0
            s = jnp.where(valid[None, :], s, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)                               # (bq, bk) f32
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        vj = v_ref[0, pl.ds(j * block_k, block_k), :]        # (bk, D) bf16
        pv = jax.lax.dot_general(
            p.astype(jnp.bfloat16), vj, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc * alpha + pv

    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, nk, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def flash_attention_int8(q: Array, k: Array, v: Array,
                         kv_valid: Array | None = None,
                         sm_scale: float | None = None,
                         block_q: int = 512, block_k: int = 1024,
                         interpret: bool = False) -> Array:
    """Forward flash attention on (B, S, H, D) with int8 QK^T.

    Args:
        q, k, v: (B, S, H, D) bf16/f32. S % block sizes == 0, D % 128 == 0.
        kv_valid: optional (B, S) bool/int key-padding validity (the Qwen
            text mask — same semantics as layers.key_padding_mask).
        sm_scale: defaults to 1/sqrt(D).

    Returns (B, S, H, D) in q.dtype.
    """
    b, s, h, d = q.shape
    if sm_scale is None:
        sm_scale = 1.0 / (d ** 0.5)
    block_q = min(block_q, s)
    block_k = next(bk for bk in (block_k, 512, 256, s) if s % bk == 0)
    assert s % block_q == 0 and s % block_k == 0 and d % 128 == 0, (s, d)

    # (B, S, H, D) -> (B*H, S, D); quantize q/k per row (fused by XLA)
    def bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, s, d)
    qq, qs = rowwise_int8(bh(q))
    kq, ks = rowwise_int8(bh(k))
    vv = bh(v).astype(jnp.bfloat16)
    if kv_valid is None:
        mask = jnp.ones((b, s), jnp.int32)
        masked = False
    else:
        mask = kv_valid.astype(jnp.int32)
        masked = True

    grid = (b * h, s // block_q)
    kernel = functools.partial(_flash_int8_kernel, block_k=block_k,
                               sm_scale=float(sm_scale), masked=masked)
    flops = 4 * b * h * s * s * d
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, 1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # kv mask is per (batch, key): one row per b*h program
            pl.BlockSpec((1, s), lambda i, j, h=h: (i // h, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, s, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')),
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=b * h * s * s,
            bytes_accessed=(qq.size + kq.size + 2 * vv.size * 2)),
        interpret=interpret,
    )(qq, qs, kq, ks, vv, mask)
    return out.reshape(b, h, s, d).transpose(0, 2, 1, 3)
