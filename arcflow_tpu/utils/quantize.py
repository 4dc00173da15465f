"""Weight-only int8 quantization for inference.

Beyond-reference capability: symmetric per-output-channel int8 on the big
Dense kernels halves weight HBM (the full FLUX-12B geometry then fits a
single 16 GB v5e chip instead of needing sharding or truncation). Compute
stays bf16 — XLA fuses the int8->bf16 convert into the matmul's operand
read, so this is a memory/footprint win, not a numerics change beyond the
quantization error itself.

Usage:
    qparams, quant = quantize_weights_int8(params)
    model.apply({'params': qparams, 'quant': quant}, ...)
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .pytree import flatten, unflatten

# leaves that stay high-precision: the ArcFlow trainable surface (heads,
# LoRA, final AdaLN) — in-block modulation layers are frozen trunk and do
# quantize
_SKIP_SUBSTRINGS = ('proj_out_means', 'proj_out_logweights',
                    'proj_out_loggamma', 'lora_a', 'lora_b')
_SKIP_PREFIXES = ('norm_out.',)

# trace-time global (same pattern as parallel.set_activation_sharding):
# when enabled, LoRADense layers whose kernels are int8 also quantize their
# activations per token and run the matmul as int8 x int8 -> int32 on the
# MXU's int8 path (measured ~1.7x the bf16 matmul ceiling on v5e)
_ACT_QUANT = False


def set_act_quant(enabled: bool) -> None:
    """Enable/disable dynamic w8a8 compute for int8-quantized layers.

    Must be set before the inference program is traced. Weight-only int8
    (the default) only saves HBM; w8a8 additionally runs the big matmuls
    at the int8 MXU rate at the cost of per-token activation rounding.
    """
    global _ACT_QUANT
    _ACT_QUANT = bool(enabled)


def act_quant_active() -> bool:
    return _ACT_QUANT


# trace-time serving flag: forward-only programs (no backward will ever be
# taken) may choose forward-optimized kernels — e.g. splash attention in
# models/layers.py, which has no tuned backward here. Pipelines and the
# bench inference paths set it; training never does. act_quant implies
# serving (training never runs quantized activations).
_SERVING = False


def set_serving(enabled: bool) -> None:
    """Mark the program about to be traced as forward-only serving."""
    global _SERVING
    _SERVING = bool(enabled)


def serving_active() -> bool:
    return _SERVING or _ACT_QUANT


def quantize_weights_int8(params: Dict, min_size: int = 2 ** 16
                          ) -> Tuple[Dict, Dict]:
    """(params) -> (params with big kernels as int8, 'quant' scale tree).

    Kernels quantize symmetrically per output channel (last axis); for
    nn.scan stacked kernels (L, in, out) the scale is per (L, 1, out).
    Small tensors, non-kernel leaves, and the ArcFlow adapter surface stay
    in their original dtype.
    """
    flat = flatten(params)
    out, scales = {}, {}
    for key, v in flat.items():
        skip = (not key.endswith('.kernel')
                or any(s in key for s in _SKIP_SUBSTRINGS)
                or any(key.startswith(p) for p in _SKIP_PREFIXES)
                or not hasattr(v, 'ndim') or v.ndim < 2
                or v.size < min_size)
        if skip:
            out[key] = v
            continue
        vf = jnp.asarray(v, jnp.float32)
        # reduce over the input axis (second-to-last); keep leading stack
        # axes and the output channel axis
        absmax = jnp.max(jnp.abs(vf), axis=-2, keepdims=True)
        scale = jnp.maximum(absmax, 1e-8) / 127.0
        q = jnp.clip(jnp.round(vf / scale), -127, 127).astype(jnp.int8)
        out[key] = q
        # fp32 scales: (out,)-sized, negligible memory, and bf16 scale
        # rounding would double the dequantization error
        scales[key[:-len('.kernel')] + '.kernel_scale'] = scale
    return unflatten(out), unflatten(scales)


def pack_int4(q, group_size: int = 128):
    """int values in [-7, 7], (..., in, out) -> int8 (..., in/2, out),
    group-local half-split layout: within each ``group_size``-row scale
    group, row ``j`` goes to the LOW nibble and row ``j + group_size//2``
    to the HIGH nibble of packed row ``j`` (j < group_size//2).

    Both nibbles of a byte then share one scale group, and every
    per-group slice — of the packed rows AND of the activation columns —
    is contiguous. That keeps the weight-only dequant a fusible
    elementwise chain feeding two dots, and lets the w4a8 path run one
    K=group_size int8 dot per group with plain dynamic slices."""
    q = q.astype(jnp.int8)
    h = group_size // 2
    qg = q.reshape(*q.shape[:-2], -1, 2, h, q.shape[-1])
    lo = qg[..., 0, :, :]
    hi = qg[..., 1, :, :]
    p = jnp.bitwise_or(jnp.left_shift(hi, 4),
                       jnp.bitwise_and(lo, jnp.int8(0x0F)))
    return p.reshape(*q.shape[:-2], q.shape[-2] // 2, q.shape[-1])


def unpack_int4(packed, group_size: int = 128):
    """Inverse of :func:`pack_int4`: int8 (..., in/2, out) -> sign-extended
    int8 values (..., in, out). Arithmetic shifts restore each nibble's
    sign."""
    h = group_size // 2
    pg = packed.reshape(*packed.shape[:-2], -1, h, packed.shape[-1])
    lo = jnp.right_shift(jnp.left_shift(pg, 4), 4)
    hi = jnp.right_shift(pg, 4)
    return jnp.stack([lo, hi], axis=-3).reshape(
        *packed.shape[:-2], packed.shape[-2] * 2, packed.shape[-1])


def quantize_weights_int4(params: Dict, min_size: int = 2 ** 16,
                          group_size: int = 128) -> Tuple[Dict, Dict]:
    """(params) -> (big kernels nibble-packed two-per-int8-byte, 'quant'
    scale tree under 'kernel_scale4').

    Weight-only int4 quarters weight HBM vs bf16 (the FULL Qwen-Image 20B
    geometry fits one 16 GB chip; the reference needs 57 GB + CPU offload,
    README.md:69). Per-(input-group x output-channel) symmetric scales —
    plain per-channel int4 loses too much; group-wise holds the toy-stack
    quality gate (tests/test_quantized_quality.py). Packing is explicit
    int8 nibbles rather than the s4 dtype: s4 jit arguments break on the
    tunneled (axon) backend, and the nibble shift/mask unpack is fusible
    arithmetic on any backend.

    Scale layout for a kernel (..., in, out): (..., in/g, 1, out); the
    packed kernel is (..., in/2, out) int8. Both live in the 'quant'
    collection ('kernel_packed4' / 'kernel_scale4') and the kernel leaf is
    REMOVED from params — flax validates param shapes on apply, so the
    half-row packed tensor cannot sit under the 'kernel' name; LoRADense
    skips ``self.param('kernel')`` when 'kernel_packed4' is present.
    """
    flat = flatten(params)
    out, quant = {}, {}
    for key, v in flat.items():
        skip = (not key.endswith('.kernel')
                or any(s in key for s in _SKIP_SUBSTRINGS)
                or any(key.startswith(p) for p in _SKIP_PREFIXES)
                or not hasattr(v, 'ndim') or v.ndim < 2
                or v.size < min_size
                or v.shape[-2] % group_size != 0 or group_size % 2)
        if skip:
            out[key] = v
            continue
        vf = jnp.asarray(v, jnp.float32)
        lead = vf.shape[:-2]
        g = vf.shape[-2] // group_size
        vg = vf.reshape(*lead, g, group_size, vf.shape[-1])
        absmax = jnp.max(jnp.abs(vg), axis=-2, keepdims=True)
        scale = jnp.maximum(absmax, 1e-8) / 7.0
        q = jnp.clip(jnp.round(vg / scale), -7, 7).reshape(vf.shape)
        stem = key[:-len('.kernel')]
        quant[stem + '.kernel_packed4'] = pack_int4(q, group_size)
        quant[stem + '.kernel_scale4'] = scale
    return unflatten(out), unflatten(quant)


def dequantize_weights(qparams: Dict, quant: Dict) -> Dict:
    """Inverse transform (testing / export)."""
    flat = flatten(qparams)
    sflat = flatten(quant)
    out = {}
    for key, v in flat.items():
        stem = key[:-len('.kernel')] if key.endswith('.kernel') else None
        if stem is not None and stem + '.kernel_scale' in sflat:
            scale = sflat[stem + '.kernel_scale']
            out[key] = v.astype(jnp.float32) * scale.astype(jnp.float32)
        else:
            out[key] = v
    # int4 kernels live entirely in the quant tree
    for skey, packed in sflat.items():
        if not skey.endswith('.kernel_packed4'):
            continue
        stem = skey[:-len('.kernel_packed4')]
        scale = sflat[stem + '.kernel_scale4']       # (..., g, 1, out)
        g = scale.shape[-3]
        group = packed.shape[-2] * 2 // g
        vq = unpack_int4(packed, group).astype(jnp.float32)  # (..., in, out)
        vv = vq.reshape(                              # (..., g, group, out)
            *vq.shape[:-2], g, vq.shape[-2] // g, vq.shape[-1])
        out[stem + '.kernel'] = (vv * scale.astype(jnp.float32)
                                 ).reshape(vq.shape)
    return unflatten(out)
