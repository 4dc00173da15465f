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


def quantize_weights_int4(params: Dict, min_size: int = 2 ** 16,
                          group_size: int = 128) -> Tuple[Dict, Dict]:
    """(params) -> (params with big kernels as int4, 'quant' scale tree).

    Weight-only int4 quarters weight HBM vs bf16 (the FULL Qwen-Image 20B
    geometry fits one 16 GB chip; the reference needs 57 GB + CPU offload,
    README.md:69). Per-(input-group x output-channel) symmetric scales —
    plain per-channel int4 loses too much; group-wise holds the toy-stack
    quality gate (tests/test_quantized_quality.py). XLA TPU stores s4
    packed two-per-byte in HBM and fuses the widen+scale into the matmul's
    operand read (same two-tier design as int8 above).

    Scale layout for a kernel (..., in, out): (..., in/g, 1, out) stored
    under 'kernel_scale4'; LoRADense reshapes (..., in/g, g, out) for the
    dequant.
    """
    flat = flatten(params)
    out, scales = {}, {}
    for key, v in flat.items():
        skip = (not key.endswith('.kernel')
                or any(s in key for s in _SKIP_SUBSTRINGS)
                or any(key.startswith(p) for p in _SKIP_PREFIXES)
                or not hasattr(v, 'ndim') or v.ndim < 2
                or v.size < min_size
                or v.shape[-2] % group_size != 0)
        if skip:
            out[key] = v
            continue
        vf = jnp.asarray(v, jnp.float32)
        lead = vf.shape[:-2]
        g = vf.shape[-2] // group_size
        vg = vf.reshape(*lead, g, group_size, vf.shape[-1])
        absmax = jnp.max(jnp.abs(vg), axis=-2, keepdims=True)
        scale = jnp.maximum(absmax, 1e-8) / 7.0
        q = jnp.clip(jnp.round(vg / scale), -7, 7).astype(jnp.int4)
        out[key] = q.reshape(vf.shape)
        scales[key[:-len('.kernel')] + '.kernel_scale4'] = scale
    return unflatten(out), unflatten(scales)


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
        elif stem is not None and stem + '.kernel_scale4' in sflat:
            scale = sflat[stem + '.kernel_scale4']   # (..., g, 1, out)
            g = scale.shape[-3]
            vv = v.astype(jnp.float32).reshape(     # (..., g, group, out)
                *v.shape[:-2], g, v.shape[-2] // g, v.shape[-1])
            out[key] = (vv * scale.astype(jnp.float32)).reshape(v.shape)
        else:
            out[key] = v
    return unflatten(out)
