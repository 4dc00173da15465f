"""Shared DiT building blocks (flax.linen), TPU-first.

Behavioral equivalents of the diffusers layers the reference composes
(FluxTransformerBlock internals: AdaLayerNormZero/-Single/-Continuous,
per-head RMSNorm on q/k, rotary embeddings, gelu-tanh FeedForward; see
reference ``lakonlab/models/architecture/arcflow/arcflux.py:42-90`` for the
composition). Design notes:

  * compute dtype is a module field (default bfloat16) with fp32 parameter
    storage — the linen-native version of the reference's autocast policy;
  * attention runs through ``jax.nn.dot_product_attention`` (XLA fuses it;
    a Pallas flash-attention path can swap in underneath without touching
    callers);
  * LoRA is a Dense wrapper whose low-rank leaves live under ``lora_a/b`` so
    the framework's partition-by-substring ('lora') splits adapters from the
    frozen base (reference: peft adapters + flex_freeze exclude 'lora').
"""

from __future__ import annotations

import functools
import math
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..parallel.mesh import shard_activation

Array = jax.Array
Dtype = Any


def timestep_sinusoidal(t: Array, dim: int, max_period: float = 10000.0,
                        scale: float = 1.0, flip_sin_to_cos: bool = True) -> Array:
    """Sinusoidal timestep features, diffusers-compatible ordering."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
                    / half)
    args = scale * t.astype(jnp.float32)[:, None] * freqs[None]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    return emb


def _int4_matmul(x: Array, packed: Array, scale: Array, dtype) -> Array:
    """x @ dequant(packed int4) for the group-local half-split layout
    (utils/quantize.pack_int4): within each scale group of ``2*ph`` input
    rows, the first ``ph`` rows sit in the low nibbles and the second
    ``ph`` in the high nibbles of ``ph`` packed rows.

    Two modes, both keeping the nibble unpack a fusible elementwise chain
    on the packed buffer (an unpack-interleave would materialize the full
    dequantized kernel per matmul — measured 45% slower e2e on Qwen-20B):

      * weight-only (default): two bf16 dots over the nibble halves,
        ``y = x_lo . deq(lo) + x_hi . deq(hi)`` with contiguous activation
        slices.
      * w4a8 (``act_quant_active()``): per-token int8 activations and ONE
        K=group int8 x int8 -> int32 dot per scale group — the MXU int8
        rate on int4-resident weights. Group-wise scales cannot fold into
        a single int8 dot (they vary along the contraction), hence the
        per-group structure; contiguity of every slice is what the
        half-split layout is for. On TPU this runs the Pallas grouped
        matmul (ops/quant_matmul.py) whose fp32 accumulator lives in
        VMEM; the XLA fori_loop below is the portable fallback (same
        numerics, but it streams the accumulator through HBM per group —
        measured 4x slower on the full Qwen geometry).
    """
    from ..utils.quantize import act_quant_active
    G = scale.shape[-3]
    ph = packed.shape[-2] // G          # packed rows per group
    out = packed.shape[-1]
    if act_quant_active() and packed.ndim == 2:
        x32 = x.astype(jnp.float32)
        xs = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True),
                         1e-8) / 127.0
        xq = jnp.clip(jnp.round(x32 / xs), -127, 127).astype(jnp.int8)
        sc2 = scale.astype(jnp.float32)[:, 0, :]     # (G, out)

        from ..ops.quant_matmul import (pick_blocks, w4a8_matmul_pallas,
                                        w4a8_ok)
        if w4a8_ok(x, packed, scale):
            m = 1
            for d in x.shape[:-1]:
                m *= d
            mp = (m + 511) // 512 * 512
            xq2 = xq.reshape(m, x.shape[-1])
            if mp != m:
                xq2 = jnp.pad(xq2, ((0, mp - m), (0, 0)))
            bm, bn, kg = pick_blocks(mp, out, G)
            y = w4a8_matmul_pallas(xq2, packed, sc2, block_m=bm,
                                   block_n=bn, k_groups=kg)
            y = y[:m].reshape(*x.shape[:-1], out)
            return (y * xs).astype(dtype)

        def body(g, acc):
            pk = jax.lax.dynamic_slice_in_dim(packed, g * ph, ph, axis=0)
            wlo = jnp.right_shift(jnp.left_shift(pk, 4), 4)
            whi = jnp.right_shift(pk, 4)
            xg = jax.lax.dynamic_slice_in_dim(xq, g * 2 * ph, 2 * ph,
                                              axis=-1)
            cd = lambda a, w: jax.lax.dot_general(
                a, w, (((a.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            p = cd(xg[..., :ph], wlo) + cd(xg[..., ph:], whi)
            sg = jax.lax.dynamic_slice_in_dim(sc2, g, 1, axis=0)[0]
            return acc + p.astype(jnp.float32) * sg

        acc = jax.lax.fori_loop(
            0, G, body, jnp.zeros((*x.shape[:-1], out), jnp.float32))
        return (acc * xs).astype(dtype)
    # weight-only: dequant fuses into the dots' operand reads
    sc = jnp.broadcast_to(
        scale.astype(dtype), (*scale.shape[:-2], ph, out)
    ).reshape(*packed.shape[:-2], G * ph, out)
    lo = jnp.right_shift(jnp.left_shift(packed, 4), 4).astype(dtype) * sc
    hi = jnp.right_shift(packed, 4).astype(dtype) * sc
    xr = x.astype(dtype).reshape(*x.shape[:-1], G, 2, ph)
    x_lo = xr[..., 0, :].reshape(*x.shape[:-1], G * ph)
    x_hi = xr[..., 1, :].reshape(*x.shape[:-1], G * ph)
    return jnp.dot(x_lo, lo) + jnp.dot(x_hi, hi)


class LoRADense(nn.Module):
    """Dense with optional low-rank adapter: y = x W + b + (alpha/r) (x A) B.

    With ``lora_rank=0`` this is a plain Dense. The base kernel/bias stay in
    ``param_dtype``; lora leaves are fp32 (they are the trainable adapter).

    ``lora_dropout`` matches peft's LoRA-branch dropout (the reference trains
    with ``lora_dropout=0.05``, configs/flux/arcflux_2nfe_k16.py:49): dropout
    on the adapter-branch *input* only, active only when the caller provides
    a 'dropout' PRNG (``apply(..., rngs={'dropout': key})``) — deterministic
    at eval/inference by construction.
    """

    features: int
    use_bias: bool = True
    lora_rank: int = 0
    lora_alpha: Optional[float] = None   # defaults to rank (scale 1)
    lora_dropout: float = 0.0
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_features = x.shape[-1]
        if self.has_variable('quant', 'kernel_packed4'):
            # weight-only int4 (utils/quantize.py quantize_weights_int4):
            # two nibbles per int8 byte in HBM, sign-extending shift/mask
            # unpack + per-(input-group x out-channel) rescale in-graph.
            # Quarter the weight traffic of bf16 — the full Qwen-20B
            # geometry fits one 16 GB chip. The packed tensor lives in the
            # 'quant' collection (its shape is (in/2, out), which flax's
            # param-shape validation would reject under 'kernel'); no
            # 'kernel' param exists in this mode.
            packed = self.get_variable('quant', 'kernel_packed4')
            scale = self.get_variable('quant', 'kernel_scale4')
            y = _int4_matmul(x, packed, scale, self.dtype)
            kernel = None
        else:
            kernel = self.param('kernel', self.kernel_init,
                                (in_features, self.features),
                                self.param_dtype)
        if kernel is None:
            pass
        elif kernel.dtype == jnp.int8:
            from ..utils.quantize import act_quant_active
            # int8 kernels (utils/quantize.py): per-output-channel scales
            # ride in the 'quant' collection (sliced per layer under nn.scan)
            scale = self.get_variable('quant', 'kernel_scale')
            if act_quant_active():
                # w8a8: dynamic per-token symmetric int8 activations; the
                # int8 x int8 -> int32 dot runs on the MXU int8 path
                # (~1.7x the bf16 ceiling on v5e); output rescaled by
                # (per-token act scale) x (per-channel weight scale)
                x32 = x.astype(jnp.float32)
                xs = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1,
                                         keepdims=True), 1e-8) / 127.0
                xq = jnp.clip(jnp.round(x32 / xs), -127, 127).astype(jnp.int8)
                y = jax.lax.dot_general(
                    xq, kernel, (((xq.ndim - 1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                y = y.astype(jnp.float32) * (xs * scale.astype(jnp.float32))
                y = y.astype(self.dtype)
            else:
                # weight-only: the int8->bf16 convert fuses into the dot's
                # operand read — HBM weight traffic halves (the full 12B
                # geometry fits one 16GB chip), compute stays bf16
                kernel = kernel.astype(self.dtype) * scale.astype(self.dtype)
                y = jnp.dot(x.astype(self.dtype), kernel)
        else:
            y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param('bias', self.bias_init,
                              (self.features,), self.param_dtype)
            y = y + bias.astype(self.dtype)
        if self.lora_rank > 0:
            # gaussian init on A (peft init_lora_weights='gaussian'), zeros on B
            a = self.param('lora_a',
                           nn.initializers.normal(1.0 / self.lora_rank),
                           (in_features, self.lora_rank), jnp.float32)
            b = self.param('lora_b', nn.initializers.zeros,
                           (self.lora_rank, self.features), jnp.float32)
            scale = (self.lora_alpha or self.lora_rank) / self.lora_rank
            x_l = x.astype(self.dtype)
            if self.lora_dropout > 0.0:
                x_l = nn.Dropout(self.lora_dropout)(
                    x_l, deterministic=not self.has_rng('dropout'))
            y = y + (jnp.dot(jnp.dot(x_l, a.astype(self.dtype)),
                             b.astype(self.dtype)) * scale)
        return y


# NOTE (measured, do not re-try blindly): fusing q/k/v into one
# (D, 3D) matmul — with the three param leaves kept checkpoint-compatible
# and concatenated at trace time — was benchmarked end-to-end on the full
# 12B geometry and is SLOWER than three separate dots in every mode
# (bf16-compute/weight-only int8: 1047 -> 1209 ms per image; w8a8:
# 889 -> 986 ms). XLA already pipelines the independent dots, the runtime
# concat adds HBM traffic, and the int8->bf16 dequant stops fusing into
# the dot's operand read once a concat sits in between. Isolated
# single-dot microbenchmarks suggest otherwise (dispatch-bound); trust
# the e2e number.


class RMSNorm(nn.Module):
    """RMS norm over the last dim (used per-head on q/k in FLUX attention)."""

    dim: int
    eps: float = 1e-6
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        scale = self.param('scale', nn.initializers.ones, (self.dim,),
                           jnp.float32)
        x32 = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        out = x32 * jax.lax.rsqrt(var + self.eps) * scale
        return out.astype(self.dtype)


def layer_norm_no_affine(x: Array, eps: float = 1e-6) -> Array:
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class AdaLayerNormZero(nn.Module):
    """LN (no affine) + 6-way modulation from temb (shift/scale/gate x2)."""

    dim: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, temb: Array):
        mod = LoRADense(6 * self.dim, dtype=self.dtype,
                        kernel_init=nn.initializers.zeros,
                        name='modulation')(nn.silu(temb))
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = \
            jnp.split(mod[:, None], 6, axis=-1)
        h = layer_norm_no_affine(x) * (1 + scale_msa) + shift_msa
        return h, gate_msa, shift_mlp, scale_mlp, gate_mlp


class AdaLayerNormZeroSingle(nn.Module):
    """LN (no affine) + 3-way modulation (shift/scale/gate)."""

    dim: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, temb: Array):
        mod = LoRADense(3 * self.dim, dtype=self.dtype,
                        kernel_init=nn.initializers.zeros,
                        name='modulation')(nn.silu(temb))
        shift, scale, gate = jnp.split(mod[:, None], 3, axis=-1)
        h = layer_norm_no_affine(x) * (1 + scale) + shift
        return h, gate


class AdaLayerNormContinuous(nn.Module):
    """Final LN with shift/scale from temb (reference norm_out)."""

    dim: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, temb: Array) -> Array:
        mod = LoRADense(2 * self.dim, dtype=self.dtype,
                        kernel_init=nn.initializers.zeros,
                        name='modulation')(nn.silu(temb))
        scale, shift = jnp.split(mod[:, None], 2, axis=-1)
        return layer_norm_no_affine(x) * (1 + scale) + shift


class FeedForward(nn.Module):
    """gelu(tanh) MLP, dim -> mult*dim -> dim (diffusers FeedForward).

    ``moe_experts > 0`` swaps in the expert-choice MoE FFN
    (``MoEFeedForward`` below, beyond-reference capability) — params land
    under a ``moe`` scope so the EP placement (`parallel.shard_state`)
    and partitions can address them by path."""

    dim: int
    mult: int = 4
    lora_rank: int = 0
    lora_dropout: float = 0.0
    moe_experts: int = 0
    moe_capacity_factor: float = 1.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.moe_experts > 0:
            return MoEFeedForward(
                self.dim, self.moe_experts,
                capacity_factor=self.moe_capacity_factor, mult=self.mult,
                dtype=self.dtype, name='moe')(x)
        h = LoRADense(self.dim * self.mult, lora_rank=self.lora_rank,
            lora_dropout=self.lora_dropout,
                      dtype=self.dtype, name='in_proj')(x)
        h = shard_activation(nn.gelu(h, approximate=True), 'hidden')
        return shard_activation(
            LoRADense(self.dim, lora_rank=self.lora_rank,
                lora_dropout=self.lora_dropout, dtype=self.dtype,
                      name='out_proj')(h), 'residual')


class MoEFeedForward(nn.Module):
    """Mixture-of-experts FFN with expert-choice routing — a capability
    beyond the reference (SURVEY.md §2.4: EP/MoE ABSENT), designed
    TPU-first:

      * **expert-choice routing** (each of the E experts picks its top-C
        tokens, C = S·capacity_factor/E): static shapes, perfect load
        balance by construction — no balancing loss, no token-drop
        bookkeeping, nothing data-dependent for XLA to choke on. Tokens
        can be picked by several experts (weighted by the router) or by
        none (the residual stream carries them unchanged);
      * **dense one-hot dispatch/combine**: gather/scatter become einsums
        against a (B, E, C, S) one-hot — matmuls the MXU eats, the
        standard TPU MoE formulation;
      * **expert parallelism** (EP): weights (E, D, F) shard their expert
        dim over the 'expert' mesh axis and the dispatched (B, E, C, D)
        activations pin the same axis (``shard_activation('experts')``) —
        each expert's FFN is local to its shard and GSPMD reduces only
        the combine contraction. Composes with TP: the wide FFN dim goes
        column-parallel via 'experts_hidden'.

    Router math in fp32 (softmax over experts per token); expert compute
    in ``dtype``.
    """

    dim: int
    num_experts: int
    capacity_factor: float = 1.0
    mult: int = 4
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, s, d = x.shape
        e = self.num_experts
        c = max(1, int(s * self.capacity_factor) // e)
        hidden = self.dim * self.mult

        router = self.param('router', nn.initializers.lecun_normal(),
                            (d, e), jnp.float32)
        scores = jax.nn.softmax(
            x.astype(jnp.float32) @ router, axis=-1)          # (B, S, E)
        # expert choice: per expert, the C highest-scoring tokens
        gates, idx = jax.lax.top_k(scores.transpose(0, 2, 1), c)  # (B, E, C)
        onehot = jax.nn.one_hot(idx, s, dtype=self.dtype)     # (B, E, C, S)

        xin = shard_activation(
            jnp.einsum('becs,bsd->becd', onehot, x.astype(self.dtype)),
            'experts')
        w_in = self.param('w_in', nn.initializers.lecun_normal(),
                          (e, d, hidden), jnp.float32)
        b_in = self.param('b_in', nn.initializers.zeros, (e, hidden),
                          jnp.float32)
        h = jnp.einsum('becd,edf->becf', xin, w_in.astype(self.dtype))
        h = nn.gelu(h + b_in[None, :, None].astype(self.dtype),
                    approximate=True)
        h = shard_activation(h, 'experts_hidden')
        w_out = self.param('w_out', nn.initializers.lecun_normal(),
                           (e, hidden, d), jnp.float32)
        b_out = self.param('b_out', nn.initializers.zeros, (e, d),
                           jnp.float32)
        out = jnp.einsum('becf,efd->becd', h, w_out.astype(self.dtype))
        out = shard_activation(out + b_out[None, :, None].astype(self.dtype),
                               'experts')
        y = jnp.einsum('becs,becd,bec->bsd', onehot, out,
                       gates.astype(self.dtype))
        return shard_activation(y, 'residual')


# ---- rotary embeddings -------------------------------------------------------

def rope_frequencies(ids: Array, axes_dim: Sequence[int], theta: float = 10000.0
                     ) -> Tuple[Array, Array]:
    """Multi-axis rotary cos/sin for position ids.

    Args:
        ids: (S, len(axes_dim)) per-token positions along each axis.
        axes_dim: per-axis rotary sub-dims, summing to head_dim
            (FLUX: (16, 56, 56) -> 128).

    Returns:
        cos, sin of shape (S, head_dim) in the pair-interleaved layout
        (each frequency value repeated twice) matching diffusers'
        ``repeat_interleave_real``.
    """
    coss, sins = [], []
    for i, d in enumerate(axes_dim):
        half = d // 2
        freqs = 1.0 / (theta ** (jnp.arange(half, dtype=jnp.float32) * 2 / d))
        angles = ids[:, i:i + 1].astype(jnp.float32) * freqs[None]   # (S, half)
        coss.append(jnp.repeat(jnp.cos(angles), 2, axis=-1))
        sins.append(jnp.repeat(jnp.sin(angles), 2, axis=-1))
    return jnp.concatenate(coss, axis=-1), jnp.concatenate(sins, axis=-1)


def apply_rope(x: Array, cos: Array, sin: Array) -> Array:
    """Pairwise rotation in interleaved layout: x shape (..., S, D).

    Two bit-identical formulations of the rotated companion
    ``x_rot[2i] = -x[2i+1], x_rot[2i+1] = x[2i]``, selected at trace time
    by the serving mode (measured on v5e, FLUX-12B e2e):

    * lane-roll (two rolls + even/odd select): under int8-activation
      serving (w8a8/w4a8) the naive pair view forced T(2,128)-tiled 5-D
      f32 intermediates and relayout copies worth ~10% of e2e — rolls
      stay in the native (8,128) tiling and fuse (+4.3% w8a8, +5.7% w4a8,
      +7.7% Qwen).
    * pair-reshape + stack: in bf16-compute programs (training, --int8/
      --bf16 serving) XLA fuses THIS form into the dot epilogues better —
      the roll form measured 3-4% SLOWER there (serving int8 1047->1083 ms,
      int8-trunk train step 1879->1950 ms). Do not unify the two paths
      without remeasuring all four modes.
    """
    from ..utils.quantize import act_quant_active
    x32 = x.astype(jnp.float32)
    if act_quant_active():
        even = (jnp.arange(x.shape[-1]) % 2) == 0
        x_rot = jnp.where(even, -jnp.roll(x32, -1, axis=-1),
                          jnp.roll(x32, 1, axis=-1))
    else:
        x_pairs = x32.reshape(*x32.shape[:-1], -1, 2)
        x_rot = jnp.stack([-x_pairs[..., 1], x_pairs[..., 0]],
                          axis=-1).reshape(x32.shape)
    return (x32 * cos + x_rot * sin).astype(x.dtype)


# ---- attention -----------------------------------------------------------------

_FLASH_MIN_SEQ = 1024   # below this XLA's fused attention wins on dispatch


def key_padding_mask(mask, s_kv: int) -> Optional[Array]:
    """(B, S_kv) bool key-validity when ``mask`` is a key-only padding mask
    broadcast over queries and heads — the form the Qwen joint blocks build
    ([txt_mask, ones(img)], reference arcqwen.py:325-332) — else None."""
    if mask is None:
        return None
    if (mask.ndim == 4 and mask.shape[1] == 1 and mask.shape[2] == 1
            and mask.shape[-1] == s_kv):
        return mask[:, 0, 0, :].astype(bool)
    return None


def _flash_ok(q: Array, mask) -> bool:
    from ..parallel.mesh import _ACT, pipeline_active, \
        sequence_parallel_active
    b, s, h, d = q.shape
    if pipeline_active():
        # inside the pipeline stage body (manual over 'pipe'): the Pallas
        # call is fine while every auto axis is trivial, but GSPMD cannot
        # partition a custom call over an active auto axis (e.g. a
        # data-sharded batch) — XLA attention handles those
        mesh = _ACT['mesh']
        if any(mesh.shape[a] > 1 for a in mesh.shape
               if a != _ACT['pipe_axis']):
            return False
    # a `jax.default_device(cpu)` context (host-side init / weight quantize
    # on a TPU-backed process) lowers for CPU even though the default
    # *backend* is still 'tpu' — Pallas can't execute there
    dd = jax.config.jax_default_device
    if dd is not None and getattr(dd, 'platform', 'tpu') != 'tpu':
        return False
    # key-padding masks lower to kernel segment ids; anything else (a full
    # additive/2-D mask) stays on the XLA path. The Pallas kernel needs
    # manual sharding; under tensor/sequence parallelism route through the
    # shard_map path below instead.
    if mask is not None and key_padding_mask(mask, s) is None:
        return False
    return (jax.default_backend() == 'tpu'
            and not sequence_parallel_active()
            and s >= _FLASH_MIN_SEQ and s % 512 == 0 and d % 128 == 0)


def _splash_kernel(s: int, h: int):
    """Splash-attention kernel for an (S, H) shape (the newer Pallas
    kernel). Built fresh per trace: the kernel object lazily materializes
    mask-info arrays on first use, so caching it across jit traces leaks
    tracers (measured: UnexpectedTracerError under the 2-NFE program)."""
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        BlockSizes, FullMask, MultiHeadMask, make_splash_mha_single_device)
    bq = next(b for b in (1536, 1024, 512, s) if s % b == 0)
    bkv = next(b for b in (1536, 1024, 512, s) if s % b == 0)
    bkvc = 768 if bkv % 768 == 0 else min(512, bkv)
    mask = MultiHeadMask([FullMask((s, s)) for _ in range(h)])
    return make_splash_mha_single_device(
        mask=mask, block_sizes=BlockSizes(block_q=bq, block_kv=bkv,
                                          block_kv_compute=bkvc))


def _splash_call(q: Array, k: Array, v: Array) -> Array:
    """Unmasked forward attention via the splash kernel — measured 1.976 ms
    vs 2.078 ms for the tuned flash kernel at the FLUX serving shape
    (B1 S4608 H24 D128, blocks (1536, 1536, 768); bigger blocks
    compile-OOM VMEM). Serving-only: routed under ``act_quant_active()``
    so training and masked paths keep the flash kernel (its backward
    blocks are tuned there; on the masked/segment-ids Qwen path splash
    measured 2.084 vs flash 2.094 ms — a tie, not worth a second masked
    code path); e2e win measured on the w8a8 program (841 -> 817 ms)."""
    b, s, h, d = q.shape
    scale = 1.0 / (d ** 0.5)
    kernel = _splash_kernel(s, h)
    qt, kt, vt = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
    out = jax.vmap(kernel)((qt * scale).astype(qt.dtype), kt, vt)
    return out.transpose(0, 2, 1, 3).astype(q.dtype)


def _flash_call(q: Array, k: Array, v: Array,
                kv_valid: Optional[Array] = None) -> Array:
    """Tuned Pallas flash attention on (B, S, H, D); TPU only.

    ``kv_valid`` (B, S) bool lowers a key-padding mask to kernel segment
    ids: every query carries id 0, padded keys id 1, so q_id == kv_id
    excludes exactly the padded keys — bitwise the reference's
    ``attention_mask`` semantics (valid queries unmasked over valid keys)
    with no S x S mask materialization. This is what puts Qwen's 60
    masked joint blocks on the tuned kernel instead of generic XLA.
    """
    from ..utils.quantize import serving_active
    if kv_valid is None and serving_active():
        return _splash_call(q, k, v)
    from jax.experimental.pallas.ops.tpu.flash_attention import \
        BlockSizes, SegmentIds, flash_attention
    s, d = q.shape[1], q.shape[-1]
    scale = 1.0 / (d ** 0.5)
    # explicit block sizes matter: the kernel's defaults leave ~5x on the
    # table at FLUX shapes (measured 15ms -> 3.0ms at S=4608 on v5e)
    bq = min(512, s)
    # forward-only: a taller q block amortizes the kv stream further
    # (measured ~7% kernel-level at S=4608); the dkv/dq backward blocks
    # stay at 512 — untuned territory, and training wasn't remeasured
    bq_fwd = next(b for b in (1536, 1024, 512, s) if s % b == 0)
    bk_major = next(b for b in (1536, 1024, 512, s) if s % b == 0)
    bk = min(512, bk_major)
    block_sizes = BlockSizes(
        block_q=bq_fwd, block_k_major=bk_major, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk_major, block_k_dkv=bk,
        block_q_dkv=bq, block_k_major_dq=bk_major, block_k_dq=bk,
        block_q_dq=bq)
    seg = None
    if kv_valid is not None:
        b = q.shape[0]
        ids_kv = jnp.where(kv_valid, 0, 1).astype(jnp.int32)
        seg = SegmentIds(q=jnp.zeros((b, s), jnp.int32), kv=ids_kv)
    # (B, S, H, D) -> (B, H, S, D)
    qt, kt, vt = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
    out = flash_attention(qt, kt, vt, segment_ids=seg, causal=False,
                          sm_scale=scale, block_sizes=block_sizes)
    return out.transpose(0, 2, 1, 3).astype(q.dtype)


def attention(q: Array, k: Array, v: Array,
              mask: Optional[Array] = None) -> Array:
    """Scaled dot-product attention on (B, S, H, D) tensors.

    Long sequences (the 4608-token FLUX/Qwen joint attention) route through
    the Pallas TPU flash-attention kernel (tiled online-softmax, no S x S
    materialization); key-padding masks (Qwen's text mask) lower to kernel
    segment ids rather than falling back to XLA. Under sequence/tensor
    parallelism the kernel is not GSPMD-partitionable, so it runs per
    head-shard inside a ``shard_map`` over the ambient mesh (each device
    holds the full sequence for its head slice — the Ulysses layout that
    ``shard_activation('heads')`` already pins, so no extra resharding).
    Everything else uses jax.nn.dot_product_attention (XLA-fused). Softmax
    accumulates in fp32 on all paths.
    """
    kv_valid = key_padding_mask(mask, k.shape[1])
    if _flash_ok(q, mask):
        return _flash_call(q, k, v, kv_valid)
    if mask is None or kv_valid is not None:
        from ..parallel.ring_attention import ring_attention, ring_partition
        rp = ring_partition(q.shape)
        if rp is not None:
            rmesh, sp_axis, batch, head_axes = rp
            return ring_attention(q, k, v, rmesh, sp_axis,
                                  kv_valid=kv_valid, batch=batch,
                                  head_axes=head_axes)
        from ..parallel.mesh import heads_partition
        part = heads_partition(q.shape)
        if part is not None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P
            mesh, spec = part
            s, d = q.shape[1], q.shape[-1]
            use_flash = (jax.default_backend() == 'tpu'
                         and s >= _FLASH_MIN_SEQ and s % 512 == 0
                         and d % 128 == 0)

            def body(ql, kl, vl, kvl):
                if use_flash:
                    return _flash_call(ql, kl, vl, kvl)
                # CPU-simulated meshes (tests) exercise the same specs and
                # collectives with the XLA kernel inside the shard
                m = None if kvl is None else kvl[:, None, None, :]
                return jax.nn.dot_product_attention(ql, kl, vl, mask=m)

            # kv_valid is per (B, S): sharded on batch only, replicated
            # over the head shards
            kv_spec = P(spec[0], None)
            if kv_valid is None:
                return shard_map(
                    lambda a, b_, c: body(a, b_, c, None), mesh=mesh,
                    in_specs=(spec,) * 3, out_specs=spec,
                    check_vma=False)(q, k, v)
            return shard_map(body, mesh=mesh,
                             in_specs=(spec, spec, spec, kv_spec),
                             out_specs=spec, check_vma=False)(q, k, v,
                                                              kv_valid)
    return jax.nn.dot_product_attention(q, k, v, mask=mask)


class JointAttention(nn.Module):
    """FLUX dual-stream joint attention: separate qkv per stream, per-head
    q/k RMSNorm, RoPE over the concatenated [txt, img] sequence."""

    dim: int
    num_heads: int
    head_dim: int
    lora_rank: int = 0
    lora_dropout: float = 0.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, img: Array, txt: Array, rope: Tuple[Array, Array],
                 mask: Optional[Array] = None) -> Tuple[Array, Array]:
        b, s_img, _ = img.shape
        s_txt = txt.shape[1]
        inner = self.num_heads * self.head_dim

        def qkv(x, prefix):
            q = LoRADense(inner, lora_rank=self.lora_rank,
                lora_dropout=self.lora_dropout, dtype=self.dtype,
                          name=f'{prefix}_q')(x)
            k = LoRADense(inner, lora_rank=self.lora_rank,
                lora_dropout=self.lora_dropout, dtype=self.dtype,
                          name=f'{prefix}_k')(x)
            v = LoRADense(inner, lora_rank=self.lora_rank,
                lora_dropout=self.lora_dropout, dtype=self.dtype,
                          name=f'{prefix}_v')(x)
            shape = (b, x.shape[1], self.num_heads, self.head_dim)
            # pin the reshape-compatible layout (seq over sp, heads over
            # tensor), then move to the attention layout (full seq per head
            # shard) — an explicit 4-D all-to-all instead of a sharding
            # change through a reshape; heads-first also keeps the [txt,img]
            # seq concat below on an unsharded dim
            return (shard_activation(
                shard_activation(t.reshape(shape), 'heads_seq'), 'heads')
                for t in (q, k, v))

        q_i, k_i, v_i = qkv(img, 'img')
        q_t, k_t, v_t = qkv(txt, 'txt')
        q_i = RMSNorm(self.head_dim, dtype=self.dtype, name='img_q_norm')(q_i)
        k_i = RMSNorm(self.head_dim, dtype=self.dtype, name='img_k_norm')(k_i)
        q_t = RMSNorm(self.head_dim, dtype=self.dtype, name='txt_q_norm')(q_t)
        k_t = RMSNorm(self.head_dim, dtype=self.dtype, name='txt_k_norm')(k_t)

        # joint sequence: [txt, img]
        q = jnp.concatenate([q_t, q_i], axis=1)
        k = jnp.concatenate([k_t, k_i], axis=1)
        v = jnp.concatenate([v_t, v_i], axis=1)
        cos, sin = rope
        q = apply_rope(q, cos[None, :, None, :], sin[None, :, None, :])
        k = apply_rope(k, cos[None, :, None, :], sin[None, :, None, :])
        q, k, v = (shard_activation(t, 'heads') for t in (q, k, v))

        out = shard_activation(
            attention(q, k, v, mask=mask), 'heads_seq'
        ).reshape(b, s_txt + s_img, inner)
        txt_out, img_out = out[:, :s_txt], out[:, s_txt:]
        img_out = shard_activation(
            LoRADense(self.dim, lora_rank=self.lora_rank,
                lora_dropout=self.lora_dropout,
                      dtype=self.dtype, name='img_out')(img_out), 'residual')
        txt_out = shard_activation(
            LoRADense(self.dim, lora_rank=self.lora_rank,
                lora_dropout=self.lora_dropout,
                      dtype=self.dtype, name='txt_out')(txt_out), 'residual')
        return img_out, txt_out


class SingleStreamAttention(nn.Module):
    """Attention half of the FLUX single block (no output projection —
    the block fuses attn+mlp through one proj_out)."""

    dim: int
    num_heads: int
    head_dim: int
    lora_rank: int = 0
    lora_dropout: float = 0.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, rope: Tuple[Array, Array]) -> Array:
        b, s, _ = x.shape
        inner = self.num_heads * self.head_dim
        shape = (b, s, self.num_heads, self.head_dim)
        q = LoRADense(inner, lora_rank=self.lora_rank,
            lora_dropout=self.lora_dropout, dtype=self.dtype,
                      name='q')(x).reshape(shape)
        k = LoRADense(inner, lora_rank=self.lora_rank,
            lora_dropout=self.lora_dropout, dtype=self.dtype,
                      name='k')(x).reshape(shape)
        v = LoRADense(inner, lora_rank=self.lora_rank,
            lora_dropout=self.lora_dropout, dtype=self.dtype,
                      name='v')(x).reshape(shape)
        q, k, v = (shard_activation(t, 'heads_seq') for t in (q, k, v))
        q = RMSNorm(self.head_dim, dtype=self.dtype, name='q_norm')(q)
        k = RMSNorm(self.head_dim, dtype=self.dtype, name='k_norm')(k)
        cos, sin = rope
        q = apply_rope(q, cos[None, :, None, :], sin[None, :, None, :])
        k = apply_rope(k, cos[None, :, None, :], sin[None, :, None, :])
        q, k, v = (shard_activation(t, 'heads') for t in (q, k, v))
        return shard_activation(attention(q, k, v), 'heads_seq'
                                ).reshape(b, s, inner)
