"""Pallas TPU kernel: w4a8 grouped-quantized matmul.

``y = (x_int8 @ dequant(W_int4)) * act_scale`` where W is nibble-packed
int4 with per-(input-group x output-channel) scales
(utils/quantize.quantize_weights_int4, group-local half-split layout:
within each group of ``2*ph`` input rows, rows ``[0, ph)`` sit in the low
nibbles and rows ``[ph, 2*ph)`` in the high nibbles of ``ph`` packed rows).

Group-wise scales cannot fold into a single int8 dot (they vary along the
contraction axis), so the scale group IS the K tile: the grid iterates
(m, n, g) with g innermost, each step runs one K=group int8 x int8 -> int32
MXU dot on the nibble-unpacked block and rescales the partial into an fp32
VMEM accumulator. That keeps the accumulator out of HBM — the XLA
formulation of the same loop (lax.fori_loop over groups) read+wrote the
(tokens, out) fp32 accumulator per group, measured 4x slower than even the
bf16 dequant path on the full Qwen-20B geometry.

This is the TPU-native analogue of the reference's CUDA-side quantized
serving kernels (the reference itself serves Qwen-20B only with 57 GB +
CPU offload, reference README.md:69): int4-resident weights at the MXU
int8 rate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _w4a8_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, ph: int, kg: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # kg scale groups per grid step: fewer, fatter steps amortize the
    # revisit-and-accumulate pattern (measured: K=128 steps left the MXU
    # idle between dots on the full Qwen geometry)
    for i in range(kg):
        # Mosaic has no i8 vector shifts — unpack nibbles in i32, narrow
        pk = w_ref[pl.ds(i * ph, ph), :].astype(jnp.int32)
        wlo = jnp.right_shift(jnp.left_shift(pk, 28), 28)  # sign-ext low
        whi = jnp.right_shift(pk, 4)                       # arithmetic high
        w = jnp.concatenate([wlo, whi], axis=0).astype(jnp.int8)
        xb = x_ref[:, pl.ds(i * 2 * ph, 2 * ph)]           # (bm, 2*ph) i8
        p = jnp.dot(xb, w, preferred_element_type=jnp.int32)
        # scale rides as the full (G, bn) column block (a (1, bn) block
        # would violate the 8-sublane block minimum); pick the group row
        sg = s_ref[pl.ds(k * kg + i, 1), :]                # (1, bn) f32
        acc_ref[...] += p.astype(jnp.float32) * sg

    @pl.when(k == pl.num_programs(2) - 1)
    def _flush():
        o_ref[...] = acc_ref[...]


def pick_block_m(m: int) -> int:
    for bm in (1536, 1024, 512):
        if m % bm == 0 and m >= bm:
            return bm
    return 512


def pick_blocks(m: int, n: int, g: int) -> tuple[int, int, int]:
    """Tuned (block_m, block_n, k_groups) for the serving shapes.

    Swept on a real v5e at the Qwen/FLUX geometries (M in {512, 4096, 4608},
    K in {3072, 12288}, N in {3072, 12288}): block_n=1024 with block_m=512
    wins ~9-11% over (1536, 512) whenever N divides (the fatter output tile
    halves accumulator flushes per output element; block_m must drop to 512
    to keep the double-buffered out+acc tiles inside the 16 MB VMEM budget),
    and k_groups=12 amortizes the revisit-and-accumulate pattern at both K
    sizes. At square N=3072 the two layouts tie within noise. k_groups is
    halved by the caller until it divides g, so small-K weights degrade
    gracefully."""
    if n % 1024 == 0:
        return min(512, m), 1024, 12
    return pick_block_m(m), 512, 4


def w4a8_matmul_pallas(xq: Array, packed: Array, scale: Array,
                       block_m: int = 1536, block_n: int = 512,
                       k_groups: int = 4, interpret: bool = False) -> Array:
    """(M, K) int8 activations x nibble-packed (K/2, N) int4 weights.

    Args:
        xq: (M, K) int8, M % block_m == 0 (pad before calling).
        packed: (K/2, N) int8, group-local half-split nibbles.
        scale: (G, N) fp32 per-group x per-channel weight scales;
            K == G * group, group == 2 * (K/2 // G).
        k_groups: scale groups per grid step (K tile = k_groups * group).

    Returns:
        (M, N) fp32 partial result — multiply by the per-token activation
        scale outside (it is rank-1 and fuses into the consumer).
    """
    m, k = xq.shape
    pr, n = packed.shape
    g = scale.shape[0]
    ph = pr // g
    assert k == 2 * pr and pr % g == 0
    while g % k_groups:
        k_groups //= 2
    assert m % block_m == 0 and n % block_n == 0, (m, n)

    grid = (m // block_m, n // block_n, g // k_groups)
    kernel = functools.partial(_w4a8_kernel, ph=ph, kg=k_groups)
    flops = 2 * m * k * n
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, 2 * ph * k_groups),
                         lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ph * k_groups, block_n),
                         lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, block_n), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary')),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=m * k + pr * n + 4 * m * n,
            transcendentals=0),
        interpret=interpret,
    )(xq, packed, scale)


def w4a8_ok(x: Array, packed: Array, scale: Array,
            block_n: int = 512) -> bool:
    """Kernel applicability: 2-D weights, TPU lowering, aligned shapes.
    Callers fall back to the XLA group loop otherwise (CPU tests exercise
    the same numerics there)."""
    if packed.ndim != 2 or jax.default_backend() != 'tpu':
        return False
    dd = jax.config.jax_default_device
    if dd is not None and getattr(dd, 'platform', 'tpu') != 'tpu':
        return False
    g = scale.shape[-3]
    ph = packed.shape[-2] // g
    m = 1
    for d in x.shape[:-1]:
        m *= d
    return (ph % 32 == 0 and packed.shape[-1] % block_n == 0
            and m >= 256)
