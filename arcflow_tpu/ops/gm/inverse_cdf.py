"""Pallas TPU kernel: batched Newton-Raphson inversion of a 1-D GM CDF.

TPU-native equivalent of the reference CUDA kernel
(``lakonlab/ops/gmflow_ops/src/gmflow_ops.cu:17-115``): each element runs
``n_steps`` NR iterations on the mixture CDF, with clamped update steps.
The element axis is laid out on lanes (128-wide) and the mixture/sample axes
on sublanes, so the per-step pdf/cdf reduction over components is a VPU
reduction; all iterations run out of VMEM with zero HBM traffic in between.

The differentiable fallback (pure jnp NR loop) lives in ``gm_ops.py`` —
mirroring the reference's two-tier design (gmflow_ops.py:102-145).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array
SQRT2 = math.sqrt(2.0)
INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)


def _erf(x):
    """erf via Abramowitz-Stegun 7.1.26 (|err| < 1.5e-7) — Pallas TPU has no
    erf lowering, so we implement it from exp (which the VPU has natively)."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    sign = jnp.where(x >= 0, 1.0, -1.0)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _nr_kernel(means_ref, logw_ref, w_ref, logstd_ref, target_ref, init_ref,
               out_ref, *, n_steps: int, eps: float, max_step_size: float):
    means = means_ref[:]          # (G, TM)
    logw = logw_ref[:]            # (G, TM)
    w = w_ref[:]                  # (G, TM)
    logstd = logstd_ref[:]        # (1, TM)
    target = target_ref[:]        # (N, TM)
    samples = init_ref[:]         # (N, TM)

    inv_std = jnp.exp(-logstd)    # (1, TM)
    clamp = max_step_size * jnp.exp(logstd)

    def body(_, s):
        # (N, G, TM) normalized diffs
        nd = (s[:, None, :] - means[None]) * inv_std[None]
        pdf = (jnp.exp(-0.5 * jnp.square(nd) - logstd[None] + logw[None])
               ).sum(axis=1) * INV_SQRT_2PI                     # (N, TM)
        cdf = (w[None] * _erf(nd / SQRT2)).sum(axis=1)          # (N, TM)
        delta = 0.5 * (cdf - target) / jnp.maximum(pdf, eps)
        return s - jnp.clip(delta, -clamp, clamp)

    out_ref[:] = jax.lax.fori_loop(0, n_steps, body, samples)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def gm1d_inverse_cdf_pallas(means: Array, logweights: Array, weights: Array,
                            logstds: Array, scaled_cdfs: Array,
                            init_samples: Array, n_steps: int = 8,
                            eps: float = 1e-6,
                            max_step_size: float = 1.5) -> Array:
    """NR inverse CDF on TPU.

    Shapes follow gm_ops.gm1d_* convention: means/logweights/weights
    (..., G, H, W) broadcastable against scaled_cdfs/init (..., N, H, W).
    Leading axes are broadcast, then everything flattens to an element axis M
    = prod(batch, H, W) on lanes.
    """
    f32 = jnp.float32
    g = means.shape[-3]
    n = scaled_cdfs.shape[-3]

    batch_hw = jnp.broadcast_shapes(means.shape[:-3] + means.shape[-2:],
                                    scaled_cdfs.shape[:-3]
                                    + scaled_cdfs.shape[-2:])
    lead = batch_hw[:-2]
    h, w_dim = batch_hw[-2:]
    m_elems = int(np.prod(lead, dtype=np.int64)) * h * w_dim

    def to_gm_layout(x, rows):
        x = jnp.broadcast_to(jnp.asarray(x, f32), lead + (rows, h, w_dim))
        x = jnp.moveaxis(x, -3, -1)            # (*lead, H, W, rows)
        return x.reshape(m_elems, rows).T      # (rows, M)

    means2 = to_gm_layout(means, g)
    logw2 = to_gm_layout(logweights, g)
    w2 = to_gm_layout(weights, g)
    logstd2 = to_gm_layout(logstds, 1)
    target2 = to_gm_layout(scaled_cdfs, n)
    init2 = to_gm_layout(init_samples, n)

    tm = 512 if m_elems >= 512 else 128
    m_pad = _round_up(max(m_elems, tm), tm)
    pad = m_pad - m_elems
    if pad:
        means2 = jnp.pad(means2, ((0, 0), (0, pad)))
        logw2 = jnp.pad(logw2, ((0, 0), (0, pad)))
        w2 = jnp.pad(w2, ((0, 0), (0, pad)), constant_values=1.0)
        logstd2 = jnp.pad(logstd2, ((0, 0), (0, pad)))
        target2 = jnp.pad(target2, ((0, 0), (0, pad)))
        init2 = jnp.pad(init2, ((0, 0), (0, pad)))

    grid = (m_pad // tm,)
    kernel = functools.partial(_nr_kernel, n_steps=n_steps, eps=eps,
                               max_step_size=max_step_size)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((g, tm), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, tm), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, tm), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, tm), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, tm), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, tm), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, m_pad), f32),
        input_output_aliases={5: 0},
        cost_estimate=pl.CostEstimate(
            flops=n_steps * n * g * m_pad * 12,
            bytes_accessed=(3 * g + 2 * n + 1) * m_pad * 4,
            transcendentals=n_steps * n * g * m_pad * 2),
    )(means2, logw2, w2, logstd2, target2, init2)

    out = out[:, :m_elems].T.reshape(lead + (h, w_dim, n))
    return jnp.moveaxis(out, -1, -3).astype(scaled_cdfs.dtype)
