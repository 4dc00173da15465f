"""Ring (context-parallel) attention over the ``sp`` mesh axis.

The second sequence-parallel strategy next to the Ulysses layout
(``mesh.heads_partition``): instead of all-to-all-ing tokens->heads so each
device holds the full sequence for a head slice, every device keeps its
*sequence shard* of q/k/v and the K/V blocks rotate around the ring
(``lax.ppermute`` over neighbouring devices) while a blockwise online
softmax accumulates the output — the standard long-context decomposition
(Ring Attention / blockwise-parallel attention; see PAPERS.md).

When to prefer which (both are selectable per config,
``parallel.sp_mode='ulysses'|'ring'``):

  * Ulysses moves activations once (one all-to-all each side of the kernel)
    and runs the tuned Pallas flash kernel on a full sequence per head
    shard — the fastest layout while ``num_heads %% sp == 0`` holds and the
    full S x head-slice fits one chip.
  * Ring never materializes the full sequence anywhere — S scales with the
    ring size (the sp degree no longer divides the head count), and the
    per-hop ppermute (one neighbour transfer of the local K/V block)
    overlaps with the current block's matmuls on ICI. This is the
    long-context extension point SURVEY.md §5 names ("ring-attention over
    the mesh later").

The reference has no sequence parallelism of any kind (SURVEY.md §2.4:
SP/CP/ring ABSENT; multi-GPU inference is an unshipped To-Do,
reference README.md:39) — this module is capability beyond the reference,
not a port.

Semantics: bidirectional (non-causal) attention, optionally with the
key-padding mask the Qwen joint blocks build (``models/layers.py
key_padding_mask``); softmax statistics accumulate in fp32. Implemented
with ``lax.scan`` so reverse-mode autodiff works (ppermute transposes to
the reverse rotation); the accumulation math mirrors flash attention's
running (m, l, o) triple.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array

_NEG_INF = -1e30   # finite "masked" score: keeps exp()/max() NaN-free


def _ring_body(q: Array, carry, axis: str, ring_size: int, scale: float):
    """One ring hop: accumulate attention of local q against the current
    K/V block, then rotate the block to the next device."""
    o, m, l, k, v, kv_valid = carry
    # scores (B, Sq, H, Skv) in fp32
    s = jnp.einsum('bqhd,bkhd->bqhk', q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    if kv_valid is not None:
        s = jnp.where(kv_valid[:, None, None, :], s, _NEG_INF)
    m_new = jnp.maximum(m, jnp.max(s, axis=-1))
    p = jnp.exp(s - m_new[..., None])
    corr = jnp.exp(m - m_new)
    l = l * corr + jnp.sum(p, axis=-1)
    o = o * corr[..., None] + jnp.einsum(
        'bqhk,bkhd->bqhd', p, v.astype(jnp.float32))
    perm = [(j, (j + 1) % ring_size) for j in range(ring_size)]
    k = jax.lax.ppermute(k, axis, perm)
    v = jax.lax.ppermute(v, axis, perm)
    if kv_valid is not None:
        kv_valid = jax.lax.ppermute(kv_valid, axis, perm)
    return (o, m_new, l, k, v, kv_valid)


def _ring_local_jnp(q: Array, k: Array, v: Array,
                    kv_valid: Optional[Array], axis: str,
                    ring_size: int) -> Array:
    """Per-device body (inside shard_map): q/k/v are the local sequence
    shards (B, S/n, H, D); kv_valid is the local (B, S/n) key validity.
    Plain-XLA blockwise softmax — the portable / differentiable tier."""
    b, sq, h, d = q.shape
    scale = 1.0 / (d ** 0.5)
    o = jnp.zeros((b, sq, h, d), jnp.float32)
    m = jnp.full((b, sq, h), _NEG_INF, jnp.float32)
    l = jnp.zeros((b, sq, h), jnp.float32)

    def step(carry, _):
        return _ring_body(q, carry, axis, ring_size, scale), None

    (o, m, l, *_), _ = jax.lax.scan(
        step, (o, m, l, k, v, kv_valid), None, length=ring_size)
    return (o / jnp.maximum(l, 1e-30)[..., None]).astype(q.dtype)


# ---- flash-kernel hops (TPU fast tier) ------------------------------------

def _hop_block_sizes(sq: int, skv: int, d: int):
    from jax.experimental.pallas.ops.tpu.flash_attention import BlockSizes
    bq = next(bb for bb in (512, 256, 128) if sq % bb == 0)
    bk_major = next(bb for bb in (1536, 1024, 512, 256, 128)
                    if skv % bb == 0)
    bk = min(512, bk_major)
    return BlockSizes(
        block_q=bq, block_k_major=bk_major, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk_major, block_k_dkv=bk,
        block_q_dkv=bq, block_k_major_dq=bk_major, block_k_dq=bk,
        block_q_dq=bq)


def flash_hop_ok(sq: int, d: int) -> bool:
    """Local-shard shapes the tuned Pallas hop kernel accepts."""
    return sq % 128 == 0 and d % 128 == 0


def _hop_stats_pallas(qt: Array, kc: Array, vc: Array,
                      q_ids: Optional[Array], kv_ids: Optional[Array],
                      scale: float):
    """One hop through the tuned Pallas flash kernel, returning the
    normalized block output plus its softmax residuals ``(l, m)``
    (``_flash_attention_impl(save_residuals=True)`` — the same residuals
    the kernel keeps for its own backward). Layout (B, H, S, D)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds, _flash_attention_impl)
    bs = _hop_block_sizes(qt.shape[2], kc.shape[2], qt.shape[3])
    seg = None if kv_ids is None else SegmentIds(q=q_ids, kv=kv_ids)
    o, l, m = _flash_attention_impl(
        qt, kc, vc, None, seg, True, False, scale,
        bs.block_b, bs.block_q, bs.block_k_major, bs.block_k, False)
    return (o.astype(jnp.float32), l.astype(jnp.float32),
            m.astype(jnp.float32))


def _hop_stats_ref(qt: Array, kc: Array, vc: Array,
                   q_ids: Optional[Array], kv_ids: Optional[Array],
                   scale: float):
    """jnp mirror of the Pallas hop contract (normalized o, l, m) — the
    cross-check tier for tests (interpret-mode Pallas cannot run inside a
    multi-device shard_map) and the documentation of the kernel's residual
    semantics: masking is ADDITIVE (score + DEFAULT_MASK_VALUE), so a
    fully-masked row yields m ~= mask_value, l == kv_len, o == mean(v) —
    the ring merge relies on exp(m_i - M) -> 0 to drop that hop, not on
    l == 0."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        DEFAULT_MASK_VALUE)
    s = jnp.einsum('bhqd,bhkd->bhqk', qt.astype(jnp.float32),
                   kc.astype(jnp.float32)) * scale
    if kv_ids is not None:
        valid = q_ids[:, None, :, None] == kv_ids[:, None, None, :]
        s = s + jnp.where(valid, 0.0, DEFAULT_MASK_VALUE)
    m = jnp.max(s, axis=-1)
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)
    o = jnp.einsum('bhqk,bhkd->bhqd', p / l[..., None],
                   vc.astype(jnp.float32))
    return o, l, m


# module-level binding so tests can swap in the jnp mirror under shard_map
_hop_stats = _hop_stats_pallas


def _ring_flash_core(axis: str, ring_size: int, q: Array, k: Array,
                     v: Array, kv_valid: Optional[Array]) -> Array:
    """Ring with the tuned Pallas flash kernel per hop: each hop returns its
    normalized block output plus softmax stats ``(l, m)`` and hops merge in
    fp32 by the standard two-level flash decomposition:

        w_i = l_i * exp(m_i - M),   o = sum_i o_i w_i / sum_i w_i.
    """
    b, sq, h, d = q.shape
    scale = 1.0 / (d ** 0.5)
    qt = q.transpose(0, 2, 1, 3)                      # (B, H, Sq, D)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    q_ids = jnp.zeros((b, sq), jnp.int32)
    kv_ids = None if kv_valid is None else \
        jnp.where(kv_valid, 0, 1).astype(jnp.int32)

    def hop(carry, _):
        acc, m_acc, l_acc, kc, vc, idc = carry
        o_i, l_i, m_i = _hop_stats(qt, kc, vc, q_ids, idc, scale)
        # a fully-masked visiting block yields m_i ~= DEFAULT_MASK_VALUE
        # (-2.4e38) with l_i == kv_len: exp(m_i - m_new) underflows to 0,
        # so its contribution vanishes (m_acc init -1e30 > mask_value keeps
        # m_new sane even when every hop is masked)
        m_new = jnp.maximum(m_acc, m_i)
        c1 = l_acc * jnp.exp(m_acc - m_new)
        c2 = l_i * jnp.exp(m_i - m_new)
        acc = acc * jnp.exp(m_acc - m_new)[..., None] + o_i * c2[..., None]
        perm = [(j, (j + 1) % ring_size) for j in range(ring_size)]
        kc = jax.lax.ppermute(kc, axis, perm)
        vc = jax.lax.ppermute(vc, axis, perm)
        if idc is not None:
            idc = jax.lax.ppermute(idc, axis, perm)
        return (acc, m_new, c1 + c2, kc, vc, idc), None

    acc = jnp.zeros((b, h, sq, d), jnp.float32)
    m0 = jnp.full((b, h, sq), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, h, sq), jnp.float32)
    (acc, _, l_acc, *_), _ = jax.lax.scan(
        hop, (acc, m0, l0, kt, vt, kv_ids), None, length=ring_size)
    out = acc / jnp.maximum(l_acc, 1e-30)[..., None]
    return out.transpose(0, 2, 1, 3).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _ring_local_flash(axis: str, ring_size: int, q: Array, k: Array,
                      v: Array, kv_valid: Optional[Array]) -> Array:
    return _ring_flash_core(axis, ring_size, q, k, v, kv_valid)


def _ring_flash_fwd(axis, ring_size, q, k, v, kv_valid):
    return (_ring_flash_core(axis, ring_size, q, k, v, kv_valid),
            (q, k, v, kv_valid))


def _ring_flash_bwd(axis, ring_size, res, g):
    # rematerialize through the differentiable jnp tier (same numerics)
    q, k, v, kv_valid = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _ring_local_jnp(q_, k_, v_, kv_valid, axis,
                                           ring_size), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_ring_local_flash.defvjp(_ring_flash_fwd, _ring_flash_bwd)


def _ring_attention_local(q: Array, k: Array, v: Array,
                          kv_valid: Optional[Array], axis: str,
                          ring_size: int, use_flash: bool) -> Array:
    if use_flash:
        return _ring_local_flash(axis, ring_size, q, k, v, kv_valid)
    return _ring_local_jnp(q, k, v, kv_valid, axis, ring_size)


def ring_spec(mesh: Mesh, batch, sp_axis: str, head_axes) -> P:
    """(B, S, H, D) spec for the ring layout: seq over sp, heads over
    tensor (per-head attention needs no collective over the head axis)."""
    return P(batch, sp_axis, head_axes or None, None)


def ring_attention(q: Array, k: Array, v: Array, mesh: Mesh, sp_axis: str,
                   kv_valid: Optional[Array] = None,
                   batch=None, head_axes: Tuple[str, ...] = (),
                   use_flash: Optional[bool] = None) -> Array:
    """Context-parallel attention on (B, S, H, D) with seq sharded over
    ``sp_axis``; K/V blocks rotate the ring, no device ever holds the full
    sequence.

    Args:
        q, k, v: (B, S, H, D) global arrays (any layout; the shard_map
            in_specs re-constrain to the ring layout).
        mesh: ambient mesh containing ``sp_axis``.
        kv_valid: optional (B, S) bool key-padding validity (True = attend).
        batch: mesh axis (or tuple) the batch dim shards over, or None.
        head_axes: mesh axes the head dim shards over (tensor parallelism
            composes freely — heads split without any ring interaction).
        use_flash: run each hop through the tuned Pallas flash kernel and
            merge hops by their (o, l, m) softmax stats. Default: auto —
            on TPU whenever the local shard shapes qualify. The flash tier
            carries a custom_vjp that rematerializes gradients through the
            jnp tier.

    Returns:
        (B, S, H, D) in q.dtype, same sharding as the inputs.
    """
    ring_size = mesh.shape[sp_axis]
    spec = ring_spec(mesh, batch, sp_axis, head_axes)
    kv_spec = P(batch, sp_axis)
    if use_flash is None:
        use_flash = (jax.default_backend() == 'tpu'
                     and flash_hop_ok(q.shape[1] // ring_size, q.shape[3]))

    if kv_valid is None:
        def body(ql, kl, vl):
            return _ring_attention_local(ql, kl, vl, None, sp_axis,
                                         ring_size, use_flash)
        return jax.shard_map(body, mesh=mesh, in_specs=(spec,) * 3,
                             out_specs=spec, check_vma=False)(q, k, v)

    def body(ql, kl, vl, kvl):
        return _ring_attention_local(ql, kl, vl, kvl, sp_axis, ring_size,
                                     use_flash)
    return jax.shard_map(body, mesh=mesh,
                         in_specs=(spec, spec, spec, kv_spec),
                         out_specs=spec, check_vma=False)(q, k, v, kv_valid)


def ring_partition(q_shape) -> Optional[Tuple[Mesh, str, object, Tuple]]:
    """(mesh, sp_axis, batch_axes, head_axes) when the ambient activation
    mesh requests ring mode and the shapes divide; None otherwise.

    Requirements: S %% sp == 0 (sequence shards) and, when a tensor axis is
    present, H %% tensor == 0 (head shards) — note no constraint ties sp to
    the head count, which is exactly ring's advantage over Ulysses.
    """
    from .mesh import _ACT, pipeline_active
    mesh = _ACT['mesh']
    if mesh is None or _ACT.get('sp_mode', 'ulysses') != 'ring' \
            or pipeline_active():
        return None
    sp = _ACT['sp_axis']
    if mesh.shape.get(sp, 1) <= 1 or q_shape[1] % mesh.shape[sp] != 0:
        return None
    tp = _ACT['tensor_axis']
    head_axes: Tuple[str, ...] = ()
    if mesh.shape.get(tp, 1) > 1:
        if q_shape[2] % mesh.shape[tp] != 0:
            return None
        head_axes = (tp,)
    batch = tuple(a for a in _ACT['batch_axes']
                  if mesh.shape.get(a, 1) > 1) or None
    if batch and q_shape[0] % int(np.prod([mesh.shape[a]
                                           for a in batch])) != 0:
        batch = None
    return mesh, sp, batch, head_axes
