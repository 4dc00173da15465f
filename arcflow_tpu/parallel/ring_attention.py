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


def _ring_attention_local(q: Array, k: Array, v: Array,
                          kv_valid: Optional[Array], axis: str,
                          ring_size: int) -> Array:
    """Per-device body (inside shard_map): q/k/v are the local sequence
    shards (B, S/n, H, D); kv_valid is the local (B, S/n) key validity."""
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


def ring_spec(mesh: Mesh, batch, sp_axis: str, head_axes) -> P:
    """(B, S, H, D) spec for the ring layout: seq over sp, heads over
    tensor (per-head attention needs no collective over the head axis)."""
    return P(batch, sp_axis, head_axes or None, None)


def ring_attention(q: Array, k: Array, v: Array, mesh: Mesh, sp_axis: str,
                   kv_valid: Optional[Array] = None,
                   batch=None, head_axes: Tuple[str, ...] = ()) -> Array:
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

    Returns:
        (B, S, H, D) in q.dtype, same sharding as the inputs.
    """
    ring_size = mesh.shape[sp_axis]
    spec = ring_spec(mesh, batch, sp_axis, head_axes)
    kv_spec = P(batch, sp_axis)

    if kv_valid is None:
        def body(ql, kl, vl):
            return _ring_attention_local(ql, kl, vl, None, sp_axis,
                                         ring_size)
        return jax.shard_map(body, mesh=mesh, in_specs=(spec,) * 3,
                             out_specs=spec, check_vma=False)(q, k, v)

    def body(ql, kl, vl, kvl):
        return _ring_attention_local(ql, kl, vl, kvl, sp_axis, ring_size)
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
    from .mesh import _ACT
    mesh = _ACT['mesh']
    if mesh is None or _ACT.get('sp_mode', 'ulysses') != 'ring':
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
