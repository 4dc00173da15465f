"""Pipeline parallelism over a ``pipe`` mesh axis (GPipe schedule).

The reference has NO pipeline parallelism (SURVEY.md §2.4: PP ABSENT) —
this is capability beyond the reference, the third beyond-reference
scaling axis next to TP and SP/ring.

Design (TPU-first): the DiT blocks already run under ``nn.scan``, so the
per-layer parameters are one stacked pytree with a leading layer dim
``(L, ...)``. Pipelining is then *just a different schedule over the same
stacked tree*:

  * the layer dim shards over the ``pipe`` mesh axis — each of the S
    stages holds L/S contiguous layers (``stacked_param_spec``), so model
    memory scales 1/S like FSDP but with **no all-gather of weights at
    all**: parameters never move, activations do;
  * a ``shard_map`` manual over ONLY the pipe axis (``axis_names=
    {'pipe'}``) runs the GPipe loop; every other mesh axis (data, fsdp,
    tensor, sp) stays in GSPMD "auto" mode inside the stage body, so
    pipeline composes with the existing activation-sharding constraints
    without re-deriving any of their collectives by hand;
  * the batch splits into M microbatches; each step every stage applies
    its local layers (one ``lax.scan``) to its current microbatch and
    hands the result to the next stage with a neighbour ``ppermute`` —
    on TPU that is one ICI hop, the cheapest collective there is. The
    classic GPipe bubble costs (S-1)/(M+S-1) idle fraction;
  * stage outputs are emitted as scan *outputs* (ys), not carried state,
    so reverse-mode autodiff stores O(T) microbatch activations — the
    same footprint GPipe needs anyway — instead of T full output buffers.

Differentiable end to end (ppermute/all_gather/scan transpose cleanly),
composes
with ``jax.checkpoint`` per block, and works with any carry pytree — the
FLUX dual-stream (img, txt) tuple included.

Inside the stage body the Pallas flash-attention kernel is unavailable
when any auto axis is >1 (a nested manual shard_map cannot open inside a
partially-manual region, and GSPMD cannot partition a Pallas custom call)
— attention falls back to XLA's fused kernel there; ``models/layers.py``
gates this via ``pipeline_active``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def pipe_partition(n_layers: int, batch_size: Optional[int] = None
                   ) -> Optional[Tuple[Mesh, str, Optional[int], int]]:
    """(mesh, pipe_axis, microbatches, interleave) when the ambient
    activation mesh has an active pipe axis that divides ``n_layers``;
    None otherwise (plain ``nn.scan`` runs instead).

    ``batch_size`` (when known) additionally requires at least one valid
    microbatch split — with an indivisible batch the pipeline still runs
    with M=1 (correct, bubble-heavy), so this only rejects batch_size==0.

    ``interleave`` (V > 1, the circular schedule) additionally requires
    n_layers % (stages * V) == 0; it degrades to 1 otherwise.
    """
    from .mesh import _ACT
    mesh = _ACT['mesh']
    if mesh is None:
        return None
    axis = _ACT.get('pipe_axis', 'pipe')
    size = mesh.shape.get(axis, 1)
    if size <= 1 or n_layers % size != 0:
        return None
    if batch_size is not None and batch_size <= 0:
        return None
    interleave = int(_ACT.get('pipe_interleave', 1) or 1)
    if interleave > 1 and n_layers % (size * interleave) != 0:
        interleave = 1
    return mesh, axis, _ACT.get('pipe_microbatches'), interleave


def _pick_microbatches(batch: int, stages: int,
                       requested: Optional[int]) -> int:
    """Largest valid microbatch count <= requested (default: the stage
    count — the minimum that keeps every stage busy once full)."""
    want = requested if requested is not None else stages
    m = max(1, min(want, batch))
    while batch % m != 0:
        m -= 1
    return m


def pipeline_scan(apply_layer: Callable[[Dict, Any, Any, jax.Array], Any],
                  stacked_vars: Dict[str, Any], carry: Any, broadcast: Any,
                  mesh: Mesh, pipe_axis: str = 'pipe',
                  microbatches: Optional[int] = None,
                  interleave: int = 1) -> Any:
    """Run ``L`` stacked layers as an S-stage GPipe pipeline over
    ``pipe_axis``; a drop-in schedule replacement for
    ``lax.scan(apply_layer, carry, stacked_vars)``.

    Args:
        apply_layer: ``(layer_vars, carry, broadcast, layer_idx) -> carry``
            for ONE layer; ``layer_vars`` is ``stacked_vars`` with the
            leading layer dim sliced away, ``layer_idx`` the global layer
            index (traced int32) for per-layer rng folding.
        stacked_vars: dict of flax collections ({'params': ..., 'quant':
            ...}); every leaf has leading dim L, sharded over ``pipe_axis``
            (``stacked_param_spec``).
        carry: activation pytree, leaves (B, ...). Replicated over pipe.
        broadcast: layer-invariant pytree (rope tables, temb, masks, rng
            keys) — replicated over pipe, auto-sharded elsewhere.
        mesh: ambient mesh containing ``pipe_axis``.
        microbatches: batch splits M (clamped to a divisor of B);
            default = the stage count. Bubble fraction (S-1)/(M+S-1).
        interleave: V virtual stages per device (the circular schedule):
            each device holds V *strided* layer chunks — chunk c of S*V
            goes to stage c mod S, one static permutation of the stacked
            dim — and a microbatch rings around the stages V times. The
            handoff from chunk v on the last stage to chunk v+1 on stage 0
            is the same neighbour ppermute, which lines up exactly when
            M == S, so V > 1 requires (and forces) M = S. Bubble drops to
            (S-1)/(V*S + S - 1) — ~1/V of plain GPipe at M=S — for the
            same weights-never-move property and V x the ppermute count
            (ppermutes move one microbatch of activations, noise next to
            the chunk matmuls).

    Returns:
        carry pytree after all L layers, replicated over pipe.
    """
    stages = mesh.shape[pipe_axis]
    n_layers = jax.tree.leaves(stacked_vars)[0].shape[0]
    assert n_layers % stages == 0, (n_layers, stages)
    b = jax.tree.leaves(carry)[0].shape[0]
    m = _pick_microbatches(b, stages, microbatches)

    v_chunks = max(1, int(interleave))
    if v_chunks > 1 and (m != stages
                         or n_layers % (stages * v_chunks) != 0):
        v_chunks = 1   # circular handoff needs M == S and L % (S*V) == 0
    l_local = n_layers // stages          # layers per device
    l_chunk = l_local // v_chunks         # layers per virtual stage
    if v_chunks > 1:
        # reorder the layer dim so each stage's V strided chunks become
        # contiguous under the P('pipe') shard: stage s gets chunks
        # [s, S+s, 2S+s, ...] (in ring-visit order v=0..V-1)
        perm = np.concatenate(
            [np.arange(c * l_chunk, (c + 1) * l_chunk)
             for s in range(stages)
             for c in (v * stages + s for v in range(v_chunks))])
        stacked_vars = jax.tree.map(lambda x: x[perm], stacked_vars)

    # the B -> (M, B/M) split needs no explicit pin: GSPMD propagates the
    # producer's batch/sp layout through the reshape cleanly (an explicit
    # per-view constraint here was measured to CAUSE involuntary-remat
    # resharding on the ride-along (M, B/M, D) views — see the HLO audit)
    mb = jax.tree.map(lambda x: x.reshape(m, b // m, *x.shape[1:]), carry)

    # every value crossing the shard_map boundary (and the output gather)
    # travels in f32: the reverse-mode psum-over-pipe of a replicated
    # input's cotangent otherwise lowers to a bf16 all-reduce whose
    # reduction region XLA:CPU's ChangeOpDataType pass crashes cloning
    # (shardy leaves a Sharding custom-call as the region root); f32
    # all-reduces never enter that pass. Costs one upcast of the pipeline
    # entry/exit activations — noise next to the block matmuls.
    def _widen(x):
        return x.astype(jnp.float32) \
            if jnp.issubdtype(x.dtype, jnp.floating) else x

    def _narrow_like(proto):
        return lambda x: x.astype(proto.dtype) \
            if jnp.issubdtype(proto.dtype, jnp.floating) else x

    mb_proto, bc_proto = mb, broadcast
    mb32 = jax.tree.map(_widen, mb)
    bc32 = jax.tree.map(_widen, broadcast)

    def body(sv_local, mb, bc):
        mb = jax.tree.map(lambda p, x: _narrow_like(p)(x), mb_proto, mb)
        bc = jax.tree.map(lambda p, x: _narrow_like(p)(x), bc_proto, bc)
        stage = jax.lax.axis_index(pipe_axis)
        # local layers (V*Lc, ...) -> (V, Lc, ...): dim 0 selects the
        # virtual stage (chunk) in ring-visit order
        sv_chunks = jax.tree.map(
            lambda x: x.reshape(v_chunks, l_chunk, *x.shape[1:]), sv_local)

        def run_chunk(c, v):
            sv_v = jax.tree.map(
                lambda x: jax.lax.dynamic_index_in_dim(x, v, 0, False),
                sv_chunks)
            base = (v * stages + stage) * l_chunk   # global chunk offset

            def one(c2, xs):
                sv_i, li = xs
                return apply_layer(sv_i, c2, bc, base + li), None
            out, _ = jax.lax.scan(
                one, c, (sv_v, jnp.arange(l_chunk, dtype=jnp.int32)))
            return out

        state = jax.tree.map(lambda x: jnp.zeros_like(x[0]), mb)
        total = v_chunks * m + stages - 1
        perm = [(j, (j + 1) % stages) for j in range(stages)]

        def step(st, t):
            g = t - stage                         # this stage's progress
            v = jnp.clip(g // m, 0, v_chunks - 1)   # current chunk
            # stage 0 ingests fresh microbatches during its first chunk;
            # afterwards every stage (0 included: the chunk v -> v+1
            # ring-wrap) uses what the previous stage handed it last step
            inject = jnp.logical_and(stage == 0, t < m)
            inp = jax.tree.map(
                lambda buf, s: jnp.where(inject,
                                         buf[jnp.clip(t, 0, m - 1)], s),
                mb, st)
            out = run_chunk(inp, v)
            nxt = jax.tree.map(
                lambda o: jax.lax.ppermute(o, pipe_axis, perm), out)
            return nxt, out

        _, ys = jax.lax.scan(step, state,
                             jnp.arange(total, dtype=jnp.int32))
        # the last stage's LAST-chunk outputs at steps
        # (V-1)*M + S-1 .. T-1 are the finished microbatches 0 .. M-1, in
        # order; every other stage's ys are in-flight values — all-gather
        # over the ring (in f32, see the boundary note above: its
        # transpose is a reduce-scatter) and keep the last stage's buffer
        drop = (v_chunks - 1) * m + stages - 1
        return jax.tree.map(
            lambda y: jax.lax.all_gather(
                _widen(y[drop:]), pipe_axis)[stages - 1], ys)

    param_specs = jax.tree.map(lambda _: P(pipe_axis), stacked_vars)
    outs = jax.shard_map(body, mesh=mesh,
                         in_specs=(param_specs, P(), P()), out_specs=P(),
                         axis_names={pipe_axis},
                         check_vma=False)(stacked_vars, mb32, bc32)
    return jax.tree.map(
        lambda y, c: y.reshape(b, *c.shape[1:]).astype(c.dtype), outs, carry)
