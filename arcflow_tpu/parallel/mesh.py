"""Device mesh + sharding rules: the TPU-native replacement for the
reference's DDP/FSDP1/FSDP2 wrapper zoo (``lakonlab/parallel/*``).

One ``jax.sharding.Mesh`` with named axes replaces all three wrappers
(SURVEY.md §2.4 mapping):

  * DDP              == mesh ('data',), params replicated, batch sharded;
  * FSDP / ZeRO-3    == params sharded over 'fsdp', XLA inserts the
                        all-gather/reduce-scatter pairs the reference got
                        from torch FSDP per-block wrapping;
  * HYBRID_SHARD     == 2-D mesh ('data', 'fsdp'): fsdp axis on ICI,
                        replicate axis on DCN;
  * TP               == shard the attention/MLP feature dims over 'tensor'
                        (the reference has no TP; this is the planned
                        extension, SURVEY.md §2.4).

Teacher/student/EMA weight tying needs no machinery at all: the shared base
tree is sharded once and referenced from every role.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def setup_distributed(dist_cfg: Optional[Dict] = None) -> bool:
    """Multihost bring-up: ``jax.distributed.initialize`` (the reference's
    ``init_dist(launcher, backend='nccl')``, train.py:182-185).

    Called once before any other jax API. Config block::

        dist_params = dict(coordinator_address='host:port',  # or env/auto
                           num_processes=N, process_id=i)

    With no explicit values, jax auto-detects from the cluster environment
    (TPU pod metadata / JAX_COORDINATOR_ADDRESS + JAX_NUM_PROCESSES +
    JAX_PROCESS_ID). Returns True if a multi-process runtime was started.
    """
    import os
    cfg = dict(dist_cfg or {})
    env_np = os.environ.get('JAX_NUM_PROCESSES')
    num_processes = cfg.get('num_processes',
                            int(env_np) if env_np else None)
    if num_processes is None or int(num_processes) <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=cfg.get(
            'coordinator_address', os.environ.get('JAX_COORDINATOR_ADDRESS')),
        num_processes=int(num_processes),
        process_id=cfg.get('process_id',
                           int(os.environ.get('JAX_PROCESS_ID', 0))),
        local_device_ids=cfg.get('local_device_ids'))
    return True


def make_mesh(axes: Dict[str, int], devices: Optional[Sequence] = None,
              dcn_axes: Optional[Dict[str, int]] = None) -> Mesh:
    """Build a mesh from {'data': d, 'fsdp': f, ...}; sizes must multiply to
    the device count (use -1 for one inferred axis).

    ``dcn_axes`` ({axis_name: n_slices}) requests DCN-aware ordering on
    multihost: those axes span slices/hosts (data-center network) while the
    remaining axes stay within a slice (ICI) — the reference's HYBRID_SHARD
    (replicate inter-node, shard intra-node; fsdp_wrapper.py:182-199) maps to
    dcn_axes={'data': n_nodes} + ICI fsdp.
    """
    names = tuple(axes.keys())
    sizes = list(axes.values())
    n_devices = len(devices) if devices is not None else jax.device_count()
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        if dcn_axes:
            known *= int(np.prod(list(dcn_axes.values())))
        sizes[sizes.index(-1)] = n_devices // known
    if dcn_axes:
        from jax.experimental import mesh_utils
        ici_shape = tuple(sizes)
        dcn_shape = tuple(dcn_axes.get(n, 1) for n in names)
        total = int(np.prod(ici_shape)) * int(np.prod(dcn_shape))
        assert total == n_devices, \
            f'ici {ici_shape} x dcn {dcn_shape} != {n_devices} devices'
        dev_list = list(devices) if devices is not None else None
        try:
            dev_array = mesh_utils.create_hybrid_device_mesh(
                ici_shape, dcn_shape, devices=dev_list)
        except ValueError:
            try:    # multi-process CPU/GPU: processes are the granules
                dev_array = mesh_utils.create_hybrid_device_mesh(
                    ici_shape, dcn_shape, devices=dev_list,
                    process_is_granule=True)
            except ValueError:
                # simulator fallback (single process, no slice attribute):
                # plain reshape with the dcn axes outermost — topology-
                # equivalent on simulated devices
                combined = [d * i for d, i in zip(dcn_shape, ici_shape)]
                dev_array = np.asarray(
                    dev_list if dev_list is not None else jax.devices()
                ).reshape(combined)
        # hybrid mesh shape = dcn_shape * ici_shape elementwise
        return Mesh(dev_array, names)
    assert int(np.prod(sizes)) == n_devices, \
        f'mesh {dict(zip(names, sizes))} != {n_devices} devices'
    devices = list(devices if devices is not None else jax.devices())
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, names)


def fsdp_spec_for(x, axis_name: str, axis_size: int,
                  min_size: int = 2 ** 16) -> P:
    """ZeRO-3-style spec: shard the largest divisible dim of big arrays."""
    if not hasattr(x, 'shape') or x.size < min_size:
        return P()
    dims = sorted(range(x.ndim), key=lambda d: -x.shape[d])
    for d in dims:
        if x.shape[d] % axis_size == 0 and x.shape[d] >= axis_size:
            spec = [None] * x.ndim
            spec[d] = axis_name
            return P(*spec)
    return P()


def param_spec_for(x, fsdp_axis: Optional[str], fsdp_size: int,
                   tensor_axis: Optional[str] = None, tensor_size: int = 1,
                   min_size: int = 2 ** 16) -> P:
    """Combined megatron-style TP + ZeRO-3 spec for one parameter.

    The feature (last) dim shards over 'tensor' when divisible; the largest
    remaining dim shards over 'fsdp'. Scan-stacked block params (L, in, out)
    naturally get P(None|fsdp, ..., tensor).
    """
    if not hasattr(x, 'shape') or x.size < min_size or x.ndim == 0:
        return P()
    spec = [None] * x.ndim
    if (tensor_axis and tensor_size > 1 and x.ndim >= 2
            and x.shape[-1] % tensor_size == 0 and x.shape[-1] >= tensor_size):
        spec[-1] = tensor_axis
    if fsdp_axis and fsdp_size > 1:
        dims = sorted(range(x.ndim), key=lambda d: -x.shape[d])
        for d in dims:
            if spec[d] is None and x.shape[d] % fsdp_size == 0 \
                    and x.shape[d] >= fsdp_size:
                spec[d] = fsdp_axis
                break
    return P(*spec)


def fsdp_shard_params(params: Any, mesh: Mesh, axis: str = 'fsdp',
                      min_size: int = 2 ** 16) -> Any:
    """PartitionSpec tree for parameter sharding over the fsdp axis."""
    axis_size = mesh.shape[axis]
    return jax.tree.map(
        lambda x: NamedSharding(mesh, fsdp_spec_for(x, axis, axis_size,
                                                    min_size)), params)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def batch_axes(mesh: Mesh, axis='data', extra=('fsdp',)) -> Tuple[str, ...]:
    """Axes the batch dim shards over: 'data' plus any present ``extra``
    axes. FSDP devices hold different param shards but must also see
    different batch shards — replicating the batch across the fsdp axis
    wastes fsdp_size x compute (torch FSDP/ZeRO-3 shards the batch across
    all ranks)."""
    names = [axis] + [e for e in extra if mesh.shape.get(e, 1) > 1]
    return tuple(n for n in names if n in mesh.shape.keys())


def batch_sharding(mesh: Mesh, axis='data', extra=('fsdp',)) -> NamedSharding:
    """Shard batches over (data, fsdp) on the leading dim."""
    return NamedSharding(mesh, P(batch_axes(mesh, axis, extra)))


def param_spec_for_path(path: str, x, mesh: Mesh,
                        fsdp_axis: Optional[str] = 'fsdp',
                        tensor_axis: Optional[str] = 'tensor',
                        pipe_axis: Optional[str] = 'pipe',
                        expert_axis: Optional[str] = 'expert',
                        stacked_markers: Sequence[str] = ('blocks',),
                        moe_markers: Sequence[str] = ('moe',),
                        min_size: int = 2 ** 16) -> P:
    """Path-aware placement spec for one parameter: the single source of
    truth dispatching between MoE expert leaves (expert dim -> 'expert'),
    scan-stacked block leaves (layer dim -> 'pipe') and the generic
    TP+ZeRO-3 rule — used by ``shard_state``, the bench builds and the
    serving pipelines."""
    def size(axis):
        return mesh.shape.get(axis, 1) if axis else 1
    fsdp, tensor = size(fsdp_axis), size(tensor_axis)
    pipe, expert = size(pipe_axis), size(expert_axis)
    stacked = any(m in path for m in stacked_markers)
    if expert > 1 and any(m in path for m in moe_markers):
        return moe_param_spec(x, expert_axis, expert, stacked=stacked,
                              pipe_axis=pipe_axis, pipe_size=pipe,
                              fsdp_axis=fsdp_axis, fsdp_size=fsdp,
                              tensor_axis=tensor_axis, tensor_size=tensor,
                              min_size=min_size)
    if pipe > 1 and stacked:
        return stacked_param_spec(x, pipe_axis, pipe, fsdp_axis, fsdp,
                                  tensor_axis, tensor, min_size)
    return param_spec_for(x, fsdp_axis, fsdp, tensor_axis, tensor, min_size)


def shard_state(state, mesh: Mesh, fsdp_axis: str = 'fsdp',
                tensor_axis: Optional[str] = None, min_size: int = 2 ** 16,
                pipe_axis: Optional[str] = 'pipe',
                stacked_markers: Sequence[str] = ('blocks',),
                expert_axis: Optional[str] = 'expert',
                moe_markers: Sequence[str] = ('moe',)):
    """Place a TrainState on the mesh: large params/opt-state/EMA sharded over
    fsdp (+ optional tensor axis on feature dims), scalars/rng replicated.
    When the mesh has an active ``pipe_axis``, scan-stacked block leaves
    (path contains a ``stacked_markers`` substring) pin their layer dim to
    it (parallel/pipeline.py — each pipeline stage owns its layers); with
    an active ``expert_axis``, MoE leaves (``moe_markers``) pin their
    expert dim to it (EP — each device owns its experts).
    Returns (sharded_state, sharding_tree)."""
    def spec_of(path, x):
        ps = '/'.join(str(getattr(k, 'key', k)) for k in path)
        return NamedSharding(mesh, param_spec_for_path(
            ps, x, mesh, fsdp_axis=fsdp_axis, tensor_axis=tensor_axis,
            pipe_axis=pipe_axis, expert_axis=expert_axis,
            stacked_markers=stacked_markers, moe_markers=moe_markers,
            min_size=min_size))
    shardings = jax.tree_util.tree_map_with_path(spec_of, state)
    placed = jax.tree.map(
        lambda x, s: jax.device_put(x, s), state, shardings)
    return placed, shardings


# ---- activation sharding (megatron-style tensor parallelism) --------------
#
# Param sharding alone is TP-in-name-only: without activation constraints
# XLA mostly all-gathers the weights back. These constraints pin the
# attention heads and MLP hidden activations to the tensor axis so GSPMD
# derives the megatron pattern (column-parallel qkv/in_proj, row-parallel
# out projections with a psum) by itself.

_ACT = {'mesh': None, 'batch_axes': ('data', 'fsdp'),
        'tensor_axis': 'tensor', 'sp_axis': 'sp', 'sp_mode': 'ulysses',
        'pipe_axis': 'pipe', 'pipe_microbatches': None,
        'pipe_interleave': 1, 'expert_axis': 'expert'}


def set_activation_sharding(mesh: Optional[Mesh],
                            batch_axes: Sequence[str] = ('data', 'fsdp'),
                            tensor_axis: str = 'tensor',
                            sp_axis: str = 'sp',
                            sp_mode: str = 'ulysses',
                            pipe_axis: str = 'pipe',
                            pipe_microbatches: Optional[int] = None,
                            pipe_interleave: int = 1,
                            expert_axis: str = 'expert') -> None:
    """Enable activation constraints inside model code (trace-time global:
    set it before the train/inference step is first traced).

    ``sp_axis`` adds sequence parallelism (absent in the reference;
    SURVEY §2.4 planned extension) in one of two layouts (``sp_mode``):

      * ``'ulysses'`` (default): token activations shard over the sequence
        dim everywhere except inside attention, where they re-shard to
        heads — GSPMD inserts the all-to-alls and each device runs the
        tuned flash kernel on the full sequence for its head slice. This
        is the multi-chip *single-image latency* axis (the v5p-8 north
        star).
      * ``'ring'``: the sequence stays sharded inside attention too and
        K/V blocks rotate the ring (parallel/ring_attention.py) — no
        device ever holds the full sequence, so S scales past the point
        where a head slice's full-S workspace fits, and sp need not
        divide the head count.

    ``pipe_axis`` adds pipeline parallelism (also absent in the reference;
    parallel/pipeline.py): the scan-stacked DiT block params shard their
    layer dim over ``pipe`` and run as a microbatched GPipe schedule —
    weights never move, activations hop stage-to-stage over ICI.
    ``pipe_microbatches`` overrides the microbatch count (default: the
    stage count); ``pipe_interleave`` > 1 selects the circular schedule
    (V virtual stages per device, ~1/V the GPipe bubble —
    parallel/pipeline.py).

    ``expert_axis`` adds expert parallelism for MoE layers (also absent in
    the reference): expert weights (E, D, F) shard their expert dim over
    it and the dispatched (B, E, C, D) activations pin the same axis, so
    GSPMD keeps each expert's FFN local and reduces only the combine."""
    assert sp_mode in ('ulysses', 'ring'), sp_mode
    _ACT.update(mesh=mesh, batch_axes=tuple(batch_axes),
                tensor_axis=tensor_axis, sp_axis=sp_axis, sp_mode=sp_mode,
                pipe_axis=pipe_axis, pipe_microbatches=pipe_microbatches,
                pipe_interleave=pipe_interleave, expert_axis=expert_axis)


def sequence_parallel_active() -> bool:
    """True when the ambient mesh shards activations over tensor/sp — used
    to route attention through XLA (partitionable) instead of the Pallas
    kernel (which requires manual sharding)."""
    mesh = _ACT['mesh']
    if mesh is None:
        return False
    return (mesh.shape.get(_ACT['tensor_axis'], 1) > 1
            or mesh.shape.get(_ACT['sp_axis'], 1) > 1)


def pipeline_active() -> bool:
    """True when the ambient mesh pipelines the DiT blocks over a 'pipe'
    axis (parallel/pipeline.py). Block bodies then run inside a shard_map
    manual over pipe — a region where a *nested* manual shard_map cannot
    open, so the Ulysses/ring attention partitions (and, when any auto
    axis is >1, the Pallas flash kernel) must stand down in favour of
    GSPMD-partitionable XLA attention."""
    mesh = _ACT['mesh']
    return mesh is not None and mesh.shape.get(_ACT['pipe_axis'], 1) > 1


def stacked_param_spec(x, pipe_axis: str, pipe_size: int,
                       fsdp_axis: Optional[str] = None, fsdp_size: int = 1,
                       tensor_axis: Optional[str] = None,
                       tensor_size: int = 1, min_size: int = 2 ** 16) -> P:
    """Spec for a scan-stacked block parameter (L, ...): the layer dim
    shards over 'pipe' (each pipeline stage holds its own layers — weights
    never move); remaining dims keep the usual TP/FSDP placement."""
    if not hasattr(x, 'shape') or x.ndim < 1 or x.shape[0] % pipe_size != 0:
        return param_spec_for(x, fsdp_axis, fsdp_size, tensor_axis,
                              tensor_size, min_size)
    spec = [None] * x.ndim
    spec[0] = pipe_axis
    if x.size >= min_size:
        if (tensor_axis and tensor_size > 1 and x.ndim >= 2
                and x.shape[-1] % tensor_size == 0):
            spec[-1] = tensor_axis
        if fsdp_axis and fsdp_size > 1:
            dims = sorted(range(1, x.ndim), key=lambda d: -x.shape[d])
            for d in dims:
                if spec[d] is None and x.shape[d] % fsdp_size == 0 \
                        and x.shape[d] >= fsdp_size:
                    spec[d] = fsdp_axis
                    break
    return P(*spec)


def moe_param_spec(x, expert_axis: str, expert_size: int,
                   stacked: bool = False, pipe_axis: Optional[str] = None,
                   pipe_size: int = 1, fsdp_axis: Optional[str] = None,
                   fsdp_size: int = 1, tensor_axis: Optional[str] = None,
                   tensor_size: int = 1, min_size: int = 2 ** 16) -> P:
    """Spec for an MoE expert parameter: (E, D, F) — or (L, E, D, F) when
    ``stacked`` under nn.scan blocks — pins the expert dim to the expert
    axis (each device owns its experts, EP), the layer dim to pipe when
    active, and the remaining dims to the usual TP/FSDP placement."""
    if not hasattr(x, 'shape') or x.ndim < 1:
        return P()
    spec = [None] * x.ndim
    ed = 0
    if stacked:
        ed = 1
        if pipe_axis and pipe_size > 1 and x.shape[0] % pipe_size == 0:
            spec[0] = pipe_axis
    if expert_size > 1 and x.ndim > ed and x.shape[ed] % expert_size == 0:
        spec[ed] = expert_axis
    if x.size >= min_size:
        if (tensor_axis and tensor_size > 1 and x.ndim >= ed + 2
                and x.shape[-1] % tensor_size == 0):
            spec[-1] = tensor_axis
        if fsdp_axis and fsdp_size > 1:
            dims = sorted(range(ed + 1, x.ndim), key=lambda d: -x.shape[d])
            for d in dims:
                if spec[d] is None and x.shape[d] % fsdp_size == 0 \
                        and x.shape[d] >= fsdp_size:
                    spec[d] = fsdp_axis
                    break
    return P(*spec)


def heads_partition(q_shape) -> Optional[Tuple[Mesh, P]]:
    """(mesh, PartitionSpec) for ``shard_map``-ing attention on a
    (B, S, H, D) tensor when the ambient mesh shards activations over
    sp/tensor; ``None`` when inapplicable (no mesh, no sp/tensor axes, or
    heads not divisible by the head-shard size).

    This is how the Pallas flash kernel (which cannot be GSPMD-partitioned)
    runs under sequence/tensor parallelism: each device gets the full
    sequence for its head slice — exactly the Ulysses layout that
    ``shard_activation(x, 'heads')`` pins.
    """
    mesh = _ACT['mesh']
    if mesh is None or _ACT.get('sp_mode', 'ulysses') == 'ring' \
            or pipeline_active():
        return None
    head_axes = tuple(a for a in (_ACT['sp_axis'], _ACT['tensor_axis'])
                      if mesh.shape.get(a, 1) > 1)
    if not head_axes:
        return None
    if q_shape[2] % int(np.prod([mesh.shape[a] for a in head_axes])) != 0:
        return None
    batch = tuple(a for a in _ACT['batch_axes']
                  if mesh.shape.get(a, 1) > 1) or None
    if batch and q_shape[0] % int(np.prod([mesh.shape[a]
                                           for a in batch])) != 0:
        batch = None
    return mesh, P(batch, None, head_axes, None)


def clear_activation_sharding() -> None:
    _ACT['mesh'] = None


class activation_sharding:
    """Context manager form of set/clear_activation_sharding."""

    def __init__(self, mesh, **kw):
        self.mesh, self.kw = mesh, kw

    def __enter__(self):
        set_activation_sharding(self.mesh, **self.kw)
        return self

    def __exit__(self, *exc):
        clear_activation_sharding()


def shard_activation(x, kind: str):
    """Constrain one activation if a mesh is active; no-op otherwise.

    kinds (leading dim is always the (data, fsdp) batch):
      'residual'  — (B, N, D) token stream, features replicated on tensor;
      'heads'     — (B, N, H, hd) attention heads over the tensor axis;
      'heads_seq' — (B, N, H, hd) seq over sp, heads over tensor: the layout
                    on BOTH sides of the qkv/out reshapes. Pinning it makes
                    the Ulysses token<->head transition an explicit 4-D
                    reshard (an all-to-all GSPMD partitions cleanly) instead
                    of a sharding change through a reshape, which the SPMD
                    partitioner can only do by full rematerialization
                    (replicate + repartition — wasted all-gathers on the
                    train/inference hot path);
      'hidden'    — (B, N, F) wide MLP/attn-concat features over tensor;
      'batch'     — any (B, ...) program input: batch over (data, fsdp),
                    rest replicated. Pinning inputs where they enter the
                    jitted program keeps GSPMD from back-propagating an
                    interior layout onto the input params (an involuntary
                    full-remat reshard at the program boundary otherwise).
    """
    mesh = _ACT['mesh']
    if mesh is None:
        return x
    batch = tuple(a for a in _ACT['batch_axes']
                  if mesh.shape.get(a, 1) > 1) or None
    if batch and x.shape[0] % int(np.prod([mesh.shape[a]
                                           for a in batch])) != 0:
        batch = None   # e.g. batch-1 init traces
    tp = _ACT['tensor_axis'] \
        if mesh.shape.get(_ACT['tensor_axis'], 1) > 1 else None
    sp = _ACT['sp_axis'] \
        if mesh.shape.get(_ACT['sp_axis'], 1) > 1 else None
    if sp and (x.ndim < 2 or x.shape[1] % mesh.shape[sp] != 0):
        sp = None
    if kind == 'batch':
        spec = P(batch)
    elif kind == 'residual':
        spec = P(batch, sp)
    elif kind == 'heads' and _ACT.get('sp_mode', 'ulysses') == 'ring':
        # ring mode keeps the sequence sharded through attention: the
        # 'heads' pin collapses to the heads_seq layout (no all-to-all;
        # the K/V rotation happens inside the kernel instead)
        head_tp = tp if (tp and x.shape[-2] % mesh.shape[tp] == 0) else None
        spec = P(batch, sp, head_tp, None)
    elif kind == 'heads':
        # attention wants full sequence per head group: seq replicated,
        # heads over BOTH the sp and tensor axes (the Ulysses all-to-all
        # happens at this boundary — tokens gather, heads scatter; without
        # sp in the head spec every sp device would recompute all heads)
        head_axes = tuple(a for a in (sp, tp) if a)
        if head_axes and x.shape[-2] % int(
                np.prod([mesh.shape[a] for a in head_axes])) != 0:
            head_axes = tuple(a for a in (tp,) if a)   # tensor-only fallback
            if head_axes and x.shape[-2] % mesh.shape[tp] != 0:
                head_axes = ()
        spec = P(batch, None, head_axes or None, None)
    elif kind == 'heads_seq':
        head_tp = tp if (tp and x.shape[-2] % mesh.shape[tp] == 0) else None
        spec = P(batch, sp, head_tp, None)
    elif kind == 'hidden':
        if tp and x.shape[-1] % mesh.shape[tp] != 0:
            tp = None
        spec = P(batch, sp, tp)
    elif kind in ('experts', 'experts_hidden'):
        # MoE dispatched activations (B, E, C, D|F): experts over the
        # expert axis — each expert's FFN stays local to its shard;
        # 'experts_hidden' additionally puts the wide FFN dim on tensor
        # (column-parallel expert weights)
        ep = _ACT['expert_axis'] \
            if mesh.shape.get(_ACT['expert_axis'], 1) > 1 else None
        if ep and x.shape[1] % mesh.shape[ep] != 0:
            ep = None
        if kind == 'experts' or not tp \
                or x.shape[-1] % mesh.shape[tp] != 0:
            tp = None
        spec = P(batch, ep, None, tp)
    else:
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def shard_batch(batch, mesh: Mesh, axis: str = 'data',
                extra: Sequence[str] = ('fsdp',)):
    """Place a host batch on the mesh, sharded over (data, fsdp).

    Multi-process: each process passes its *local* shard and
    ``jax.make_array_from_process_local_data`` assembles the global array
    (device_put would misread the local batch as the global one).
    """
    sharding = batch_sharding(mesh, axis, tuple(extra))
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch)
    return jax.tree.map(lambda x: jax.device_put(np.asarray(x), sharding),
                        batch)
