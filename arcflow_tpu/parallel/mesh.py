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


def make_mesh(axes: Dict[str, int], devices: Optional[Sequence] = None) -> Mesh:
    """Build a mesh from {'data': d, 'fsdp': f, ...}; sizes must multiply to
    the device count (use -1 for one inferred axis)."""
    devices = list(devices if devices is not None else jax.devices())
    names = tuple(axes.keys())
    sizes = list(axes.values())
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = len(devices) // known
    assert int(np.prod(sizes)) == len(devices), \
        f'mesh {dict(zip(names, sizes))} != {len(devices)} devices'
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


def batch_sharding(mesh: Mesh, axis: str = 'data') -> NamedSharding:
    """Shard batches over the data axis (leading dim)."""
    return NamedSharding(mesh, P(axis))


def shard_state(state, mesh: Mesh, fsdp_axis: str = 'fsdp',
                tensor_axis: Optional[str] = None, min_size: int = 2 ** 16):
    """Place a TrainState on the mesh: large params/opt-state/EMA sharded over
    fsdp (+ optional tensor axis on feature dims), scalars/rng replicated.
    Returns (sharded_state, sharding_tree)."""
    fsdp_size = mesh.shape.get(fsdp_axis, 1) if fsdp_axis else 1
    tensor_size = mesh.shape.get(tensor_axis, 1) if tensor_axis else 1

    def spec_of(x):
        return NamedSharding(mesh, param_spec_for(
            x, fsdp_axis, fsdp_size, tensor_axis, tensor_size, min_size))
    shardings = jax.tree.map(spec_of, state)
    placed = jax.tree.map(
        lambda x, s: jax.device_put(x, s), state, shardings)
    return placed, shardings


def shard_batch(batch, mesh: Mesh, axis: str = 'data'):
    sharding = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(np.asarray(x), sharding),
                        batch)
