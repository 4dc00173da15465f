"""Multihost training base: N hosts x M chips (reference
``configs/flux/_fsdp_train.py:30-39`` launcher + HYBRID_SHARD equivalent).

Bring-up: ``dist_params`` drives ``jax.distributed.initialize`` (auto-detects
coordinator/process ids from the TPU pod metadata or the
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars —
see parallel/mesh.py:setup_distributed). The hybrid layout keeps the fsdp
(all-gather-heavy) axis on ICI within each slice and replicates data-parallel
groups across slices over DCN.
"""

_base_ = ['./_mesh_train.py']

# e.g. 2 slices x 8 chips: data axis spans slices (DCN), fsdp stays on ICI
dist_params = dict()                  # auto-detect; or set num_processes etc.
parallel = dict(
    mesh=dict(data=1, fsdp=-1),       # ICI axes (per-slice)
    dcn_mesh=dict(data=2),            # DCN axis sizes (slices per axis)
    fsdp_axis='fsdp',
    tensor_axis=None,
    min_shard_size=2 ** 16,
)
