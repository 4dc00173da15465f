"""Mesh parallelism (data/fsdp/tensor/sp/pipe axes over ICI/DCN)."""

from .audit import audit_compiled, collective_stats, tree_bytes
from .mesh import (make_mesh, fsdp_shard_params, fsdp_spec_for,
                   param_spec_for, shard_state, shard_batch, batch_sharding,
                   batch_axes, replicated, setup_distributed,
                   set_activation_sharding, clear_activation_sharding,
                   activation_sharding, shard_activation,
                   sequence_parallel_active, pipeline_active,
                   stacked_param_spec, moe_param_spec, param_spec_for_path)
from .pipeline import pipe_partition, pipeline_scan
from .ring_attention import ring_attention, ring_partition

__all__ = ['make_mesh', 'fsdp_shard_params', 'fsdp_spec_for',
           'param_spec_for', 'shard_state', 'shard_batch', 'batch_sharding',
           'batch_axes', 'replicated', 'setup_distributed',
           'set_activation_sharding', 'clear_activation_sharding',
           'activation_sharding', 'shard_activation',
           'sequence_parallel_active', 'pipeline_active',
           'stacked_param_spec', 'moe_param_spec', 'param_spec_for_path',
           'pipe_partition',
           'pipeline_scan',
           'ring_attention', 'ring_partition',
           'audit_compiled', 'collective_stats', 'tree_bytes']
