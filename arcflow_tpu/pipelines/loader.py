"""Adapter checkpoint I/O: export/load ArcFlow adapters as safetensors with an
embedded ``policy_config`` JSON header.

Equivalent capability to the reference export/load pair
(``export_arcflow_to_diffusers.py:40-124`` + ``pipelines/arcflow_loader.py``):
the exported file carries the trainable adapter (3 heads + norm_out + LoRA)
in diffusers-compatible torch naming, plus the sampling policy config in the
safetensors metadata.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import numpy as np

from .convert import torch_flux_to_flax


def save_adapter_state(path: str, adapter_tree: Dict,
                       policy_config: Optional[dict] = None,
                       family: str = 'flux'):
    """Write the adapter tree (flax naming, stacked blocks) to safetensors in
    torch naming, with policy_config embedded in the metadata header."""
    from safetensors.numpy import save_file
    from .convert import flax_to_torch_flux
    state = flax_to_torch_flux(adapter_tree, family=family)
    state = {k: np.ascontiguousarray(v) for k, v in state.items()}
    meta = {}
    if policy_config is not None:
        meta['policy_config'] = json.dumps(policy_config)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    save_file(state, path, metadata=meta or None)


def load_adapter_state(path: str, family: str = 'flux'
                       ) -> Tuple[Dict, Optional[dict]]:
    """Read an exported adapter; returns (flax_tree, policy_config|None).

    Splits keys into stacked-block entries vs top-level adapter heads exactly
    as the converter expects; LoRA keys (``lora_a``/``lora_b`` or peft-style
    ``lora_A.weight``) are normalized to the framework's lora leaves.

    ``path`` may be a remote URI (``huggingface://org/repo/file.safetensors``,
    ``s3://...``, ``http(s)://...``) — resolved through the io_utils backend
    table, matching the reference loader's hub ingestion
    (arcflow_loader.py:45-67).
    """
    from safetensors import safe_open

    from ..utils.io_utils import get_file_backend, uri_scheme
    if uri_scheme(path) != 'local':
        backend = get_file_backend(path)
        if hasattr(backend, 'local_path'):
            path = backend.local_path(path)
        else:
            import tempfile
            data = backend.get(path)
            tmp = tempfile.NamedTemporaryFile(suffix='.safetensors',
                                              delete=False)
            tmp.write(data)
            tmp.close()
            path = tmp.name
    state = {}
    with safe_open(path, framework='np') as f:
        meta = f.metadata() or {}
        for k in f.keys():
            state[k] = f.get_tensor(k)
    policy_config = None
    if 'policy_config' in meta:
        policy_config = json.loads(meta['policy_config'])

    # Normalize peft adapter naming (raw training checkpoints carry
    # ``lora_A.default.weight``; the reference exporter renames to
    # ``lora_A.weight`` — accept both, reference arcflow_loader.py:241-265).
    norm_state = {}
    for k, v in state.items():
        k = k.replace('.lora_A.default.weight', '.lora_A.weight')
        k = k.replace('.lora_B.default.weight', '.lora_B.weight')
        norm_state[k] = v

    # Everything — per-block LoRA keys, arc heads, norm_out — goes through
    # the canonical torch->flax converter, which gathers per-block peft keys
    # into stacked scan arrays and fixes the packed-feature layout.
    tree, unused = torch_flux_to_flax(
        norm_state,
        num_layers=_max_block_index(norm_state, 'transformer_blocks') + 1,
        num_single_layers=_max_block_index(
            norm_state, 'single_transformer_blocks') + 1,
        family=family)
    if unused:
        raise ValueError(
            f'adapter contains {len(unused)} unconvertible keys, e.g. '
            f'{sorted(unused)[:5]}')
    return tree, policy_config


def _max_block_index(state: Dict, prefix: str) -> int:
    idx = -1
    for k in state:
        if k.startswith(prefix + '.'):
            idx = max(idx, int(k.split('.')[1]))
    return idx
