"""Inference pipelines, weight conversion, adapter export/load."""

from .arcflux_pipeline import (ArcFluxPipeline, ArcQwenImagePipeline,
                               retrieve_raw_timesteps)
from .convert import (load_safetensors_state, torch_flux_to_flax,
                      flax_to_torch_flux, expand_proj_out_to_arc_heads,
                      graft_pretrained, fuse_lora)
from .loader import save_adapter_state, load_adapter_state

__all__ = [
    'ArcFluxPipeline', 'ArcQwenImagePipeline', 'retrieve_raw_timesteps',
    'load_safetensors_state', 'torch_flux_to_flax', 'flax_to_torch_flux',
    'expand_proj_out_to_arc_heads', 'graft_pretrained', 'fuse_lora',
    'save_adapter_state', 'load_adapter_state',
]
