"""Network architectures (flax.linen modules)."""

from .toy import ToyMLPDenoiser, ToyArcFlowDenoiser, timestep_embedding
from .base import BaseModel, Diffusion2D, Distillation2D

__all__ = ['ToyMLPDenoiser', 'ToyArcFlowDenoiser', 'timestep_embedding',
           'BaseModel', 'Diffusion2D', 'Distillation2D']
