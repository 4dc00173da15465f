"""Network architectures (flax.linen modules)."""

from .toy import ToyMLPDenoiser, ToyArcFlowDenoiser, timestep_embedding

__all__ = ['ToyMLPDenoiser', 'ToyArcFlowDenoiser', 'timestep_embedding']
