"""Diffusion / flow-matching math: samplers, policies, integrators, losses."""

from .sampler import ContinuousTimeStepSampler
from .policies import ArcFlowPolicy, POLICY_CLASSES
from .integrator import momentum_integration, policy_average_u

__all__ = [
    'ContinuousTimeStepSampler', 'ArcFlowPolicy', 'POLICY_CLASSES',
    'momentum_integration', 'policy_average_u',
]
