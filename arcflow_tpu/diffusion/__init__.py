"""Diffusion / flow-matching math: samplers, policies, integrators, losses."""

from .sampler import ContinuousTimeStepSampler
from .policies import ArcFlowPolicy, POLICY_CLASSES
from .integrator import momentum_integration, policy_average_u
from .losses import DiffusionMSELoss, DiffusionNLLLoss, GMFlowNLLLoss
from .gaussian_flow import GaussianFlow, apply_guidance
from .arcflow import (ArcFlowImitation, ArcFlowImitationDataFree,
                      multistep_train_loss)
from .gmflow import GMFlow, gmflow_posterior, gmflow_posterior_mean, probabilistic_guidance
from . import schedulers
from .schedulers import (FlowEulerODEScheduler, FlowSDEScheduler,
                         FlowDPMSolverScheduler, FlowUniPCScheduler)

__all__ = [
    'ContinuousTimeStepSampler', 'ArcFlowPolicy', 'POLICY_CLASSES',
    'momentum_integration', 'policy_average_u',
    'DiffusionMSELoss', 'DiffusionNLLLoss', 'GMFlowNLLLoss',
    'GaussianFlow', 'apply_guidance',
    'ArcFlowImitation', 'ArcFlowImitationDataFree', 'multistep_train_loss',
    'GMFlow', 'gmflow_posterior', 'gmflow_posterior_mean', 'probabilistic_guidance',
    'FlowEulerODEScheduler', 'FlowSDEScheduler', 'FlowDPMSolverScheduler',
    'FlowUniPCScheduler', 'schedulers',
]
