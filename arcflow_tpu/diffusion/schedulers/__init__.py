"""Inference-time flow schedulers (reference ``lakonlab/models/diffusions/schedulers``)."""

from .flow_euler_ode import FlowEulerODEScheduler, shift_sigmas
from .flow_sde import FlowSDEScheduler
from .flow_dpmsolver import FlowDPMSolverScheduler, FlowUniPCScheduler

__all__ = ['FlowEulerODEScheduler', 'FlowSDEScheduler', 'shift_sigmas',
           'FlowDPMSolverScheduler', 'FlowUniPCScheduler']
