"""Inference-time flow schedulers (reference ``lakonlab/models/diffusions/schedulers``)."""

from .flow_euler_ode import FlowEulerODEScheduler, shift_sigmas
from .flow_sde import FlowSDEScheduler
from .flow_dpmsolver import (FlowDPMSolverScheduler, FlowUniPCScheduler,
                             FlowDEISScheduler, FlowSASolverScheduler,
                             FlowAdapterScheduler)

__all__ = ['FlowEulerODEScheduler', 'FlowSDEScheduler', 'shift_sigmas',
           'FlowDPMSolverScheduler', 'FlowUniPCScheduler',
           'FlowDEISScheduler', 'FlowSASolverScheduler',
           'FlowAdapterScheduler']
