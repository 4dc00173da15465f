"""DPM-Solver++(2M) for rectified flows — the high-order solver slot.

Equivalent capability to the reference ``FlowAdapterScheduler``
(``lakonlab/models/diffusions/schedulers/flow_adapter.py:21-233``), which
wraps diffusers' DPM-Solver/UniPC/DEIS behind an epsilon/flow-prediction
conversion. Here the solver is implemented natively on flow sigmas
(alpha = 1 - sigma, lambda = log(alpha/sigma)) as a *stateful-by-carry*
scheduler: ``init_state``/``step_with_state`` thread the multistep history
through the sampling scan (no Python-side step counters).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ...registry import SCHEDULERS
from .flow_euler_ode import FlowEulerODEScheduler

Array = jax.Array


@SCHEDULERS.register_module()
@SCHEDULERS.register_module(name='FlowAdapterScheduler')  # reference alias:
# the reference's FlowAdapterScheduler wraps diffusers DPM-Solver by default
@dataclasses.dataclass(frozen=True)
class FlowDPMSolverScheduler(FlowEulerODEScheduler):
    """Multistep DPM-Solver++ on the flow parameterization.

    order 1 reduces to the exact x0-form exponential integrator (DDIM-like);
    order 2 is the 2M linear-multistep variant.
    """

    solver_order: int = 2

    stateful = True

    def init_state(self, x: Array) -> dict:
        return dict(prev_x0=jnp.zeros_like(x),
                    prev_lambda=jnp.zeros(()),
                    valid=jnp.zeros(()))

    @staticmethod
    def _lambda(sigma: Array, eps: float = 1e-6) -> Array:
        sigma = jnp.clip(sigma, eps, 1 - eps)
        return jnp.log((1 - sigma) / sigma)

    def step_with_state(self, model_output: Array, sample: Array,
                        sigma: Array, sigma_next: Array, state: dict,
                        prediction_type: str = 'u', eps: float = 1e-6,
                        rng: Optional[Array] = None
                        ) -> Tuple[Array, dict]:
        sample = jnp.asarray(sample, jnp.float32)
        model_output = jnp.asarray(model_output, jnp.float32)
        if prediction_type == 'u':
            x0 = sample - sigma * model_output
        else:
            x0 = model_output

        lam = self._lambda(sigma, eps)
        lam_next = self._lambda(sigma_next, eps)
        h = lam_next - lam

        d = x0
        if self.solver_order >= 2:
            r = (lam - state['prev_lambda']) / jnp.where(h == 0, 1.0, h)
            corr = (x0 - state['prev_x0']) / jnp.maximum(2 * r, eps)
            # lower_order_final: the terminal step's lambda jump is unbounded
            # (sigma -> 0), where multistep extrapolation diverges — drop to
            # order 1 there (standard DPM-Solver++ practice)
            use_corr = state['valid'] * (sigma_next >= eps)
            d = x0 + use_corr * corr

        alpha_next = 1 - sigma_next
        ratio = sigma_next / jnp.maximum(sigma, eps)
        x_next = ratio * sample - alpha_next * jnp.expm1(-h) * d
        # terminal step: land exactly on the x0 estimate
        x_next = jnp.where(sigma_next < eps, d, x_next)

        new_state = dict(prev_x0=x0, prev_lambda=lam, valid=jnp.ones(()))
        return x_next.astype(sample.dtype), new_state

    def step(self, model_output, sample, sigma, sigma_next,
             prediction_type='u', eps=1e-6, rng=None):
        """Stateless fallback = order-1 exponential integrator."""
        x, _ = self.step_with_state(model_output, sample, sigma, sigma_next,
                                    self.init_state(sample),
                                    prediction_type=prediction_type, eps=eps)
        return x


@SCHEDULERS.register_module()
@dataclasses.dataclass(frozen=True)
class FlowUniPCScheduler(FlowDPMSolverScheduler):
    """UniPC-style predictor-corrector on flow sigmas.

    Uses the same multistep history as DPM-Solver++(2M) with the UniC-1
    corrector applied via the B(h)=h variant — a pragmatic native stand-in
    for the diffusers UniPC the reference adapts.
    """

    def step_with_state(self, model_output, sample, sigma, sigma_next, state,
                        prediction_type='u', eps=1e-6, rng=None):
        sample32 = jnp.asarray(sample, jnp.float32)
        if prediction_type == 'u':
            x0 = sample32 - sigma * jnp.asarray(model_output, jnp.float32)
        else:
            x0 = jnp.asarray(model_output, jnp.float32)
        lam = self._lambda(sigma, eps)
        lam_next = self._lambda(sigma_next, eps)
        h = lam_next - lam
        # predictor: order-2 with UniP coefficients (B(h)=h)
        r = (lam - state['prev_lambda']) / jnp.where(h == 0, 1.0, h)
        hh = -h   # data-prediction convention
        phi1 = jnp.expm1(hh)
        # lower_order_final: no multistep term on the terminal step
        use_corr = state['valid'] * (sigma_next >= eps)
        d1 = (x0 - state['prev_x0']) / jnp.maximum(r, eps) * use_corr
        alpha_next = 1 - sigma_next
        ratio = sigma_next / jnp.maximum(sigma, eps)
        x_next = ratio * sample32 - alpha_next * phi1 * x0 \
            - alpha_next * (phi1 / jnp.where(hh == 0.0, 1.0, hh) - 1.0) * d1
        x_next = jnp.where(sigma_next < eps, x0, x_next)
        new_state = dict(prev_x0=x0, prev_lambda=lam, valid=jnp.ones(()))
        return x_next.astype(sample.dtype), new_state
