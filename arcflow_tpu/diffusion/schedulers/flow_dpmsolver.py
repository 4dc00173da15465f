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


@SCHEDULERS.register_module()
@dataclasses.dataclass(frozen=True)
class FlowDEISScheduler(FlowDPMSolverScheduler):
    """DEIS multistep on flow sigmas — the exponential integrator in the
    *noise*-prediction parameterization with AB2 extrapolation in lambda
    (native counterpart of the diffusers DEISMultistepScheduler the
    reference adapts, flow_adapter.py:57-60).

    Order-1 exact update: x_next = (alpha_next/alpha) x
                                   - sigma_next expm1(h) eps_hat.
    """

    def step_with_state(self, model_output, sample, sigma, sigma_next, state,
                        prediction_type='u', eps=1e-6, rng=None):
        sample32 = jnp.asarray(sample, jnp.float32)
        out32 = jnp.asarray(model_output, jnp.float32)
        alpha = 1 - sigma
        if prediction_type == 'u':
            # x_t = alpha x0 + sigma eps, u = eps - x0
            epsilon = sample32 + alpha * out32
            x0 = sample32 - sigma * out32
        else:
            x0 = out32
            epsilon = (sample32 - alpha * x0) / jnp.maximum(sigma, eps)

        lam = self._lambda(sigma, eps)
        lam_next = self._lambda(sigma_next, eps)
        h = lam_next - lam

        d = epsilon
        if self.solver_order >= 2:
            r = (lam - state['prev_lambda']) / jnp.where(h == 0, 1.0, h)
            corr = (epsilon - state['prev_x0']) / jnp.maximum(2 * r, eps)
            use_corr = state['valid'] * (sigma_next >= eps)
            d = epsilon + use_corr * corr

        alpha_next = 1 - sigma_next
        ratio = alpha_next / jnp.maximum(alpha, eps)
        x_next = ratio * sample32 - sigma_next * jnp.expm1(h) * d
        # terminal step: sigma_next -> 0 makes expm1(h) blow up; land on the
        # equivalent exact limit alpha_next * x0
        x_next = jnp.where(sigma_next < eps, alpha_next * x0, x_next)
        # first step from pure noise (alpha -> 0): the epsilon-form ratio
        # alpha_next/alpha is singular there — use the equivalent exact
        # x0-form order-1 update instead
        x0_form = (sigma_next / jnp.maximum(sigma, eps)) * sample32 \
            - alpha_next * jnp.expm1(-h) * x0
        x_next = jnp.where(alpha < 1e-4, x0_form, x_next)
        # multistep history carries the epsilon prediction
        new_state = dict(prev_x0=epsilon, prev_lambda=lam, valid=jnp.ones(()))
        return x_next.astype(sample.dtype), new_state


@SCHEDULERS.register_module()
@dataclasses.dataclass(frozen=True)
class FlowSASolverScheduler(FlowDPMSolverScheduler):
    """SA-Solver (stochastic Adams) on flow sigmas — data-prediction
    multistep with an exact noise-injection channel of scale ``tau``
    (native counterpart of the diffusers SASolver the reference adapts).

    Exact order-1 transition (marginal-preserving for any tau >= 0):
      x_next = (sigma_next/sigma) e^{-tau^2 h} x
               + alpha_next (1 - e^{-(1+tau^2) h}) x0_hat
               + sigma_next sqrt(1 - e^{-2 tau^2 h}) z
    tau = 0 reduces exactly to DPM-Solver++; order 2 adds the same
    multistep x0 gradient as the 2M solver.
    """

    tau: float = 1.0

    def step_with_state(self, model_output, sample, sigma, sigma_next, state,
                        prediction_type='u', eps=1e-6, rng=None):
        sample32 = jnp.asarray(sample, jnp.float32)
        out32 = jnp.asarray(model_output, jnp.float32)
        if prediction_type == 'u':
            x0 = sample32 - sigma * out32
        else:
            x0 = out32

        lam = self._lambda(sigma, eps)
        lam_next = self._lambda(sigma_next, eps)
        h = lam_next - lam

        d = x0
        if self.solver_order >= 2:
            r = (lam - state['prev_lambda']) / jnp.where(h == 0, 1.0, h)
            corr = (x0 - state['prev_x0']) / jnp.maximum(2 * r, eps)
            use_corr = state['valid'] * (sigma_next >= eps)
            d = x0 + use_corr * corr

        tau2 = float(self.tau) ** 2
        alpha_next = 1 - sigma_next
        ratio = sigma_next / jnp.maximum(sigma, eps)
        drift = ratio * jnp.exp(-tau2 * h) * sample32 \
            - alpha_next * jnp.expm1(-(1 + tau2) * h) * d
        if tau2 > 0:
            assert rng is not None, 'SA-Solver with tau > 0 needs a PRNG key'
            z = jax.random.normal(rng, sample32.shape, jnp.float32)
            churn = jnp.sqrt(jnp.maximum(-jnp.expm1(-2 * tau2 * h), 0.0))
            drift = drift + sigma_next * churn * z
        x_next = jnp.where(sigma_next < eps, d, drift)
        new_state = dict(prev_x0=x0, prev_lambda=lam, valid=jnp.ones(()))
        return x_next.astype(sample.dtype), new_state


@SCHEDULERS.register_module(name='FlowAdapterScheduler')
def FlowAdapterScheduler(base_scheduler: str = 'UniPCMultistep', **kwargs):
    """Reference-config compatibility dispatcher: the reference's
    FlowAdapterScheduler wraps a diffusers scheduler selected by
    ``base_scheduler`` (default UniPCMultistep, flow_adapter.py:36). Here
    each option maps to its native flow-sigma implementation.
    """
    from .flow_euler_ode import FlowEulerODEScheduler
    from .flow_sde import FlowSDEScheduler
    mapping = {
        'UniPCMultistep': FlowUniPCScheduler,
        'DPMSolverMultistep': FlowDPMSolverScheduler,
        'DPMSolverSinglestep': FlowDPMSolverScheduler,
        'DEISMultistep': FlowDEISScheduler,
        'SASolver': FlowSASolverScheduler,
        'EulerDiscrete': FlowEulerODEScheduler,
        'EulerAncestralDiscrete': FlowSDEScheduler,
    }
    if base_scheduler not in mapping:
        raise AttributeError(f'Unsupported base_scheduler [{base_scheduler}];'
                             f' options: {sorted(mapping)}')
    cls = mapping[base_scheduler]
    fields = {f.name for f in dataclasses.fields(cls)}
    kwargs.pop('prediction_type', None)
    kwargs.pop('use_flow_sigmas', None)
    return cls(**{k: v for k, v in kwargs.items() if k in fields})
