"""Flow-matching SDE scheduler with churn parameter h.

Equivalent capability to the reference ``FlowSDEScheduler``
(reference ``lakonlab/models/diffusions/schedulers/flow_sde.py:113-177``):
``h`` interpolates between the deterministic ODE (h=0 -> m=1, noise off)
and fully ancestral sampling (h='inf' -> m=0, epsilon fully resampled):

    m = (sigma_next * alpha / (sigma * alpha_next))^{h^2}
    x_next = alpha_next * x0 + sigma_next * (m * eps_hat + sqrt(1 - m^2) * noise)
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Union

import jax
import jax.numpy as jnp

from ...registry import SCHEDULERS
from .flow_euler_ode import FlowEulerODEScheduler

Array = jax.Array


@SCHEDULERS.register_module()
@dataclasses.dataclass(frozen=True)
class FlowSDEScheduler(FlowEulerODEScheduler):
    """Stochastic flow sampler; shares the sigma-grid logic with the ODE one."""

    h: Union[float, str] = 1.0

    def step(self, model_output: Array, sample: Array, sigma: Array,
             sigma_next: Array, prediction_type: str = 'u', eps: float = 1e-6,
             rng: Optional[Array] = None) -> Array:
        assert prediction_type in ('u', 'x0')
        assert rng is not None, 'FlowSDEScheduler.step needs a PRNG key'
        ori_dtype = sample.dtype
        sample = jnp.asarray(sample, jnp.float32)
        model_output = jnp.asarray(model_output, jnp.float32)
        sigma = jnp.asarray(sigma, jnp.float32)
        sigma_next = jnp.asarray(sigma_next, jnp.float32)
        alpha = 1 - sigma
        alpha_next = 1 - sigma_next

        if prediction_type == 'u':
            x0 = sample - sigma * model_output
            epsilon = sample + alpha * model_output
        else:
            x0 = model_output
            epsilon = (sample - alpha * x0) / jnp.maximum(sigma, eps)

        noise = jax.random.normal(rng, sample.shape, jnp.float32)

        if self.h == 'inf':
            m = jnp.zeros_like(sigma)
        elif self.h == 0.0:
            m = jnp.ones_like(sigma)
        else:
            assert isinstance(self.h, (int, float)) and self.h > 0.0
            h2 = float(self.h) ** 2
            m = (sigma_next * alpha / jnp.maximum(sigma * alpha_next, eps)) ** h2

        churn = jnp.sqrt(jnp.maximum(1 - jnp.square(m), 0.0))
        prev = alpha_next * x0 + sigma_next * (m * epsilon + churn * noise)
        return prev.astype(ori_dtype)
