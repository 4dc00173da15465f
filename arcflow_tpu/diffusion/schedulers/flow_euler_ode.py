"""Flow-matching Euler ODE scheduler (stateless, scan-friendly).

Equivalent capability to the reference ``FlowEulerODEScheduler``
(reference ``lakonlab/models/diffusions/schedulers/flow_euler_ode.py:20-164``)
redesigned for XLA: the sigma grid is computed host-side once
(``set_timesteps``), and ``step`` is a pure function of
(model_output, sample, sigma, sigma_next) so a sampling loop can be a
``lax.scan`` over the grid instead of stateful step-index bookkeeping.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ...registry import SCHEDULERS

Array = jax.Array


def shift_sigmas(sigmas: np.ndarray, shift: float) -> np.ndarray:
    return shift * sigmas / (1 + (shift - 1) * sigmas)


@SCHEDULERS.register_module()
@dataclasses.dataclass(frozen=True)
class FlowEulerODEScheduler:
    """First-order ODE integration of the rectified flow, u- or x0-prediction."""

    num_train_timesteps: int = 1000
    shift: float = 1.0
    use_dynamic_shifting: bool = False
    base_seq_len: int = 256
    max_seq_len: int = 4096
    base_logshift: float = 0.5
    max_logshift: float = 1.15
    terminal_sigma: Optional[float] = None

    def get_shift(self, seq_len=None) -> float:
        if self.use_dynamic_shifting and seq_len is not None:
            m = (self.max_logshift - self.base_logshift) / (self.max_seq_len - self.base_seq_len)
            return math.exp((seq_len - self.base_seq_len) * m + self.base_logshift)
        return self.shift

    def stretch_to_terminal(self, sigmas: np.ndarray) -> np.ndarray:
        """Rescale so the last nonzero sigma hits ``terminal_sigma`` exactly."""
        one_minus = 1 - sigmas
        return 1 - one_minus * (1 - self.terminal_sigma) / one_minus[-1]

    def set_timesteps(self, num_inference_steps: int, seq_len=None) -> np.ndarray:
        """Return the (num_steps + 1,) sigma grid, ending at exactly 0.

        timesteps (model-time) are ``sigmas[:-1] * num_train_timesteps``.
        """
        sigmas = 1 - np.linspace(0, 1, num_inference_steps,
                                 dtype=np.float32, endpoint=False)
        sigmas = shift_sigmas(sigmas, self.get_shift(seq_len))
        if self.terminal_sigma is not None:
            sigmas = self.stretch_to_terminal(sigmas)
        return np.concatenate([sigmas, np.zeros(1, np.float32)])

    def timesteps(self, num_inference_steps: int, seq_len=None) -> np.ndarray:
        return self.set_timesteps(num_inference_steps, seq_len)[:-1] \
            * self.num_train_timesteps

    @staticmethod
    def step(model_output: Array, sample: Array, sigma: Array, sigma_next: Array,
             prediction_type: str = 'u', eps: float = 1e-6,
             rng: Optional[Array] = None) -> Array:
        """One Euler step from sigma to sigma_next (pure; fp32 math)."""
        assert prediction_type in ('u', 'x0')
        ori_dtype = sample.dtype
        sample = jnp.asarray(sample, jnp.float32)
        model_output = jnp.asarray(model_output, jnp.float32)
        if prediction_type == 'u':
            derivative = model_output
        else:
            derivative = (sample - model_output) / jnp.maximum(sigma, eps)
        prev = sample + derivative * (sigma_next - sigma)
        return prev.astype(ori_dtype)
