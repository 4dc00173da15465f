"""Continuous timestep sampling with shift warping and dynamic shifting.

Functional JAX port-equivalent of the reference's
``ContinuousTimeStepSampler`` (reference
``lakonlab/models/diffusions/sampler.py:10-76``): uniform-in-(0,1] (or
logit-normal) raw times, warped through the rectified-flow "shift" map
``sigma = s*t / (1 + (s-1)*t)``, with the optional log-linear dynamic shift by
sequence length used by FLUX-style models (base_seq_len 256 -> max 4096,
logshift 0.5 -> 1.15).

All methods are pure and jittable; randomness comes from explicit PRNG keys.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ..registry import MODULES

Array = jax.Array
Scalar = Union[float, Array]


@MODULES.register_module()
@dataclasses.dataclass(frozen=True)
class ContinuousTimeStepSampler:
    """Static sampler config; every method is a pure function of its inputs."""

    num_timesteps: int = 1000
    shift: float = 1.0
    logit_normal_enable: bool = False
    logit_normal_mean: float = 0.0
    logit_normal_std: float = 1.0
    use_dynamic_shifting: bool = False
    base_seq_len: int = 256
    max_seq_len: int = 4096
    base_logshift: float = 0.5
    max_logshift: float = 1.15

    def get_shift(self, seq_len: Optional[Scalar] = None) -> Scalar:
        if self.use_dynamic_shifting and seq_len is not None:
            m = (self.max_logshift - self.base_logshift) / (self.max_seq_len - self.base_seq_len)
            logshift = (seq_len - self.base_seq_len) * m + self.base_logshift
            if isinstance(logshift, jax.Array):
                return jnp.exp(logshift)
            return math.exp(logshift)
        return self.shift

    def warp_t(self, t: Array, seq_len: Optional[Scalar] = None) -> Array:
        """raw t in [0,1] -> noise level sigma under the shift map."""
        shift = self.get_shift(seq_len)
        return shift * t / (1 + (shift - 1) * t)

    def unwarp_t(self, t: Array, seq_len: Optional[Scalar] = None) -> Array:
        shift = self.get_shift(seq_len)
        return t / (shift + (1 - shift) * t)

    def sample(self, rng: Array, batch_size: int, warp_t: bool = True,
               scale_t: bool = True, seq_len: Optional[Scalar] = None,
               raw_t_range: Optional[Tuple[float, float]] = None) -> Array:
        """Sample raw times, optionally warp to sigma and scale to model-t.

        Matches the reference semantics: uniform draws are ``1 - U[0,1)`` so
        that t is in (0, 1]; ``raw_t_range=(hi, lo)`` draws uniformly in the
        given range; logit-normal draws use sigmoid(mu + std*N(0,1)).
        """
        if self.logit_normal_enable:
            assert raw_t_range is None
            t = jax.nn.sigmoid(
                self.logit_normal_mean
                + self.logit_normal_std * jax.random.normal(rng, (batch_size,)))
        elif raw_t_range is not None:
            hi, lo = raw_t_range
            t = jax.random.uniform(rng, (batch_size,)) * (hi - lo) + lo
        else:
            t = 1.0 - jax.random.uniform(rng, (batch_size,))
        if warp_t:
            t = self.warp_t(t, seq_len=seq_len)
        if scale_t:
            t = t * self.num_timesteps
        return t

    def __call__(self, rng: Array, batch_size: int, **kwargs) -> Array:
        return self.sample(rng, batch_size, **kwargs)
