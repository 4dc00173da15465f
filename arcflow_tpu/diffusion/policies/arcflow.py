"""ArcFlow mixture-of-momentum policy as an immutable JAX pytree.

Equivalent capability to the reference ``ArcFlowPolicy``
(reference ``lakonlab/models/diffusions/policies/arcflow.py:9-115``), designed
functionally: the policy is a ``flax.struct`` pytree that flows through
``jit``/``grad``; ``detach``/``dropout``/``temperature`` return new policies
instead of mutating.

Math (behavioral spec from the reference):
  * The DiT emits K mixture components: ``means`` (velocity-space means,
    shape (B, K, *data)), ``logweights`` (B, K, *bcast) normalized over K,
    and ``loggammas`` (B, K-1, *bcast) — per-component exponential *rates*.
  * Component 0 has rate fixed to 0 (a constant-velocity mode); the learned
    rates apply to components 1..K-1 (the reference concatenates a ones row,
    ``policies/arcflow.py:70-74``).
  * Velocity at noise level sigma, predicted from source level sigma_src:
        u(sigma) = sum_k softmax(logweights)_k * m_k * exp(rate_k * (sigma_src - sigma))
  * x0-space means: ``means_x0 = x_t_src - sigma_t_src * means_u``
    (``policies/arcflow.py:41-50``). Kept for parity/posterior uses.

Shape convention: data tensors are (B, *data) with any layout (the math is
elementwise); mixture tensors put the component axis at axis 1.

The reference's ``temperature_`` is called but never defined (latent bug,
``arcflow.py:254``); per the intended mechanism (``gm_temperature``,
reference ``ops/gmflow_ops/gmflow_ops.py:1136-1144``) we implement it
properly as logweight scaling.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


def _bshape(a: Array, ndim: int) -> Array:
    """Reshape a (B,)-vector for broadcasting against a rank-``ndim`` tensor."""
    if a.ndim == ndim:
        return a
    assert a.ndim == 1, f'expected (B,) got {a.shape}'
    return a.reshape(a.shape[0], *((ndim - 1) * [1]))


@struct.dataclass
class ArcFlowPolicy:
    """One DiT forward's mixture output, frozen at source state (x_src, sigma_src)."""

    means_u: Array      # (B, K, *data)  velocity-space component means
    logweights: Array   # (B, K, *bcast) mixture logweights (normalized over K)
    loggammas: Array    # (B, K-1, *bcast) exponential rates (component 0 fixed at 0)
    x_t_src: Array      # (B, *data)
    sigma_t_src: Array  # (B,) source noise level
    eps: float = struct.field(pytree_node=False, default=1e-4)

    # ---- construction ---------------------------------------------------
    @classmethod
    def create(cls, denoising_output: dict, x_t_src: Array, sigma_t_src: Array,
               eps: float = 1e-4) -> 'ArcFlowPolicy':
        """Build from a raw DiT output dict {means, logweights, loggammas}."""
        f32 = jnp.float32
        k = denoising_output['means'].shape[1]
        k_gamma = denoising_output['loggammas'].shape[1]
        if k_gamma != k - 1:
            raise ValueError(
                f'loggammas must have K-1={k - 1} components (component 0 has '
                f'fixed rate 0), got {k_gamma}')
        sigma_t_src = jnp.asarray(sigma_t_src, f32).reshape(x_t_src.shape[0])
        return cls(
            means_u=jnp.asarray(denoising_output['means'], f32),
            logweights=jnp.asarray(denoising_output['logweights'], f32),
            loggammas=jnp.asarray(denoising_output['loggammas'], f32),
            x_t_src=jnp.asarray(x_t_src, f32),
            sigma_t_src=sigma_t_src,
            eps=eps)

    # ---- derived quantities ----------------------------------------------
    @property
    def num_components(self) -> int:
        return self.means_u.shape[1]

    @property
    def means_x0(self) -> Array:
        """x0-space means: x_src - sigma_src * u (per component)."""
        ndim = self.x_t_src.ndim
        sigma = _bshape(self.sigma_t_src, ndim)[:, None]
        return self.x_t_src[:, None] - sigma * self.means_u

    def rates_full(self) -> Array:
        """(B, K, *bcast) rates with the constant-velocity 0-rate row prepended."""
        zeros = jnp.zeros_like(self.loggammas[:, :1])
        return jnp.concatenate([zeros, self.loggammas], axis=1)

    def weights(self) -> Array:
        return jax.nn.softmax(self.logweights, axis=1)

    def decay(self, dt_past: Array) -> Array:
        """exp(rate_k * dt_past) with component 0 fixed at 1.

        ``dt_past`` is (B,) or broadcastable to (B, 1, *data) — the elapsed
        sigma-interval from the policy's source time.
        """
        dt = _bshape(jnp.asarray(dt_past, jnp.float32), self.x_t_src.ndim)[:, None]
        grow = jnp.exp(self.loggammas * dt)
        return jnp.concatenate([jnp.ones_like(grow[:, :1]), grow], axis=1)

    def velocity(self, sigma_t: Array) -> Array:
        """Mixture velocity u at noise level sigma_t (reference ``velocity``)."""
        dt_past = self.sigma_t_src - jnp.asarray(sigma_t, jnp.float32).reshape(
            self.sigma_t_src.shape)
        v_k = self.means_u * self.decay(dt_past) * self.weights()
        return v_k.sum(axis=1)

    # ---- transforms (pure; return new policies) --------------------------
    def detach(self) -> 'ArcFlowPolicy':
        return jax.tree.map(jax.lax.stop_gradient, self)

    def dropout(self, rng: Array, p: float) -> 'ArcFlowPolicy':
        """Randomly drop mixture components (never all of them) by -inf logweight.

        Mirrors reference ``dropout_`` (``policies/arcflow.py:96-106``).
        """
        if p <= 0.0 or p >= 1.0:
            return self
        b, k = self.logweights.shape[:2]
        mask_shape = (b, k) + (1,) * (self.logweights.ndim - 2)
        drop = jax.random.uniform(rng, mask_shape) < p
        all_dropped = drop.all(axis=1, keepdims=True)
        drop = drop & ~all_dropped
        new_lw = jnp.where(drop, -jnp.inf, self.logweights)
        return self.replace(logweights=new_lw)

    def temperature(self, temp: float) -> 'ArcFlowPolicy':
        """Sharpen/soften mixture weights: logweights / temp."""
        if temp == 1.0:
            return self
        return self.replace(logweights=self.logweights / max(temp, self.eps))
