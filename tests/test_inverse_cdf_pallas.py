"""Pallas NR inverse-CDF kernel vs the pure-JAX reference implementation.

Runs the kernel in interpreter mode on the CPU CI mesh (the compiled path is
exercised on real TPU by the verify drive / bench).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from arcflow_tpu.ops.gm import gm1d_inverse_cdf, gm1d_pdf_cdf


def make_problem(b=2, g=4, h=3, w=3, n=5):
    means = jax.random.normal(jax.random.PRNGKey(0), (b, g, h, w)) * 2
    logweights = jax.nn.log_softmax(
        jax.random.normal(jax.random.PRNGKey(1), (b, g, h, w)), axis=-3)
    gm1d = dict(means=means, logstds=jnp.full((b, 1, 1, 1), -0.3),
                logweights=logweights)
    x_true = jax.random.normal(jax.random.PRNGKey(2), (b, n, h, w))
    _, cdf = gm1d_pdf_cdf(dict(**gm1d), x_true)
    return gm1d, cdf, x_true


def test_pallas_kernel_matches_jax_path():
    gm1d, cdf, x_true = make_problem()
    ref = gm1d_inverse_cdf(dict(**gm1d), cdf, n_steps=12, backward_steps=0,
                           use_pallas=False)
    with pltpu.force_tpu_interpret_mode():
        out = gm1d_inverse_cdf(dict(**gm1d), cdf, n_steps=12,
                               backward_steps=0, use_pallas=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4)


def test_pallas_kernel_recovers_samples():
    gm1d, cdf, x_true = make_problem()
    with pltpu.force_tpu_interpret_mode():
        out = gm1d_inverse_cdf(dict(**gm1d), cdf, n_steps=16,
                               backward_steps=0, use_pallas=True)
    mask = np.abs(np.asarray(cdf)) < 0.999
    err = np.abs(np.asarray(out) - np.asarray(x_true))
    assert err[mask].max() < 5e-3, err[mask].max()
