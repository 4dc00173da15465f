"""Test harness: run everything on a simulated 8-device CPU mesh.

The reference has no test suite (SURVEY.md §4); this suite is the formalized
version of its deterministic fixtures. Multi-chip sharding is validated
without TPUs via XLA's host-platform device simulation.
"""

import os

# Must be set before jax is imported anywhere. Force CPU even if the outer
# environment points at a TPU platform — tests simulate 8 devices on host.
os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU plugin via
# jax.config.jax_platforms='axon,cpu', overriding the env var — undo that so
# tests really run on the simulated 8-device CPU host.
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_default_matmul_precision', 'highest')

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope='module')
def _clear_jax_caches_between_modules():
    """Drop compiled-executable caches after every test module.

    The suite compiles hundreds of XLA:CPU programs; letting them all
    accumulate in one process ends in a segfault inside a late LLVM compile
    (reproducibly in test_qwen's init when run after ~150 prior tests,
    fine in any smaller combination). Clearing between modules bounds the
    JIT state; per-module cache reuse is what matters for speed anyway.
    """
    yield
    jax.clear_caches()
