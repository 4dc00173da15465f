"""arcflow-tpu: a TPU-native JAX framework for few-step flow distillation.

A ground-up rebuild of the capabilities of the reference ArcFlow/lakonlab
stack (flow-matching training, mixture-of-momentum 2-NFE distillation,
DiT model zoo, config-driven runner, mesh parallelism) designed for
TPU hardware: jit/pjit + jax.sharding for scale, Pallas for hot kernels,
functional pytree state everywhere.
"""

__version__ = '0.1.0'

from .config import Config, ConfigDict
from .registry import (MODELS, MODULES, HOOKS, DATASETS, OPTIMIZERS,
                       SCHEDULERS, build_model, build_module)

# Importing subpackages populates the registries so that config-driven
# construction works right after `import arcflow_tpu`.
from . import diffusion  # noqa: E402,F401
from . import models     # noqa: E402,F401
from . import data       # noqa: E402,F401
from . import runner     # noqa: E402,F401

__all__ = [
    '__version__', 'Config', 'ConfigDict',
    'MODELS', 'MODULES', 'HOOKS', 'DATASETS', 'OPTIMIZERS', 'SCHEDULERS',
    'build_model', 'build_module',
]
