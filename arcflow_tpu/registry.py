"""Minimal typed registry for config-driven construction.

The reference framework builds every component from ``dict(type='Name', ...)``
configs through mmcv/mmgen registries (see reference ``lakonlab`` usage of
``MODELS``/``MODULES`` registries, e.g. ``lakonlab/models/diffusions/arcflow.py:274``).
This module provides an equivalent, dependency-free registry for the TPU build.
"""

from __future__ import annotations

import copy
import inspect
from typing import Any, Callable, Dict, Optional


class Registry:
    """A name -> constructor mapping with ``build`` support.

    Unlike mmcv's registry there is no parent/scope machinery — a flat
    namespace per registry is all the framework needs.
    """

    def __init__(self, name: str):
        self.name = name
        self._module_dict: Dict[str, Callable] = {}

    def __contains__(self, key: str) -> bool:
        return key in self._module_dict

    def __repr__(self) -> str:
        return f'Registry(name={self.name}, items={list(self._module_dict)})'

    def keys(self):
        return self._module_dict.keys()

    def get(self, key: str) -> Optional[Callable]:
        return self._module_dict.get(key)

    def register_module(self, name: Optional[str] = None, module: Optional[Callable] = None,
                        force: bool = False):
        """Register a class or function, usable as a decorator."""
        if module is not None:
            self._register(module, name, force)
            return module

        def _decorator(cls):
            self._register(cls, name, force)
            return cls

        return _decorator

    def _register(self, module: Callable, name: Optional[str], force: bool):
        key = name or module.__name__
        if not force and key in self._module_dict:
            raise KeyError(f'{key} is already registered in {self.name}')
        self._module_dict[key] = module

    def build(self, cfg: Any, default_args: Optional[dict] = None):
        """Construct an object from ``dict(type='Name', **kwargs)``.

        Non-dict configs (already-built objects, None) pass through unchanged,
        mirroring the reference's ``build_module`` behavior
        (reference ``lakonlab/models/diffusions/gaussian_flow.py:44``).
        """
        if cfg is None or not isinstance(cfg, dict):
            return cfg
        cfg = copy.deepcopy(dict(cfg))
        if 'type' not in cfg:
            raise KeyError(f'config for {self.name} has no "type": {cfg}')
        obj_type = cfg.pop('type')
        if isinstance(obj_type, str):
            ctor = self.get(obj_type)
            if ctor is None:
                raise KeyError(f'{obj_type} is not registered in {self.name}. '
                               f'Available: {sorted(self._module_dict)}')
        elif inspect.isclass(obj_type) or callable(obj_type):
            ctor = obj_type
        else:
            raise TypeError(f'type must be a str or callable, got {type(obj_type)}')
        if default_args:
            for k, v in default_args.items():
                cfg.setdefault(k, v)
        return ctor(**cfg)


# Framework-wide registries, mirroring the reference's split between
# top-level models (MODELS) and inner modules (MODULES), plus the runner-side
# registries (HOOKS / DATASETS / OPTIMIZERS / MODULE_WRAPPERS).
MODELS = Registry('models')            # top-level composition (LatentDiffusion*, Diffusion2D)
MODULES = Registry('modules')          # diffusion math, architectures, losses, samplers
HOOKS = Registry('hooks')              # runner hooks
DATASETS = Registry('datasets')        # datasets
OPTIMIZERS = Registry('optimizers')    # optax factories
SCHEDULERS = Registry('schedulers')    # inference-time flow schedulers


def build_model(cfg, default_args=None):
    return MODELS.build(cfg, default_args)


def build_module(cfg, default_args=None):
    return MODULES.build(cfg, default_args)
