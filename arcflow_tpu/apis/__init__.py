"""High-level entry points (reference ``lakonlab/apis``)."""

from .train import train_model, build_model_from_cfg, ema_config_from_cfg
from .inference import init_model

__all__ = ['train_model', 'build_model_from_cfg', 'ema_config_from_cfg',
           'init_model']
