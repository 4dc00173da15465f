"""Training runner: optimizers, EMA, train-step compiler, checkpoints, hooks."""

from .optim import (build_optimizers, build_single_optimizer, GradClipConfig,
                    clip_and_skip, select_tree)
from .ema import EmaConfig, ema_update, ema_momentum
from .train_state import TrainState, count_params
from .train_step import build_train_step
from .checkpoint import CheckpointManager
from .hooks import (Hook, TextLoggerHook, JsonLoggerHook,
                    QuartileLossLoggerHook, CheckpointHook, EvalHook,
                    ProfilerHook, build_logger)
from .runner import IterBasedRunner, build_hooks

__all__ = [
    'build_optimizers', 'build_single_optimizer', 'GradClipConfig',
    'clip_and_skip', 'select_tree',
    'EmaConfig', 'ema_update', 'ema_momentum',
    'TrainState', 'count_params', 'build_train_step', 'CheckpointManager',
    'Hook', 'TextLoggerHook', 'JsonLoggerHook', 'QuartileLossLoggerHook',
    'CheckpointHook', 'EvalHook', 'ProfilerHook', 'build_logger',
    'IterBasedRunner', 'build_hooks',
]
