"""Runner hooks: logging, checkpointing, host-side metric aggregation.

Equivalent capability to the reference hook stack
(``lakonlab/runner/hooks``: TextLogger with iter time/ETA, CheckpointHook
with async saves + pruning, loss-vs-timestep quartile EMA logging in
``losses/diffusion_loss.py:136-167``). Device-side state stays functional;
hooks only consume the log dict the jitted step returns.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Dict, Optional, Sequence

import numpy as np

from ..registry import HOOKS


class IterTimer:
    """Wall-clock section timer (context manager), enabled on demand —
    behavioral match of the reference's ``IterTimer``
    (``lakonlab/runner/timer.py:15-52``) with device sync handled by the
    runner (XLA has no per-stream synchronize; the runner blocks on the
    step's outputs instead)."""

    def __init__(self, name: str = 'time', enabled: bool = False):
        self.name = name
        self.enabled = enabled
        self.times = []
        self._t0 = None

    def __enter__(self):
        if self.enabled:
            self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.enabled and self._t0 is not None:
            self.times.append(time.perf_counter() - self._t0)
            self._t0 = None

    def average(self) -> float:
        return float(np.mean(self.times)) if self.times else 0.0

    def reset(self):
        self.times = []


class IterTimers(dict):
    """Named timer registry (reference ``IterTimers``, timer.py:55-72)."""

    def add_timer(self, name: str = 'time', enabled: bool = False):
        self[name] = IterTimer(name, enabled=enabled)
        return self[name]

    def enable_all(self):
        for t in self.values():
            t.enabled = True

    def disable_all(self):
        for t in self.values():
            t.enabled = False


class Hook:
    priority = 50

    def before_run(self, runner):
        pass

    def after_train_iter(self, runner):
        pass

    def after_run(self, runner):
        pass


@HOOKS.register_module()
class TextLoggerHook(Hook):
    """Periodic console/file logging with smoothed iter time and ETA."""

    def __init__(self, interval: int = 50, by_epoch: bool = False):
        self.interval = interval
        self._t_last = None
        self._iter_times = []

    def before_run(self, runner):
        self._t_last = time.perf_counter()

    def after_train_iter(self, runner):
        now = time.perf_counter()
        self._iter_times.append(now - self._t_last)
        self._t_last = now
        if len(self._iter_times) > 200:
            self._iter_times = self._iter_times[-100:]
        if runner.iter % self.interval != 0:
            return
        t_avg = float(np.mean(self._iter_times[-self.interval:]))
        eta = t_avg * (runner.total_iters - runner.iter)
        scalars = {k: float(v) for k, v in runner.log_buffer.items()
                   if np.ndim(v) == 0}
        msg = ', '.join(f'{k}: {v:.4g}' for k, v in sorted(scalars.items()))
        runner.logger.info(
            f'iter [{runner.iter}/{runner.total_iters}] '
            f'time: {t_avg:.3f}s, eta: {eta / 60:.1f}min, {msg}')


@HOOKS.register_module()
class JsonLoggerHook(Hook):
    """Append per-interval scalar logs to work_dir/metrics.jsonl
    (the tensorboard/wandb slot of the reference's log_config)."""

    def __init__(self, interval: int = 50):
        self.interval = interval
        self._fh = None

    def before_run(self, runner):
        path = os.path.join(runner.work_dir, 'metrics.jsonl')
        os.makedirs(runner.work_dir, exist_ok=True)
        self._fh = open(path, 'a', encoding='utf-8')

    def after_train_iter(self, runner):
        if runner.iter % self.interval != 0 or self._fh is None:
            return
        rec = {'iter': runner.iter}
        rec.update({k: float(v) for k, v in runner.log_buffer.items()
                    if np.ndim(v) == 0})
        self._fh.write(json.dumps(rec) + '\n')
        self._fh.flush()

    def after_run(self, runner):
        if self._fh is not None:
            self._fh.close()


@HOOKS.register_module()
class TensorboardLoggerHook(Hook):
    """Real TensorBoard event stream (reference log_config TB hook) via
    torch.utils.tensorboard; scalars from the runner's log buffer."""

    priority = 90

    def __init__(self, interval: int = 50, log_dir: Optional[str] = None):
        self.interval = interval
        self.log_dir = log_dir
        self._writer = None

    def _get_writer(self, runner):
        if self._writer is None:
            from torch.utils.tensorboard import SummaryWriter
            self._writer = SummaryWriter(
                self.log_dir or os.path.join(runner.work_dir, 'tf_logs'))
        return self._writer

    def after_train_iter(self, runner):
        if runner.iter % self.interval != 0:
            return
        w = self._get_writer(runner)
        for k, v in runner.log_buffer.items():
            try:
                w.add_scalar(k, float(np.asarray(v)), runner.iter)
            except (TypeError, ValueError):
                continue
        w.flush()

    def after_run(self, runner):
        if self._writer is not None:
            self._writer.close()


@HOOKS.register_module()
class WandbLoggerHook(Hook):
    """Weights & Biases logging behind an import guard (the reference wires
    mmcv's WandbLoggerHook from log_config, README.md:83-89).

    With the wandb package installed this is a real event stream
    (zero-egress machines can use ``WANDB_MODE=offline``); without it the
    hook degrades to the metrics.jsonl stream with a warning instead of
    failing the run.
    """

    priority = 90

    def __init__(self, interval: int = 50,
                 init_kwargs: Optional[Dict[str, Any]] = None):
        self.interval = interval
        self.init_kwargs = dict(init_kwargs or {})
        self._run = None
        self._fallback = None

    def before_run(self, runner):
        try:
            import wandb
        except ImportError:
            runner.logger.warning(
                'wandb is not installed; WandbLoggerHook falls back to '
                'metrics.jsonl (install wandb or use WANDB_MODE=offline '
                'for a real event stream)')
            self._fallback = JsonLoggerHook(self.interval)
            self._fallback.before_run(runner)
            return
        kwargs = dict(self.init_kwargs)
        kwargs.setdefault('dir', runner.work_dir)
        self._run = wandb.init(**kwargs)

    def after_train_iter(self, runner):
        if self._fallback is not None:
            self._fallback.after_train_iter(runner)
            return
        if runner.iter % self.interval != 0 or self._run is None:
            return
        scalars = {k: float(v) for k, v in runner.log_buffer.items()
                   if np.ndim(v) == 0}
        self._run.log(scalars, step=runner.iter)

    def after_run(self, runner):
        if self._fallback is not None:
            self._fallback.after_run(runner)
        elif self._run is not None:
            self._run.finish()
            self._run = None


@HOOKS.register_module()
class IterTimerHook(Hook):
    """Per-section wall timers: data / dispatch / device-synced step.

    Equivalent of the reference's synchronized ``IterTimer`` section timers
    (``lakonlab/runner/timer.py:15-72``). ``sync=True`` blocks on the step's
    log outputs every iteration so 'step' measures true device time — like
    the reference's ``torch.cuda.synchronize()`` timers this is a
    diagnostic mode: it defeats async dispatch overlap while enabled.
    Logged as ``time_data`` / ``time_step`` (+ ``time_iter`` total).
    """

    priority = 30

    def __init__(self, interval: int = 50, sync: bool = True):
        self.interval = interval
        self.sync = sync
        self._t_iter_last = None
        self._iter_times = []

    def before_run(self, runner):
        runner.timers.enable_all()
        runner.sync_each_iter = runner.sync_each_iter or self.sync
        self._t_iter_last = time.perf_counter()

    def after_train_iter(self, runner):
        now = time.perf_counter()
        self._iter_times.append(now - self._t_iter_last)
        self._t_iter_last = now
        if runner.iter % self.interval != 0:
            return
        for name, timer in runner.timers.items():
            if timer.times:
                runner.log_buffer[f'time_{name}'] = timer.average()
                timer.reset()
        runner.log_buffer['time_iter'] = float(np.mean(self._iter_times))
        self._iter_times = []

    def after_run(self, runner):
        runner.timers.disable_all()
        runner.sync_each_iter = False


@HOOKS.register_module()
class QuartileLossLoggerHook(Hook):
    """EMA of per-sample loss/var grouped by timestep quartile.

    Host-side equivalent of the reference's in-loss quartile logging
    (``diffusion_loss.py:136-167``): EMA weight ``1 - exp(-momentum * count)``
    per quartile. Reads 'per_sample_loss' / 'per_sample_var' / 'timesteps'
    from the step log dict.
    """

    def __init__(self, total_timesteps: int = 1000, momentum: float = 0.1,
                 prefix: str = 'loss'):
        self.total_timesteps = total_timesteps
        self.momentum = momentum
        self.prefix = prefix
        self.loss_q = np.zeros(4)
        self.var_q = np.ones(4)
        self.count_q = np.zeros(4, np.int64)

    def after_train_iter(self, runner):
        logs = runner.log_buffer
        if 'per_sample_loss' not in logs or 'timesteps' not in logs:
            return
        loss = np.asarray(logs['per_sample_loss']).reshape(-1)
        t = np.asarray(logs['timesteps']).reshape(-1)
        if loss.shape[0] != t.shape[0]:
            return
        var = np.asarray(logs.get('per_sample_var', np.ones_like(loss))).reshape(-1)
        quart = np.clip((t / self.total_timesteps * 4).astype(int), 0, 3)
        for q in range(4):
            mask = quart == q
            n = int(mask.sum())
            if n == 0:
                continue
            cur_w = 1 - np.exp(-self.momentum * n)
            self.count_q[q] += n
            total_w = max(1 - np.exp(-self.momentum * self.count_q[q]), 1e-4)
            w = cur_w / total_w
            self.loss_q[q] = self.loss_q[q] * (1 - w) + loss[mask].mean() * w
            self.var_q[q] = self.var_q[q] * (1 - w) + var[mask].mean() * w
            runner.log_buffer[f'{self.prefix}_quartile_{q}'] = self.loss_q[q]


@HOOKS.register_module()
class EvalHook(Hook):
    """Periodic validation sampling (reference eval hooks registered from the
    config's ``evaluation`` block, apis/train.py:126-139): runs
    ``model.val_step`` on a fixed batch, writes sample artifacts to
    work_dir/eval, logs summary stats."""

    priority = 60

    def __init__(self, interval: int = 1000, batch: Optional[dict] = None,
                 num_samples: int = 64, val_kwargs: Optional[dict] = None,
                 metrics: Sequence[str] = ('latent_fd',),
                 clip_path: Optional[str] = None):
        self.interval = interval
        self.batch = batch
        self.num_samples = num_samples
        self.val_kwargs = val_kwargs or {}
        self.metrics = tuple(metrics or ())
        self.clip_path = clip_path

    def after_train_iter(self, runner):
        if runner.iter % self.interval != 0:
            return
        import jax
        batch = self.batch if self.batch is not None \
            else dict(num_samples=self.num_samples)
        out = runner.model.val_step(runner.state,
                                    jax.random.PRNGKey(runner.iter), batch,
                                    **self.val_kwargs)
        out_dir = os.path.join(runner.work_dir, 'eval')
        os.makedirs(out_dir, exist_ok=True)
        if isinstance(out, dict) and 'pred_imgs' in out:
            from ..utils.io_utils import save_image_grid
            imgs = np.asarray(out['pred_imgs'])
            save_image_grid(imgs,
                            os.path.join(out_dir, f'iter_{runner.iter}.png'))
            if 'clip_score' in self.metrics and isinstance(batch, dict) \
                    and batch.get('prompt'):
                from ..utils.metrics import clip_score
                score = clip_score(imgs, batch['prompt'],
                                   **({'clip_path': self.clip_path}
                                      if self.clip_path else {}))
                if score is not None:
                    runner.log_buffer['eval_clip_score'] = score
        else:
            arr = np.asarray(out['pred_latents']) if isinstance(out, dict) \
                else np.asarray(out)
            np.savez(os.path.join(out_dir, f'iter_{runner.iter}.npz'),
                     samples=arr)
            runner.log_buffer['eval_sample_std'] = float(arr.std())
            # quantitative quality: Fréchet distance between generated and
            # reference latents (the batch's real data) when available
            if 'latent_fd' in self.metrics and isinstance(batch, dict) \
                    and batch.get('latents') is not None:
                from ..utils.metrics import latent_frechet_distance
                runner.log_buffer['eval_latent_fd'] = latent_frechet_distance(
                    arr, np.asarray(batch['latents']))
        runner.logger.info(f'eval @ iter {runner.iter} written to {out_dir}')


@HOOKS.register_module()
class ProfilerHook(Hook):
    """Capture a jax.profiler trace for a window of iterations (the TPU
    equivalent of the reference's IterTimer section timers, SURVEY.md §5)."""

    def __init__(self, start_iter: int = 10, num_iters: int = 5,
                 out_dir: Optional[str] = None):
        self.start_iter = start_iter
        self.stop_iter = start_iter + num_iters
        self.out_dir = out_dir
        self._active = False

    def after_train_iter(self, runner):
        import jax
        if runner.iter == self.start_iter and not self._active:
            out = self.out_dir or os.path.join(runner.work_dir, 'profile')
            os.makedirs(out, exist_ok=True)
            jax.profiler.start_trace(out)
            self._active = True
            runner.logger.info(f'profiler trace started -> {out}')
        elif runner.iter >= self.stop_iter and self._active:
            jax.profiler.stop_trace()
            self._active = False
            runner.logger.info('profiler trace stopped')

    def after_run(self, runner):
        if self._active:
            import jax
            jax.profiler.stop_trace()
            self._active = False


@HOOKS.register_module()
class CheckpointHook(Hook):
    """Drives the CheckpointManager on its interval; final forced save."""

    priority = 40

    def __init__(self, manager=None):
        self.manager = manager

    def after_train_iter(self, runner):
        if self.manager is not None:
            self.manager.save(runner.state)

    def after_run(self, runner):
        if self.manager is not None:
            self.manager.save(runner.state, force=True)
            self.manager.wait()


def build_logger(work_dir: str, name: str = 'arcflow_tpu') -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.propagate = False
    if not logger.handlers:
        fmt = logging.Formatter('%(asctime)s %(levelname)s %(message)s')
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        if work_dir:
            os.makedirs(work_dir, exist_ok=True)
            fh = logging.FileHandler(os.path.join(
                work_dir, f'{time.strftime("%Y%m%d_%H%M%S")}.log'))
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    return logger
