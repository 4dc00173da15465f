"""Iteration-based training runner.

Equivalent capability to the reference ``DynamicIterBasedRunnerMod``
(``lakonlab/runner/dynamic_iter_based_runner.py:43-219``): iter-based loop,
hook dispatch, checkpoint/resume with optimizer state and sampler
fast-forward, ``running_status`` (iteration) piped into the loss, manual GC
pacing (``gc_interval``). The reference's async-save thread is unnecessary
here — Orbax owns the async write.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, Optional, Sequence

import jax
import numpy as np

from ..registry import HOOKS
from .hooks import Hook, IterTimers, build_logger
from .train_state import TrainState


class IterBasedRunner:
    def __init__(self, model, state: TrainState,
                 train_step_fn: Callable,
                 data_iter: Iterable,
                 total_iters: int,
                 work_dir: str = 'work_dirs/default',
                 hooks: Sequence[Hook] = (),
                 logger=None,
                 gc_interval: Optional[int] = None):
        self.model = model
        self.state = state
        self.train_step_fn = train_step_fn
        self.data_iter = data_iter
        self.total_iters = total_iters
        self.work_dir = work_dir
        self.logger = logger or build_logger(work_dir)
        self._hooks = sorted(hooks, key=lambda h: h.priority)
        self.log_buffer: Dict[str, Any] = {}
        # Host-side iteration counter. Reading the device step every iter
        # (int(state.step)) forces a device round-trip that kills async
        # dispatch overlap; the device step is consulted once, at resume.
        self._iter = int(state.step)
        # Manual GC pacing (reference dynamic_iter_based_runner.py:85-100):
        # the jitted step itself allocates nothing on the Python heap, but
        # the host data pipeline (zstd decode, numpy staging, prefetch
        # threads) does — an unscheduled GC pause mid-loop stalls dispatch.
        # With gc_interval set, automatic GC is disabled for the loop and a
        # full collection runs every N iters instead.
        self.gc_interval = gc_interval
        # Section timers (IterTimerHook enables them): 'data' wraps the host
        # fetch, 'step' wraps dispatch (+ a blocking device sync when
        # sync_each_iter — the reference's synchronized-timer diagnostic).
        self.timers = IterTimers()
        self.timers.add_timer('data')
        self.timers.add_timer('step')
        self.sync_each_iter = False

    @property
    def iter(self) -> int:
        return self._iter

    def call_hook(self, fn_name: str):
        for h in self._hooks:
            getattr(h, fn_name)(self)

    def run(self):
        import gc
        import signal
        import threading
        self.call_hook('before_run')
        self.logger.info(
            f'starting at iter {self._iter}, target {self.total_iters}')
        gc_was_enabled = gc.isenabled()
        if self.gc_interval:
            gc.collect()
            gc.disable()

        # Preemption-safe training: TPU pods get SIGTERM'd. First signal
        # finishes the in-flight iter, force-saves through the checkpoint
        # hooks (after_run below), and exits cleanly — auto-resume then
        # continues at the exact iter (reference's crash-relaunch-resume
        # story, apis/train.py:158-164, made signal-driven). A second
        # signal restores the default disposition so a stuck save can
        # still be killed.
        self._preempted = False
        prev_handlers = {}

        def _on_signal(signum, frame):
            if self._preempted:
                signal.signal(signum, signal.SIG_DFL)
                signal.raise_signal(signum)
            self._preempted = True
            self.logger.warning(
                f'signal {signum}: finishing current iter, saving '
                f'checkpoint, exiting (signal again to force-kill)')

        if threading.current_thread() is threading.main_thread():
            for s in (signal.SIGTERM, signal.SIGINT):
                prev_handlers[s] = signal.signal(s, _on_signal)
        try:
            while self._iter < self.total_iters and not self._preempted:
                with self.timers['data']:
                    batch = next(self.data_iter)
                    # host numpy -> device; already-placed arrays pass
                    batch = jax.tree.map(
                        lambda x: x if isinstance(x, jax.Array)
                        else np.asarray(x), batch)
                with self.timers['step']:
                    self.state, logs = self.train_step_fn(self.state, batch)
                    if self.sync_each_iter:
                        jax.block_until_ready(logs)
                self._iter += 1
                self.log_buffer = dict(logs)
                self.call_hook('after_train_iter')
                if self.gc_interval and self._iter % self.gc_interval == 0:
                    gc.collect()
        finally:
            if self.gc_interval and gc_was_enabled:
                gc.enable()
            # CheckpointHook.after_run force-saves at the current iter and
            # joins the async write — this is the preemption flush
            self.call_hook('after_run')
            for s, h in prev_handlers.items():
                signal.signal(s, h)
        if self._preempted:
            self.logger.warning(
                f'preempted at iter {self._iter}; checkpoint flushed')
        return self.state


def build_hooks(log_config: Optional[dict] = None, extra_hooks: Sequence = (),
                logger=None) -> list:
    """Build hook objects from a reference-style ``log_config`` plus extras.

    All config kwargs the hook's __init__ accepts are passed through;
    unsupported keys and aliased hook types are logged, never silently
    dropped.
    """
    import inspect
    import logging
    logger = logger or logging.getLogger('arcflow_tpu')
    hooks = []
    if log_config:
        interval = log_config.get('interval', 50)
        for h_cfg in log_config.get('hooks', []):
            h_cfg = dict(h_cfg)
            h_type = h_cfg.pop('type')
            if h_type not in HOOKS:
                logger.warning(f'unknown hook type {h_type!r} skipped')
                continue
            cls = HOOKS.get(h_type)
            h_cfg.setdefault('interval', interval)
            sig = inspect.signature(cls.__init__)
            accepts_kwargs = any(
                p.kind == inspect.Parameter.VAR_KEYWORD
                for p in sig.parameters.values())
            if not accepts_kwargs:
                dropped = {k for k in h_cfg if k not in sig.parameters}
                if dropped:
                    logger.warning(
                        f'{h_type}: unsupported config keys {sorted(dropped)} '
                        f'dropped')
                h_cfg = {k: v for k, v in h_cfg.items()
                         if k in sig.parameters}
            hooks.append(cls(**h_cfg))
    hooks.extend(extra_hooks)
    return hooks
