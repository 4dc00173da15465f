"""Trainer mechanics: optimizer builder, clip/skip, EMA, train-step compiler."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from arcflow_tpu.runner import (EmaConfig, GradClipConfig, TrainState,
                                build_single_optimizer, build_train_step,
                                clip_and_skip, ema_momentum, ema_update)


def test_paramwise_lr_mult():
    params = {'backbone': {'kernel': jnp.ones((4, 4))},
              'proj_out_loggamma': {'kernel': jnp.ones((4, 4))}}
    tx = build_single_optimizer(
        dict(type='SGD', lr=1.0,
             paramwise_cfg=dict(custom_keys={'proj_out_loggamma':
                                             dict(lr_mult=0.1)})), params)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    np.testing.assert_allclose(np.asarray(updates['backbone']['kernel'])[0, 0],
                               -1.0, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(updates['proj_out_loggamma']['kernel'])[0, 0], -0.1,
        rtol=1e-6)


def test_clip_and_skip_behavior():
    cfg = GradClipConfig(max_norm=1.0, begin_iter=10, skip_ratio=2.0)
    big = {'w': jnp.full((4,), 100.0)}

    # before begin_iter: no clipping, no ratio-skip
    g, norm, skip = clip_and_skip(big, jnp.asarray(5), cfg)
    assert not bool(skip)
    np.testing.assert_allclose(np.asarray(g['w']), 100.0)

    # after begin_iter: clipped to max_norm, skip because norm > 1 * 2
    g, norm, skip = clip_and_skip(big, jnp.asarray(50), cfg)
    assert bool(skip)
    np.testing.assert_allclose(float(optax.global_norm(g)), 1.0, rtol=1e-5)

    # NaN always skips, grads sanitized
    nan_g = {'w': jnp.array([jnp.nan, 1.0, 1.0, 1.0])}
    g, norm, skip = clip_and_skip(nan_g, jnp.asarray(50), cfg)
    assert bool(skip)
    assert bool(jnp.isfinite(g['w']).all())


def test_karras_ema_momentum():
    cfg = EmaConfig(momentum_policy='karras', gamma=7.0, start_iter=0)
    # t=1 -> beta=0; large t -> beta -> 1
    assert float(ema_momentum(cfg, jnp.asarray(0))) == 0.0
    b1000 = float(ema_momentum(cfg, jnp.asarray(999)))
    assert 0.99 < b1000 < 1.0
    np.testing.assert_allclose(b1000, (1 - 1 / 1000) ** 8, rtol=1e-6)


def test_ema_copy_through_before_start():
    cfg = EmaConfig(momentum_policy='karras', gamma=7.0, start_iter=100)
    ema = {'w': jnp.zeros(3)}
    params = {'w': jnp.ones(3)}
    out = ema_update(cfg, ema, params, jnp.asarray(5))
    np.testing.assert_allclose(np.asarray(out['w']), 1.0)   # copied
    out2 = ema_update(cfg, ema, params, jnp.asarray(150))
    assert 0.0 < float(out2['w'][0]) < 1.0                  # lerped


class QuadraticModel:
    """Minimal model: loss = ||w - target||^2; one submodule 'net'."""

    def loss(self, trainable, frozen, rng, batch, running_status=None):
        w = trainable['net']['w']
        per_sample = jnp.square(w - batch['target']).sum(-1)
        return per_sample.mean(), dict(per_sample_loss=per_sample)


def make_state_and_step(grad_accum_steps=1, **train_cfg):
    model = QuadraticModel()
    trainable = {'net': {'w': jnp.zeros(2)}}
    optimizers = {'net': optax.sgd(0.1)}
    state = TrainState.create(jax.random.PRNGKey(0), trainable, {},
                              optimizers, ema_keys=('net',))
    step = build_train_step(model, optimizers, train_cfg=train_cfg,
                            ema_cfg=EmaConfig(momentum_policy='fixed',
                                              momentum=0.5),
                            grad_accum_steps=grad_accum_steps, donate=False)
    return state, step


def test_train_step_descends_and_counts():
    state, step = make_state_and_step()
    batch = {'target': jnp.ones((4, 2))}
    for _ in range(20):
        state, logs = step(state, batch)
    assert int(state.step) == 20
    np.testing.assert_allclose(np.asarray(state.trainable['net']['w']),
                               np.ones(2), atol=3e-2)
    assert float(logs['loss']) < 1e-2
    # EMA trails the params
    assert 0.9 < float(state.ema['net']['w'][0]) <= 1.0


def test_adamw8bit_slot_trains():
    """The reference's bitsandbytes AdamW8bit slot resolves to Adafactor
    through the product builder (runner/optim.py) and descends through the
    full train step — the path `bench.py --train --optim adamw8bit` runs.
    Its state must carry no full-size fp32 m/v pair (that is the point)."""
    model = QuadraticModel()
    # NOT zero-init: adafactor's multiply_by_parameter_scale stalls at the
    # origin (update ∝ ||w||) — the real models never start there
    trainable = {'net': {'w': 0.3 * jax.random.normal(
        jax.random.PRNGKey(7), (128, 256))}}
    optimizers = {'net': build_single_optimizer(
        dict(type='AdamW8bit', lr=0.05), None)}
    state = TrainState.create(jax.random.PRNGKey(0), trainable, {},
                              optimizers, ema_keys=('net',))
    step = build_train_step(model, optimizers, train_cfg={},
                            ema_cfg=EmaConfig(momentum_policy='fixed',
                                              momentum=0.5), donate=False)
    batch = {'target': jnp.ones((4, 128, 256))}
    loss0 = None
    for i in range(60):
        state, logs = step(state, batch)
        if loss0 is None:
            loss0 = float(logs['loss'])
    assert float(logs['loss']) < loss0 * 0.5
    # factored second moments only: no optimizer leaf matches the full
    # (128, 256) param shape (adam would carry two)
    full = [x for x in jax.tree.leaves(state.opt_states)
            if getattr(x, 'shape', None) == (128, 256)]
    assert not full, [x.shape for x in full]


def test_train_step_grad_accum_equivalence():
    state1, step1 = make_state_and_step(grad_accum_steps=1)
    state4, step4 = make_state_and_step(grad_accum_steps=4)
    batch = {'target': jnp.ones((8, 2))}
    s1, logs1 = step1(state1, batch)
    s4, logs4 = step4(state4, batch)
    # loss is batch-size independent here; grads averaged over chunks match
    np.testing.assert_allclose(np.asarray(s1.trainable['net']['w']),
                               np.asarray(s4.trainable['net']['w']), rtol=1e-5)


def test_train_step_skips_on_nan():
    class NaNModel:
        def loss(self, trainable, frozen, rng, batch, running_status=None):
            w = trainable['net']['w']
            # NaN loss -> NaN grads
            return (w.sum() * jnp.nan), {}

    model = NaNModel()
    trainable = {'net': {'w': jnp.ones(2)}}
    optimizers = {'net': optax.sgd(0.1)}
    state = TrainState.create(jax.random.PRNGKey(0), trainable, {}, optimizers)
    step = build_train_step(model, optimizers, train_cfg={}, donate=False)
    new_state, logs = step(state, {'target': jnp.ones((2, 2))})
    # params unchanged, step still advances, skip flagged
    np.testing.assert_allclose(np.asarray(new_state.trainable['net']['w']), 1.0)
    assert float(logs['net_skipped']) == 1.0
    assert int(new_state.step) == 1


def test_train_step_host_offload_matches_plain():
    """offload_shardings keeps optimizer slots + EMA in pinned host memory
    across steps with BIT-IDENTICAL trajectories to the on-device step (the
    capacity mode behind ``bench.py --train --offload``)."""
    from jax.sharding import SingleDeviceSharding
    dev = jax.devices()[0]
    dev_s = SingleDeviceSharding(dev)
    host_s = SingleDeviceSharding(dev, memory_kind='pinned_host')

    model = QuadraticModel()
    optimizers = {'net': optax.adamw(0.1)}

    def make(offload):
        trainable = {'net': {'w': jnp.zeros(2)}}
        state = TrainState.create(jax.random.PRNGKey(0), trainable, {},
                                  optimizers, ema_keys=('net',))
        if offload:
            state = state.replace(
                opt_states=jax.tree.map(
                    lambda x: jax.device_put(x, host_s), state.opt_states),
                ema=jax.tree.map(lambda x: jax.device_put(x, host_s),
                                 state.ema))
        step = build_train_step(
            model, optimizers, train_cfg={},
            ema_cfg=EmaConfig(momentum_policy='fixed', momentum=0.5),
            donate=False,
            offload_shardings=(dev_s, host_s) if offload else None)
        return state, step

    s_plain, step_plain = make(False)
    s_off, step_off = make(True)
    batch = {'target': jnp.ones((4, 2))}
    for _ in range(5):
        s_plain, _ = step_plain(s_plain, batch)
        s_off, logs = step_off(s_off, batch)
    # cold state stays host-resident across steps on TPU; the XLA:CPU
    # backend silently drops output memory-space annotations (verified:
    # out_shardings with a host memory kind raises NOT_FOUND
    # annotate_device_placement there), so the placement assert is
    # TPU-only — the numerical path below is identical either way
    if jax.default_backend() == 'tpu':
        ema_leaf = jax.tree.leaves(s_off.ema)[0]
        assert ema_leaf.sharding.memory_kind == 'pinned_host', \
            ema_leaf.sharding
        opt_leaf = [x for x in jax.tree.leaves(s_off.opt_states)
                    if hasattr(x, 'sharding')][0]
        assert opt_leaf.sharding.memory_kind == 'pinned_host'
    # identical trajectory
    np.testing.assert_array_equal(np.asarray(s_plain.trainable['net']['w']),
                                  np.asarray(s_off.trainable['net']['w']))
    np.testing.assert_array_equal(np.asarray(s_plain.ema['net']['w']),
                                  np.asarray(s_off.ema['net']['w']))
    for a, b in zip(jax.tree.leaves(s_plain.opt_states),
                    jax.tree.leaves(s_off.opt_states)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.isfinite(float(logs['loss']))


def test_runner_tracks_iteration_on_host():
    """The loop must not read the device step per iteration (a host sync
    that kills async dispatch); it is consulted once, at resume."""
    import itertools
    import logging
    from arcflow_tpu.runner.runner import IterBasedRunner

    class CountingStep:
        reads = 0

        def __int__(self):
            CountingStep.reads += 1
            return 7    # resumed mid-run

    class StubState:
        step = CountingStep()

    state = StubState()
    runner = IterBasedRunner(
        model=None, state=state,
        train_step_fn=lambda s, b: (s, {'loss': 0.0}),
        data_iter=itertools.repeat({'x': np.zeros((1,))}),
        total_iters=30, work_dir='/tmp/runner_host_iter', hooks=[],
        logger=logging.getLogger('test'))
    runner.run()
    assert runner.iter == 30
    assert CountingStep.reads == 1, \
        f'device step read {CountingStep.reads} times (expected once)'


def test_build_hooks_passes_kwargs_and_warns():
    # capture with our own handler: build_logger sets propagate=False on
    # the 'arcflow_tpu' logger, so caplog misses records when any earlier
    # test has configured it (order-dependent otherwise)
    import logging
    from arcflow_tpu.runner.runner import build_hooks
    records = []

    class Grab(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    logger = logging.getLogger('arcflow_tpu')
    grab = Grab(level=logging.WARNING)
    logger.addHandler(grab)
    old_level = logger.level
    logger.setLevel(logging.WARNING)
    try:
        hooks = build_hooks(dict(
            interval=25,
            hooks=[dict(type='TextLoggerHook', by_epoch=False, bogus_key=1),
                   dict(type='TensorboardLoggerHook'),
                   dict(type='WandbLoggerHook')]))
    finally:
        logger.removeHandler(grab)
        logger.setLevel(old_level)
    assert hooks[0].interval == 25   # by_epoch accepted, bogus_key dropped
    assert type(hooks[1]).__name__ == 'TensorboardLoggerHook'  # real TB
    assert type(hooks[2]).__name__ == 'WandbLoggerHook'        # real hook
    text = ' '.join(records)
    assert 'bogus_key' in text


def test_tensorboard_hook_writes_events(tmp_path):
    import logging
    import os
    from arcflow_tpu.runner.hooks import TensorboardLoggerHook

    class Runner:
        iter = 50
        work_dir = str(tmp_path)
        log_buffer = {'loss': 1.25, 'note': 'not-a-scalar'}
        logger = logging.getLogger('test')

    hook = TensorboardLoggerHook(interval=50)
    hook.after_train_iter(Runner())
    hook.after_run(Runner())
    tf_dir = os.path.join(str(tmp_path), 'tf_logs')
    assert os.path.isdir(tf_dir) and os.listdir(tf_dir)


def test_runner_gc_interval_paces_collections():
    """gc_interval: automatic GC disabled inside the loop, manual collect
    every N iters, re-enabled after (reference
    dynamic_iter_based_runner.py:85-100)."""
    import gc
    import itertools
    import logging
    from arcflow_tpu.runner.runner import IterBasedRunner

    seen = []

    class StubState:
        step = 0

    def step_fn(s, b):
        seen.append(gc.isenabled())
        return s, {'loss': 0.0}

    assert gc.isenabled()
    runner = IterBasedRunner(
        model=None, state=StubState(),
        train_step_fn=step_fn,
        data_iter=itertools.repeat({'x': np.zeros((1,))}),
        total_iters=6, work_dir='/tmp/runner_gc', hooks=[],
        logger=logging.getLogger('test'), gc_interval=2)
    runner.run()
    assert not any(seen), 'GC must be disabled inside the loop'
    assert gc.isenabled(), 'GC must be re-enabled after the loop'


def test_profiler_hook_writes_trace(tmp_path):
    """ProfilerHook opens a jax.profiler trace window and writes events."""
    import itertools
    import logging
    import os
    from arcflow_tpu.runner.hooks import ProfilerHook
    from arcflow_tpu.runner.runner import IterBasedRunner

    class StubState:
        step = 0

    out = str(tmp_path / 'prof')
    runner = IterBasedRunner(
        model=None, state=StubState(),
        train_step_fn=lambda s, b: (s, {'loss': float(jnp.sum(
            jnp.ones((8, 8)) @ jnp.ones((8, 8))))}),
        data_iter=itertools.repeat({'x': np.zeros((1,))}),
        total_iters=8, work_dir=str(tmp_path), hooks=[
            ProfilerHook(start_iter=2, num_iters=3, out_dir=out)],
        logger=logging.getLogger('test'))
    runner.run()
    found = [os.path.join(r, f) for r, _, fs in os.walk(out) for f in fs]
    assert found, 'profiler trace produced no files'


def test_iter_timer_hook_logs_sections(tmp_path):
    """IterTimerHook (reference runner/timer.py:15-72 equivalent) logs
    time_data / time_step / time_iter on its interval."""
    from arcflow_tpu.runner import IterBasedRunner
    from arcflow_tpu.runner.hooks import IterTimerHook

    def fake_step(state, batch):
        return state, {'loss': jnp.asarray(1.0)}

    def data_gen():
        while True:
            yield {'x': np.zeros((2,))}

    runner = IterBasedRunner(model=None, state=_state_stub(), data_iter=data_gen(),
                             train_step_fn=fake_step, total_iters=4,
                             work_dir=str(tmp_path),
                             hooks=[IterTimerHook(interval=2, sync=True)])
    runner.run()
    assert 'time_data' in runner.log_buffer
    assert 'time_step' in runner.log_buffer
    assert 'time_iter' in runner.log_buffer
    assert runner.log_buffer['time_iter'] >= 0.0
    # hook disables the timers again at the end of the run
    assert not runner.timers['data'].enabled
    assert not runner.sync_each_iter


def _state_stub():
    class _S:
        step = 0
    return _S()


def test_wandb_hook_real_stream(tmp_path, monkeypatch):
    """With a wandb package importable, WandbLoggerHook drives the real API
    (verified against a fake module injected into sys.modules)."""
    import sys
    import types
    from arcflow_tpu.runner import IterBasedRunner
    from arcflow_tpu.runner.hooks import WandbLoggerHook

    calls = {'init': [], 'log': [], 'finish': 0}

    class FakeRun:
        def log(self, scalars, step=None):
            calls['log'].append((step, scalars))

        def finish(self):
            calls['finish'] += 1

    fake = types.ModuleType('wandb')
    fake.init = lambda **kw: (calls['init'].append(kw), FakeRun())[1]
    monkeypatch.setitem(sys.modules, 'wandb', fake)

    def fake_step(state, batch):
        return state, {'loss': jnp.asarray(0.5)}

    def data_gen():
        while True:
            yield {'x': np.zeros((2,))}

    runner = IterBasedRunner(model=None, state=_state_stub(),
                             data_iter=data_gen(), train_step_fn=fake_step,
                             total_iters=4, work_dir=str(tmp_path),
                             hooks=[WandbLoggerHook(interval=2)])
    runner.run()
    assert calls['init'] and calls['init'][0]['dir'] == str(tmp_path)
    assert [s for s, _ in calls['log']] == [2, 4]
    assert calls['log'][0][1]['loss'] == 0.5
    assert calls['finish'] == 1


def test_wandb_hook_fallback_without_package(tmp_path, monkeypatch):
    """Without wandb installed the hook degrades to metrics.jsonl with a
    warning (import guard, VERDICT round-2 item 2)."""
    import builtins
    import json as _json
    from arcflow_tpu.runner import IterBasedRunner
    from arcflow_tpu.runner.hooks import WandbLoggerHook

    real_import = builtins.__import__

    def no_wandb(name, *a, **kw):
        if name == 'wandb':
            raise ImportError('no wandb in this build')
        return real_import(name, *a, **kw)
    monkeypatch.setattr(builtins, '__import__', no_wandb)

    def fake_step(state, batch):
        return state, {'loss': jnp.asarray(0.25)}

    def data_gen():
        while True:
            yield {'x': np.zeros((2,))}

    runner = IterBasedRunner(model=None, state=_state_stub(),
                             data_iter=data_gen(), train_step_fn=fake_step,
                             total_iters=2, work_dir=str(tmp_path),
                             hooks=[WandbLoggerHook(interval=2)])
    runner.run()
    metrics = (tmp_path / 'metrics.jsonl').read_text().strip().splitlines()
    assert _json.loads(metrics[-1])['loss'] == 0.25
