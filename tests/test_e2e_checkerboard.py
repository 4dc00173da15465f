"""End-to-end slice: config -> flow training -> checkpoint resume ->
ArcFlow distillation with the trained teacher -> 2-NFE samples in-support.

This is the trainer's integration test (reference analogue: the CPU-runnable
checkerboard/Diffusion2D path, SURVEY.md §4.3).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arcflow_tpu import Config
from arcflow_tpu.apis import train_model
from arcflow_tpu.data import CheckerboardData

CFG_DIR = os.path.join(os.path.dirname(__file__), '..', 'configs', 'toy')


def small_flow_cfg(tmp_path, total_iters=3000):
    cfg = Config.fromfile(os.path.join(CFG_DIR, 'checkerboard_flow.py'))
    cfg.merge_from_dict({
        'model.diffusion.denoising.hidden': (128, 128),
        'data.train.n_rc': 2,            # easy 2x2 board for a short budget
        'data.train_dataloader.samples_per_gpu': 512,
        'total_iters': total_iters,
        'checkpoint_config.interval': 1000,
        'log_config.interval': 1000,
    })
    cfg.work_dir = str(tmp_path / 'flow')
    return cfg


@pytest.fixture(scope='module')
def trained_flow(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp('e2e')
    cfg = small_flow_cfg(tmp_path)
    state, model = train_model(cfg, seed=0)
    return tmp_path, cfg, state, model


def test_flow_training_and_sampling(trained_flow):
    tmp_path, cfg, state, model = trained_flow
    assert int(state.step) == 3000
    samples = model.val_step(state, jax.random.PRNGKey(0),
                             dict(num_samples=2048),
                             test_cfg_override=dict(num_timesteps=32))
    samples = np.asarray(samples)
    data = CheckerboardData(n_rc=2)
    in_support = data.log_prob_support(samples).mean()
    assert in_support > 0.75, f'only {in_support:.2%} of samples in support'


def test_offload_cold_state_config_path(tmp_path):
    """train_cfg.offload_cold_state=True runs the whole config->train path.
    On the CPU test backend the knob must gate itself OFF (XLA:CPU drops
    output memory-space annotations and donation against a pinned_host
    input then hard-aborts) and still train; the actual host placement is
    covered on-TPU by the measured bench runs + the donate=False step
    parity test in test_trainer.py."""
    cfg = small_flow_cfg(tmp_path, total_iters=20)
    cfg.merge_from_dict({'train_cfg': {'offload_cold_state': True},
                         'checkpoint_config.interval': 10})
    cfg.work_dir = str(tmp_path / 'offload')
    state, model = train_model(cfg, seed=0)
    assert int(state.step) == 20
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(state.trainable))


def test_resume_from_checkpoint(trained_flow):
    tmp_path, cfg, state, model = trained_flow
    # a fresh run with the same work_dir must resume from the saved iter 3000
    cfg2 = small_flow_cfg(tmp_path, total_iters=3010)
    cfg2.work_dir = cfg.work_dir
    state2, _ = train_model(cfg2, seed=0)
    assert int(state2.step) == 3010
    # resumed params should be close to where training left off (not re-init)
    w_before = jax.tree.leaves(state.trainable)[0]
    w_after = jax.tree.leaves(state2.trainable)[0]
    assert np.abs(np.asarray(w_before) - np.asarray(w_after)).max() < 1.0


def test_distillation_with_trained_teacher(trained_flow):
    tmp_path, cfg_flow, flow_state, _ = trained_flow
    cfg = Config.fromfile(os.path.join(CFG_DIR, 'checkerboard_arcflow_2nfe.py'))
    ckpt_dir = os.path.join(cfg_flow.work_dir, 'checkpoints',
                            'checkerboard_flow')
    cfg.merge_from_dict({
        'model.teacher_ckpt': ckpt_dir,
        'model.diffusion.denoising.hidden': (128, 128),
        'model.teacher.denoising.hidden': (128, 128),
        'data.train.n_rc': 2,
        'data.train_dataloader.samples_per_gpu': 256,
        'total_iters': 800,
        'train_cfg.num_decay_iters': 300,
        'checkpoint_config.interval': 800,
        'log_config.interval': 400,
    })
    cfg.work_dir = str(tmp_path / 'distill')
    state, model = train_model(cfg, seed=0)
    assert int(state.step) == 800

    samples = model.val_step(state, jax.random.PRNGKey(1),
                             dict(num_samples=1024))
    samples = np.asarray(samples)
    assert np.isfinite(samples).all()
    data = CheckerboardData(n_rc=2)
    in_support = data.log_prob_support(samples).mean()
    # 2-NFE student after a short toy budget: grade gently but require signal
    assert in_support > 0.5, f'only {in_support:.2%} of 2-NFE samples in support'
