"""Quantitative eval metrics (latent Fréchet distance) + EvalHook logging."""

import logging
import os

import jax
import numpy as np

from arcflow_tpu.utils.metrics import (frechet_distance,
                                       latent_frechet_distance)


def test_frechet_distance_properties():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((2048, 8))
    b = rng.standard_normal((2048, 8))
    same = frechet_distance(a, b)
    shifted = frechet_distance(a, b + 2.0)
    scaled = frechet_distance(a, b * 3.0)
    assert same < 0.05, same
    assert shifted > 8 * 0.9 * 4, shifted        # ~ |mu diff|^2 = 8*4
    assert scaled > same + 1.0
    # ordering: small shift < big shift
    assert frechet_distance(a, b + 0.5) < shifted


def test_latent_frechet_distance_detects_distribution_gap():
    rng = np.random.default_rng(1)
    ref = rng.standard_normal((256, 8, 8, 4)).astype(np.float32)
    good = rng.standard_normal((256, 8, 8, 4)).astype(np.float32)
    bad = 0.3 * rng.standard_normal((256, 8, 8, 4)).astype(np.float32) + 1.0
    assert latent_frechet_distance(good, ref) < \
        latent_frechet_distance(bad, ref)


def test_eval_hook_logs_latent_fd(tmp_path):
    from arcflow_tpu.runner.hooks import EvalHook

    rng = np.random.default_rng(2)
    ref = rng.standard_normal((64, 4, 4, 2)).astype(np.float32)

    class Model:
        def val_step(self, state, key, batch, **kw):
            return dict(pred_latents=rng.standard_normal(
                (64, 4, 4, 2)).astype(np.float32))

    class Runner:
        iter = 100
        model = Model()
        state = None
        work_dir = str(tmp_path)
        log_buffer = {}
        logger = logging.getLogger('test')

    hook = EvalHook(interval=100, batch=dict(latents=ref))
    hook.after_train_iter(Runner())
    assert 'eval_latent_fd' in Runner.log_buffer
    assert np.isfinite(Runner.log_buffer['eval_latent_fd'])
    assert os.path.exists(os.path.join(str(tmp_path), 'eval',
                                       'iter_100.npz'))
