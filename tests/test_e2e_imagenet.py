"""ImageNet-path e2e slice: cached-latent flow pretraining -> ArcFlow 2-NFE
distillation, with a quantitative bar (the class-image analogue of the
checkerboard suite; BASELINE.json config 1).

The synthetic dataset puts class k's latents at a distinct mean mu_k; the
quantitative oracle is whether (a) per-class sample means recover mu_k and
(b) each class's sample mean is nearest to its own mu (100% separation).
"""

import os

import jax
import numpy as np
import pytest

from arcflow_tpu import Config
from arcflow_tpu.apis import train_model

CFG_DIR = os.path.join(os.path.dirname(__file__), '..', 'configs', 'imagenet')

N_CLASSES = 4
LAT = (8, 8, 4)


def _class_means():
    rng = np.random.default_rng(1234)
    # well-separated smooth patterns per class
    return rng.standard_normal((N_CLASSES, *LAT)).astype(np.float32) * 1.5


def _write_latents(root, n_per_class=192, sigma=0.25):
    mus = _class_means()
    rng = np.random.default_rng(0)
    os.makedirs(root, exist_ok=True)
    for i in range(N_CLASSES * n_per_class):
        y = i % N_CLASSES
        x = mus[y] + sigma * rng.standard_normal(LAT).astype(np.float32)
        np.savez(os.path.join(root, f'{i:05d}.npz'),
                 x=x.transpose(2, 0, 1), y=y)   # reader expects CHW
    return mus


def _tiny_overrides():
    return {
        'model.num_classes': N_CLASSES,
        'model.latent_shape': LAT,
        'model.diffusion.denoising.base_channels': 32,
        'model.diffusion.denoising.channel_mult': (1, 2),
        'model.diffusion.denoising.num_res_blocks': 1,
        'model.diffusion.denoising.attn_resolutions': (4,),
        'model.diffusion.denoising.num_classes': N_CLASSES,
        'model.diffusion.denoising.num_heads': 4,
        'data.train_dataloader.samples_per_gpu': 64,
        'log_config.interval': 500,
    }


def _sample_class_means(model, state, n=128, **val_kw):
    labels = np.arange(N_CLASSES).repeat(n // N_CLASSES)
    out = model.val_step(state, jax.random.PRNGKey(9),
                         dict(label=labels), **val_kw)
    lat = np.asarray(out['pred_latents'], np.float32)
    return np.stack([lat[labels == y].mean(0) for y in range(N_CLASSES)])


def _check_class_recovery(sample_means, mus, max_rel_err):
    rel = np.linalg.norm((sample_means - mus).reshape(N_CLASSES, -1),
                         axis=1) / np.linalg.norm(
        mus.reshape(N_CLASSES, -1), axis=1)
    # each class's sample mean must be nearest its own mu
    d = np.linalg.norm(sample_means.reshape(N_CLASSES, 1, -1)
                       - mus.reshape(1, N_CLASSES, -1), axis=-1)
    assert (d.argmin(axis=1) == np.arange(N_CLASSES)).all(), d
    assert rel.max() < max_rel_err, rel


@pytest.fixture(scope='module')
def trained_imagenet_flow(tmp_path_factory):
    tmp = tmp_path_factory.mktemp('imagenet_e2e')
    mus = _write_latents(str(tmp / 'latents'))
    cfg = Config.fromfile(os.path.join(CFG_DIR, 'imagenet256_flow.py'))
    cfg.merge_from_dict(dict(_tiny_overrides(),
                             **{'data.train.latents_dir': str(tmp / 'latents'),
                                'total_iters': 1200,
                                'checkpoint_config.interval': 1200}))
    cfg.work_dir = str(tmp / 'flow')
    state, model = train_model(cfg, seed=0)
    return tmp, cfg, state, model, mus


@pytest.mark.slow
def test_imagenet_flow_recovers_class_means(trained_imagenet_flow):
    tmp, cfg, state, model, mus = trained_imagenet_flow
    assert int(state.step) == 1200
    means = _sample_class_means(
        model, state, test_cfg_override=dict(num_timesteps=32))
    _check_class_recovery(means, mus, max_rel_err=0.45)


@pytest.mark.slow
def test_imagenet_arcflow_distillation_2nfe(trained_imagenet_flow):
    tmp, cfg_flow, flow_state, _, mus = trained_imagenet_flow
    cfg = Config.fromfile(os.path.join(CFG_DIR,
                                       'imagenet256_arcflow_2nfe.py'))
    ckpt = os.path.join(cfg_flow.work_dir, 'checkpoints', 'imagenet256_flow')
    cfg.merge_from_dict(dict(
        _tiny_overrides(),
        **{'model.teacher_ckpt': ckpt,
           'model.teacher.denoising.base_channels': 32,
           'model.teacher.denoising.channel_mult': (1, 2),
           'model.teacher.denoising.num_res_blocks': 1,
           'model.teacher.denoising.attn_resolutions': (4,),
           'model.teacher.denoising.num_classes': N_CLASSES,
           'model.teacher.denoising.num_heads': 4,
           'model.diffusion.denoising.num_gaussians': 4,
           'data.train.latents_dir': str(tmp / 'latents'),
           'train_cfg.num_decay_iters': 200,
           'train_cfg.num_intermediate_states': 2,
           'train_cfg.teacher_guidance_scale': 1.0,
           'total_iters': 500,
           'checkpoint_config.interval': 500}))
    cfg.work_dir = str(tmp / 'distill')
    state, model = train_model(cfg, seed=0)
    assert int(state.step) == 500

    # the 2-NFE student must reproduce the class structure the 32-step
    # teacher learned — a quantitative distillation-quality bar
    means = _sample_class_means(model, state)
    _check_class_recovery(means, mus, max_rel_err=0.6)
