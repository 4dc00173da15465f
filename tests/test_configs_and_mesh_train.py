"""Shipped configs parse + build; mesh-parallel training through the API."""

import os

import jax
import numpy as np
import pytest

from arcflow_tpu import Config
from arcflow_tpu.apis import build_model_from_cfg, train_model

CFG_ROOT = os.path.join(os.path.dirname(__file__), '..', 'configs')

ALL_CONFIGS = [
    'toy/checkerboard_flow.py',
    'toy/checkerboard_arcflow_2nfe.py',
    'flux/arcflux_2nfe_k16.py',
    'flux/arcflux_2nfe_k16_int8trunk.py',
    'flux/arcflux_2nfe_k16_int4trunk.py',
    'toy/checkerboard_arcflow_2nfe_moe.py',
    'qwen/arcqwen_2nfe_k16.py',
    'qwen/arcqwen_2nfe_k16_int8trunk.py',
    'imagenet/imagenet256_flow.py',
]


@pytest.mark.parametrize('rel', ALL_CONFIGS)
def test_config_parses_and_model_builds(rel):
    cfg = Config.fromfile(os.path.join(CFG_ROOT, rel))
    assert 'model' in cfg and 'total_iters' in cfg
    # building constructs module *definitions* only (no param init) — cheap
    # even for the 12B geometries
    model = build_model_from_cfg(cfg)
    assert model.ema_keys == ('diffusion',)
    assert model.diffusion is not None


def test_flux_config_surface_matches_reference_hparams():
    cfg = Config.fromfile(os.path.join(CFG_ROOT, 'flux/arcflux_2nfe_k16.py'))
    den = cfg.model.diffusion.denoising
    assert den.num_gaussians == 16 and den.num_layers == 19 \
        and den.num_single_layers == 38 and den.lora_rank == 256
    assert cfg.train_cfg.nfe == 2
    assert cfg.train_cfg.num_decay_iters == 2000
    assert cfg.train_cfg.window_substeps == 3
    assert cfg.model.diffusion.flow_loss.rescale_cfg.scale == 30.0
    assert cfg.parallel.mesh.data == 2


def test_mesh_parallel_training_via_api(tmp_path):
    """Full config-driven training on the simulated 8-device mesh."""
    cfg = Config.fromfile(os.path.join(CFG_ROOT, 'toy/checkerboard_flow.py'))
    cfg.merge_from_dict({
        'model.diffusion.denoising.hidden': (64, 64),
        'data.train.n_rc': 2,
        'data.train_dataloader.samples_per_gpu': 64,
        'total_iters': 30,
        'checkpoint_config.interval': 30,
        'log_config.interval': 10,
    })
    cfg.parallel = dict(mesh=dict(data=2, fsdp=-1), min_shard_size=1024)
    cfg.work_dir = str(tmp_path / 'mesh_run')
    state, model = train_model(cfg, seed=0)
    assert int(state.step) == 30
    # params really live sharded on the mesh
    leaves = [x for x in jax.tree.leaves(state.trainable) if x.size >= 1024]
    assert any(len(x.sharding.device_set) > 1 for x in leaves), \
        'no parameter was sharded'

    # checkpoint resume under the mesh: restore into sharded state and
    # continue training
    cfg2 = cfg.copy()
    cfg2.merge_from_dict({'total_iters': 40})
    state2, _ = train_model(cfg2, seed=0)
    assert int(state2.step) == 40
    leaves2 = [x for x in jax.tree.leaves(state2.trainable) if x.size >= 1024]
    assert any(len(x.sharding.device_set) > 1 for x in leaves2)
