"""init_model (config-driven eval handle) + the export CLI end-to-end."""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax

from arcflow_tpu import Config
from arcflow_tpu.apis import build_model_from_cfg
from arcflow_tpu.apis.inference import init_model
from arcflow_tpu.runner import CheckpointManager, TrainState

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = os.path.join(REPO, 'configs', 'toy', 'checkerboard_flow.py')


def _save_toy_ckpt(tmp_path, step=7):
    cfg = Config.fromfile(CFG)
    model = build_model_from_cfg(cfg)
    trainable, frozen = model.init_params(jax.random.PRNGKey(0))
    opt = {'diffusion': optax.adamw(1e-4)}
    state = TrainState.create(jax.random.PRNGKey(1), trainable, frozen, opt,
                              ema_keys=model.ema_keys)
    state = state.replace(step=jnp.asarray(step, jnp.int32))
    mgr = CheckpointManager(str(tmp_path / 'ck'), interval=1)
    assert mgr.save(state)
    mgr.close()
    return cfg, state


def test_init_model_restores_ema_for_eval(tmp_path):
    cfg, state = _save_toy_ckpt(tmp_path)
    model, eval_state = init_model(cfg, checkpoint=str(tmp_path / 'ck'),
                                   ema_only=True)
    # eval params == the checkpoint's EMA tree
    want = jax.tree.leaves(state.ema)[0]
    got = jax.tree.leaves(eval_state.trainable)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)
    assert eval_state.ema is None              # reference deletes non-EMA
    out = model.val_step(eval_state, jax.random.PRNGKey(2),
                         dict(num_samples=64),
                         test_cfg_override=dict(num_timesteps=4))
    assert np.isfinite(np.asarray(out)).all()


def test_export_cli_roundtrip(tmp_path):
    """export_arcflow_to_diffusers.py on a trained-state checkpoint produces
    a loadable adapter folder with policy_config metadata."""
    from arcflow_tpu.models import (ARCFLUX_ADAPTER_KEYS,
                                    ArcFluxTransformer2DModel)
    from arcflow_tpu.pipelines import load_adapter_state
    from arcflow_tpu.utils.pytree import flatten, partition_params

    tiny = dict(in_channels=16, num_layers=2, num_single_layers=3,
                attention_head_dim=32, num_attention_heads=4,
                joint_attention_dim=64, pooled_projection_dim=32,
                axes_dims_rope=(8, 12, 12), guidance_embeds=True,
                checkpointing=False)
    student = ArcFluxTransformer2DModel(num_gaussians=4, patch_size=2,
                                        lora_rank=4, **tiny)
    inputs = dict(hidden_states=jnp.zeros((1, 8, 8, 4)), t=jnp.zeros((1,)),
                  encoder_hidden_states=jnp.zeros((1, 6, 64)),
                  pooled_projections=jnp.zeros((1, 32)),
                  guidance=jnp.zeros((1,)))
    params = student.init(jax.random.PRNGKey(3), **inputs)['params']
    adapter, _ = partition_params(params, ARCFLUX_ADAPTER_KEYS)

    opt = {'diffusion': optax.adamw(1e-4)}
    state = TrainState.create(jax.random.PRNGKey(4),
                              {'diffusion': adapter}, {}, opt,
                              ema_keys=('diffusion',))
    state = state.replace(step=jnp.asarray(5, jnp.int32))
    mgr = CheckpointManager(str(tmp_path / 'ck'), interval=1)
    assert mgr.save(state)
    mgr.close()

    # a minimal config naming the Arc class (pretrained keys must be
    # stripped from the exported config.json)
    cfg_py = tmp_path / 'cfg.py'
    cfg_py.write_text(
        'model = dict(type="LatentDiffusionTextImage", diffusion=dict(\n'
        '    type="ArcFlowImitationDataFree", policy_type="ArcFlow",\n'
        '    denoising=dict(type="ArcFluxTransformer2DModel", patch_size=2,\n'
        f'                   num_gaussians=4, lora_rank=4,\n'
        f'                   pretrained="/nonexistent", **{tiny!r})))\n'
        'test_cfg = dict(nfe=2, timestep_ratio=1.0, total_substeps=128)\n')
    out_dir = tmp_path / 'exported'
    # --platform cpu: export is pure checkpoint IO; without it the
    # subprocess waits on the tunneled TPU grant (can exceed 10 min when
    # the tunnel is re-arming — see CLAUDE.md env gotchas)
    r = subprocess.run(
        [sys.executable, 'export_arcflow_to_diffusers.py', str(cfg_py),
         str(tmp_path / 'ck'), str(out_dir), '--platform', 'cpu'],
        cwd=REPO, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]

    meta = json.load(open(out_dir / 'config.json'))
    assert meta['_class_name'] == 'ArcFluxTransformer2DModel'
    assert 'pretrained' not in meta

    tree, policy = load_adapter_state(
        str(out_dir / 'diffusion_pytorch_model.safetensors'))
    assert policy['nfe'] == 2 and policy['num_gaussians'] == 4
    a_flat, t_flat = flatten(state.ema['diffusion']), flatten(tree)
    assert set(a_flat) == set(t_flat)
    for k in a_flat:
        np.testing.assert_allclose(np.asarray(a_flat[k]),
                                   np.asarray(t_flat[k]), rtol=1e-6,
                                   err_msg=k)
