"""Pretrained-checkpoint ingestion into the training path.

The flagship workflow — distilling a real FLUX — must be able to start from
converted diffusers weights: ``denoising.pretrained=<dir|index.json>`` loads
the trunk, expands proj_out into the K-way means head with seeded bias noise
(reference arcflux.py:318-357), and shares the trunk between teacher and
student. Verified here with a synthetic diffusers-format sharded checkpoint.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from arcflow_tpu.models import LatentDiffusionTextImage
from arcflow_tpu.models.flux import FluxTransformer2DModel
from arcflow_tpu.pipelines import flax_to_torch_flux, save_adapter_state
from arcflow_tpu.runner import EmaConfig, TrainState, build_train_step
from arcflow_tpu.utils.pytree import flatten, partition_params

TINY = dict(in_channels=16, num_layers=2, num_single_layers=3,
            attention_head_dim=32, num_attention_heads=4,
            joint_attention_dim=64, pooled_projection_dim=32,
            axes_dims_rope=(8, 12, 12), guidance_embeds=True,
            checkpointing=False)
K = 4


def _write_sharded_ckpt(tmp_path):
    """Synthetic diffusers-format FLUX checkpoint: 2 shards + index.json."""
    from safetensors.numpy import save_file
    teacher = FluxTransformer2DModel(patch_size=2, **TINY)
    inputs = dict(hidden_states=jnp.zeros((1, 8, 8, 4)), t=jnp.zeros((1,)),
                  encoder_hidden_states=jnp.zeros((1, 6, 64)),
                  pooled_projections=jnp.zeros((1, 32)),
                  guidance=jnp.zeros((1,)))
    params = teacher.init(jax.random.PRNGKey(0), **inputs)['params']
    torch_state = flax_to_torch_flux(params)
    keys = sorted(torch_state)
    half = len(keys) // 2
    weight_map = {}
    for fname, ks in (('model-00001-of-00002.safetensors', keys[:half]),
                      ('model-00002-of-00002.safetensors', keys[half:])):
        save_file({k: np.ascontiguousarray(torch_state[k]) for k in ks},
                  str(tmp_path / fname))
        weight_map.update({k: fname for k in ks})
    with open(tmp_path / 'model.safetensors.index.json', 'w') as f:
        json.dump({'weight_map': weight_map}, f)
    return teacher, params, inputs


def _model(pretrained, pretrained_adapter=None):
    return LatentDiffusionTextImage(
        diffusion=dict(
            type='ArcFlowImitationDataFree', policy_type='ArcFlow',
            denoising=dict(type='ArcFluxTransformer2DModel', patch_size=2,
                           num_gaussians=K, lora_rank=4,
                           pretrained=pretrained,
                           pretrained_adapter=pretrained_adapter, **TINY),
            flow_loss=dict(type='DiffusionMSELoss',
                           data_info=dict(pred='u_t_pred', target='u_t'),
                           rescale_cfg=dict(scale=30.0)),
            num_timesteps=1,
            timestep_sampler=dict(type='ContinuousTimeStepSampler',
                                  shift=3.2)),
        teacher=dict(type='GaussianFlow',
                     denoising=dict(type='FluxTransformer2DModel',
                                    patch_size=2, **TINY),
                     num_timesteps=1),
        tie_teacher=True,
        latent_shape=(8, 8, 4), text_embed_dim=64, pooled_dim=32,
        train_cfg=dict(nfe=2, timestep_ratio=1.0, total_substeps=128,
                       num_intermediate_states=2, window_substeps=3,
                       gm_dropout=0.1, num_decay_iters=100,
                       distilled_guidance_scale=3.5,
                       teacher_distilled_guidance_scale=3.5,
                       teacher_guidance_scale=2.0,
                       diffusion_grad_clip=50.0),
        test_cfg=dict(nfe=2, timestep_ratio=1.0))


def test_pretrained_init_loads_trunk_and_expands_head(tmp_path):
    teacher, t_params, _ = _write_sharded_ckpt(tmp_path)
    model = _model(str(tmp_path))
    trainable, frozen = model.init_params(jax.random.PRNGKey(1))

    t_flat = flatten(t_params)
    base_flat = flatten(frozen['base'])
    # trunk weights come from the checkpoint
    for key in ('joint_blocks.attn.img_q.kernel',
                'single_blocks.proj_mlp.kernel',
                'x_embedder.kernel', 'time_text_embed.text_embedder.'
                'linear1.kernel', 'context_embedder.bias'):
        np.testing.assert_allclose(np.asarray(base_flat[key]),
                                   np.asarray(t_flat[key]), rtol=1e-6,
                                   err_msg=key)
    # teacher head is the checkpoint's proj_out / norm_out
    head_flat = flatten(frozen['teacher_head'])
    np.testing.assert_allclose(np.asarray(head_flat['proj_out.kernel']),
                               np.asarray(t_flat['proj_out.kernel']),
                               rtol=1e-6)
    # student means head = teacher proj_out tiled K ways
    ad_flat = flatten(trainable['diffusion'])
    kern = np.asarray(ad_flat['proj_out_means.kernel'])
    d, out = np.asarray(t_flat['proj_out.kernel']).shape
    for i in range(K):
        np.testing.assert_allclose(kern.reshape(d, K, out)[:, i],
                                   np.asarray(t_flat['proj_out.kernel']),
                                   rtol=1e-6)


def test_student_one_step_matches_teacher_at_init(tmp_path):
    """At init each mixture component's mean velocity equals the teacher's u
    up to the per-(K, channel) seeded bias noise — i.e. constant over batch
    and space, and small (scale 0.05)."""
    teacher, t_params, _ = _write_sharded_ckpt(tmp_path)
    model = _model(str(tmp_path))
    trainable, frozen = model.init_params(jax.random.PRNGKey(1))
    params = model.student_params(trainable, frozen)

    rng = jax.random.PRNGKey(2)
    ks = jax.random.split(rng, 3)
    x = jax.random.normal(ks[0], (2, 8, 8, 4))
    kwargs = dict(
        encoder_hidden_states=jax.random.normal(ks[1], (2, 6, 64)),
        pooled_projections=jax.random.normal(ks[2], (2, 32)),
        guidance=jnp.full((2,), 3.5))
    t = jnp.full((2,), 0.9)
    out = model.diffusion.denoising.apply({'params': params}, x, t, **kwargs)
    u = teacher.apply({'params': model.teacher_params(frozen)}, x, t,
                      **kwargs)

    means = np.asarray(out['means'], np.float32)       # (B, K, H, W, C)
    u = np.asarray(u, np.float32)[:, None]             # (B, 1, H, W, C)
    diff = means - u
    # constant across batch and space per (k, c)
    assert np.abs(diff - diff.mean(axis=(0, 2, 3), keepdims=True)).max() \
        < 5e-2
    # small (0.05-scale noise), but nonzero and distinct across components
    assert np.abs(diff).max() < 0.5
    per_kc = diff.mean(axis=(0, 2, 3))                 # (K, C)
    assert np.abs(per_kc[0] - per_kc[1]).max() > 1e-4


def test_train_step_from_pretrained_runs(tmp_path):
    _write_sharded_ckpt(tmp_path)
    model = _model(str(tmp_path))
    trainable, frozen = model.init_params(jax.random.PRNGKey(1))
    optimizers = {'diffusion': optax.adamw(1e-4)}
    state = TrainState.create(jax.random.PRNGKey(2), trainable, frozen,
                              optimizers, ema_keys=model.ema_keys)
    bs = 2
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    batch = dict(
        latents=jax.random.normal(ks[0], (bs, 8, 8, 4)),
        prompt_embed_kwargs=dict(
            encoder_hidden_states=jax.random.normal(ks[1], (bs, 6, 64)),
            pooled_projections=jax.random.normal(ks[2], (bs, 32))),
        negative_prompt_embed_kwargs=dict(
            encoder_hidden_states=jnp.zeros((bs, 6, 64)),
            pooled_projections=jnp.zeros((bs, 32))))
    train_step = build_train_step(model, optimizers,
                                  train_cfg=model.train_cfg,
                                  ema_cfg=EmaConfig(momentum_policy='karras'),
                                  donate=False)
    state, logs = train_step(state, batch)
    assert np.isfinite(float(logs['loss']))


def test_pretrained_adapter_fuses_into_base(tmp_path):
    """pretrained_adapter: loaded LoRA deltas fold into the base kernels;
    the new student re-attaches fresh LoRA (reference arcflux.py:342-355)."""
    _, t_params, _ = _write_sharded_ckpt(tmp_path)

    # fabricate a trained adapter with nonzero lora on top of the ckpt
    donor = _model(str(tmp_path))
    d_trainable, d_frozen = donor.init_params(jax.random.PRNGKey(5))
    ad = flatten(d_trainable['diffusion'])
    rng = jax.random.PRNGKey(6)
    for k in list(ad):
        if k.endswith(('.lora_a', '.lora_b')):
            rng, sub = jax.random.split(rng)
            ad[k] = 0.01 * jax.random.normal(sub, ad[k].shape)
    from arcflow_tpu.utils.pytree import unflatten
    adapter_tree = unflatten(ad)
    path = str(tmp_path / 'adapter.safetensors')
    save_adapter_state(path, adapter_tree,
                       policy_config=dict(policy_type='ArcFlow'))

    model = _model(str(tmp_path), pretrained_adapter=path)
    trainable, frozen = model.init_params(jax.random.PRNGKey(7))
    base_flat = flatten(frozen['base'])
    t_flat = flatten(t_params)

    key = 'joint_blocks.ff_img.in_proj'
    a = np.asarray(ad[f'{key}.lora_a'])            # (L, in, r)
    b = np.asarray(ad[f'{key}.lora_b'])            # (L, r, out)
    want = np.asarray(t_flat[f'{key}.kernel']) + np.einsum('lir,lro->lio',
                                                           a, b)
    np.testing.assert_allclose(np.asarray(base_flat[f'{key}.kernel']), want,
                               rtol=1e-4, atol=1e-6)
    # fresh student lora re-attached: b zeros, a present
    new_ad = flatten(trainable['diffusion'])
    assert np.all(np.asarray(new_ad[f'{key}.lora_b']) == 0)
    assert np.asarray(new_ad[f'{key}.lora_a']).shape == a.shape


def test_teacher_multi_lora_fuse_shared_trunk(tmp_path):
    """teacher.denoising.pretrained_lora=[a, b] with per-adapter scales fuse
    into the shared trunk in order (reference diffusers/flux.py:57-68)."""
    _, t_params, _ = _write_sharded_ckpt(tmp_path)

    # fabricate two lora adapters over the same target modules
    donor = _model(str(tmp_path))
    d_trainable, _ = donor.init_params(jax.random.PRNGKey(11))
    from arcflow_tpu.utils.pytree import unflatten
    paths, loras = [], []
    for j in range(2):
        ad = flatten(d_trainable['diffusion'])
        rng = jax.random.PRNGKey(20 + j)
        lora = {}
        for k in list(ad):
            if k.endswith(('.lora_a', '.lora_b')):
                rng, sub = jax.random.split(rng)
                lora[k] = 0.01 * jax.random.normal(sub, ad[k].shape)
        path = str(tmp_path / f'lora{j}.safetensors')
        save_adapter_state(path, unflatten(lora))
        paths.append(path)
        loras.append(lora)

    model = _model(str(tmp_path))
    model.teacher_pretrained_lora = paths
    model.teacher_pretrained_lora_scale = [1.0, 0.5]
    trainable, frozen = model.init_params(jax.random.PRNGKey(12))

    key = 'joint_blocks.ff_img.in_proj'
    base = np.asarray(flatten(t_params)[f'{key}.kernel'])
    want = base.copy()
    for lora, scale in zip(loras, (1.0, 0.5)):
        a = np.asarray(lora[f'{key}.lora_a'])
        b = np.asarray(lora[f'{key}.lora_b'])
        want = want + scale * np.einsum('lir,lro->lio', a, b)
    got = np.asarray(flatten(frozen['base'])[f'{key}.kernel'])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)
