"""ArcQwen/Qwen architecture: shapes, mask handling, teacher/student sharing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arcflow_tpu.models import (ARCQWEN_ADAPTER_KEYS,
                                ArcQwenImageTransformer2DModel,
                                QwenImageTransformer2DModel)
from arcflow_tpu.utils.pytree import drop_params, flatten, merge_params, \
    partition_params

TINY = dict(in_channels=16, num_layers=2, attention_head_dim=32,
            num_attention_heads=4, joint_attention_dim=48,
            axes_dims_rope=(8, 12, 12), checkpointing=False,
            max_text_len=8)


def tiny_inputs(b=2, h=8, w=8, c=4, s_txt=6):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    mask = jnp.ones((b, s_txt), jnp.int32).at[:, 4:].set(0)
    return dict(
        hidden_states=jax.random.normal(ks[0], (b, h, w, c)),
        t=jnp.full((b,), 0.7),
        encoder_hidden_states=jax.random.normal(ks[1], (b, s_txt, 48)),
        encoder_hidden_states_mask=mask)


@pytest.fixture(scope='module')
def arcqwen():
    model = ArcQwenImageTransformer2DModel(num_gaussians=4, patch_size=2,
                                           **TINY)
    inputs = tiny_inputs()
    params = model.init(jax.random.PRNGKey(1), **inputs)['params']
    return model, params, inputs


def test_arcqwen_output_shapes(arcqwen):
    model, params, inputs = arcqwen
    out = model.apply({'params': params}, **inputs)
    b, h, w, c = inputs['hidden_states'].shape
    assert out['means'].shape == (b, 4, h, w, c)
    assert out['logweights'].shape == (b, 4, h, w, 1)
    assert out['loggammas'].shape == (b, 3, h, w, 1)
    w_sum = np.exp(np.asarray(out['logweights'])).sum(axis=1)
    np.testing.assert_allclose(w_sum, 1.0, rtol=1e-4)


def test_text_mask_changes_nothing_for_padded_tokens():
    """Padded text token *values* must not affect the output when masked.

    Uses the teacher (its proj_out has a non-zero kernel; the ArcFlow heads
    are zero-kernel at init, which would make this check vacuous).
    """
    model = QwenImageTransformer2DModel(patch_size=2, **TINY)
    inputs = tiny_inputs()
    params = model.init(jax.random.PRNGKey(7), **inputs)['params']
    # AdaLN-zero gates make blocks identity at init (txt can't influence img
    # yet) — jitter all params so information actually flows
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(8), len(leaves))
    params = jax.tree.unflatten(treedef, [
        l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, keys)])
    out1 = model.apply({'params': params}, **inputs)
    ehs = inputs['encoder_hidden_states']
    perturbed = dict(inputs)
    perturbed['encoder_hidden_states'] = ehs.at[:, 4:].set(
        ehs[:, 4:] + 100.0)   # only padded positions change
    out2 = model.apply({'params': params}, **perturbed)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-4)
    # sanity: changing a *visible* token does change the output
    perturbed2 = dict(inputs)
    perturbed2['encoder_hidden_states'] = ehs.at[:, 0].set(ehs[:, 0] + 10.0)
    out3 = model.apply({'params': params}, **perturbed2)
    assert np.abs(np.asarray(out1 - out3)).max() > 1e-4


def test_text_truncation():
    model = ArcQwenImageTransformer2DModel(num_gaussians=4, patch_size=2,
                                           **TINY)
    inputs = tiny_inputs(s_txt=12)   # > max_text_len=8 -> truncated
    params = model.init(jax.random.PRNGKey(2), **inputs)['params']
    out = model.apply({'params': params}, **inputs)
    assert np.isfinite(np.asarray(out['means'])).all()


def test_teacher_student_base_compatibility():
    teacher = QwenImageTransformer2DModel(patch_size=2, **TINY)
    student = ArcQwenImageTransformer2DModel(num_gaussians=4, patch_size=2,
                                             lora_rank=4, **TINY)
    inputs = tiny_inputs()
    t_params = teacher.init(jax.random.PRNGKey(3), **inputs)['params']
    s_params = student.init(jax.random.PRNGKey(4), **inputs)['params']
    t_flat = flatten(drop_params(t_params, ['proj_out', 'norm_out'],
                                 exact_prefix=True))
    s_flat = flatten(s_params)
    missing = [k for k in t_flat if k not in s_flat]
    assert not missing, missing[:5]
    adapter, base = partition_params(s_params, ARCQWEN_ADAPTER_KEYS)
    merged = merge_params(drop_params(t_params, ['proj_out', 'norm_out'],
                                      exact_prefix=True), adapter)
    out = student.apply({'params': merged}, **inputs)
    assert np.isfinite(np.asarray(out['means'])).all()


def test_qwen_convert_roundtrip_and_pretrained_init(tmp_path):
    """Qwen family: flax -> torch naming -> flax identity, and
    denoising.pretrained= loads the converted checkpoint into the shared
    trunk of a tied teacher/student distillation model."""
    import os
    from safetensors.numpy import save_file
    from arcflow_tpu.models import LatentDiffusionTextImage
    from arcflow_tpu.pipelines import (flax_to_torch_flux, graft_pretrained,
                                       torch_flux_to_flax)

    teacher = QwenImageTransformer2DModel(patch_size=2, **TINY)
    inputs = tiny_inputs()
    t_params = teacher.init(jax.random.PRNGKey(5), **inputs)['params']
    torch_state = flax_to_torch_flux(t_params, family='qwen')
    assert all(not k.startswith('transformer_blocks_') for k in torch_state)
    tree, unused = torch_flux_to_flax(torch_state, num_layers=2,
                                      family='qwen')
    assert not unused, sorted(unused)[:5]
    merged, missing, unexpected = graft_pretrained(t_params, tree)
    assert not missing and not unexpected, (missing[:5], unexpected[:5])
    out_ref = teacher.apply({'params': t_params}, **inputs)
    out_conv = teacher.apply({'params': merged}, **inputs)
    np.testing.assert_allclose(np.asarray(out_conv), np.asarray(out_ref),
                               atol=1e-5)

    path = str(tmp_path / 'qwen.safetensors')
    save_file({k: np.ascontiguousarray(v) for k, v in torch_state.items()},
              path)
    model = LatentDiffusionTextImage(
        diffusion=dict(
            type='ArcFlowImitationDataFree', policy_type='ArcFlow',
            denoising=dict(type='ArcQwenImageTransformer2DModel',
                           patch_size=2, num_gaussians=4, lora_rank=4,
                           pretrained=path, **TINY),
            flow_loss=dict(type='DiffusionMSELoss',
                           data_info=dict(pred='u_t_pred', target='u_t'),
                           rescale_cfg=dict(scale=30.0)),
            num_timesteps=1,
            timestep_sampler=dict(type='ContinuousTimeStepSampler',
                                  shift=3.2)),
        teacher=dict(type='GaussianFlow',
                     denoising=dict(type='QwenImageTransformer2DModel',
                                    patch_size=2, **TINY),
                     num_timesteps=1),
        tie_teacher=True, latent_shape=(8, 8, 4), text_embed_dim=48,
        pooled_dim=8,
        train_cfg=dict(nfe=2, timestep_ratio=1.0, total_substeps=128,
                       num_intermediate_states=2, window_substeps=3,
                       gm_dropout=0.1, num_decay_iters=100,
                       teacher_guidance_scale=1.0),
        test_cfg=dict(nfe=2, timestep_ratio=1.0))
    assert model._family == 'qwen'
    trainable, frozen = model.init_params(jax.random.PRNGKey(6))
    base_flat = flatten(frozen['base'])
    t_flat = flatten(t_params)
    for key in ('transformer_blocks.attn.img_q.kernel', 'img_in.kernel',
                'txt_in.kernel'):
        np.testing.assert_allclose(np.asarray(base_flat[key]),
                                   np.asarray(t_flat[key]), rtol=1e-6,
                                   err_msg=key)
    # means head tiled from the teacher's proj_out
    ad_flat = flatten(trainable['diffusion'])
    kern = np.asarray(ad_flat['proj_out_means.kernel'])
    d, out = np.asarray(t_flat['proj_out.kernel']).shape
    np.testing.assert_allclose(kern.reshape(d, 4, out)[:, 2],
                               np.asarray(t_flat['proj_out.kernel']),
                               rtol=1e-6)


def test_qwen_distillation_train_step_with_masks():
    """One full jitted distillation optimizer step on the Qwen family with
    per-sample ragged text masks flowing through the teacher-CFG path (the
    negative prompt carries its own mask) — the exact composition
    ``bench.py --train --qwen`` measures on the real chip. Mirrors the
    reference's Qwen training entry (configs/qwen/arcqwen_2nfe_k16.py;
    reference arcqwen.py consumes encoder_hidden_states_mask per sample)."""
    import optax
    from arcflow_tpu.models import LatentDiffusionTextImage
    from arcflow_tpu.runner import EmaConfig, TrainState, build_train_step

    model = LatentDiffusionTextImage(
        diffusion=dict(
            type='ArcFlowImitationDataFree', policy_type='ArcFlow',
            denoising=dict(type='ArcQwenImageTransformer2DModel',
                           patch_size=2, num_gaussians=4, lora_rank=4,
                           **TINY),
            flow_loss=dict(type='DiffusionMSELoss',
                           data_info=dict(pred='u_t_pred', target='u_t'),
                           rescale_cfg=dict(scale=30.0)),
            num_timesteps=1,
            timestep_sampler=dict(type='ContinuousTimeStepSampler',
                                  shift=3.1)),
        teacher=dict(type='GaussianFlow',
                     denoising=dict(type='QwenImageTransformer2DModel',
                                    patch_size=2, **TINY),
                     num_timesteps=1),
        tie_teacher=True, latent_shape=(8, 8, 4), text_embed_dim=48,
        pooled_dim=8,
        train_cfg=dict(nfe=2, timestep_ratio=1.0, total_substeps=128,
                       num_intermediate_states=2, window_substeps=3,
                       gm_dropout=0.1, num_decay_iters=100,
                       teacher_guidance_scale=2.0,
                       diffusion_grad_clip=50.0),
        test_cfg=dict(nfe=2, timestep_ratio=1.0))
    assert model._family == 'qwen'
    trainable, frozen = model.init_params(jax.random.PRNGKey(0))
    optimizers = {'diffusion': optax.adamw(1e-4)}
    state = TrainState.create(jax.random.PRNGKey(1), trainable, frozen,
                              optimizers, ema_keys=model.ema_keys)
    step = build_train_step(model, optimizers, train_cfg=model.train_cfg,
                            ema_cfg=EmaConfig(momentum_policy='karras'),
                            donate=False)
    b, s_txt = 2, 6
    ks = jax.random.split(jax.random.PRNGKey(2), 2)
    # ragged batch: sample 0 pads the last two tokens, sample 1 none
    mask = jnp.ones((b, s_txt), jnp.int32).at[0, 4:].set(0)
    batch = dict(
        latents=jax.random.normal(ks[0], (b, 8, 8, 4)),
        prompt_embed_kwargs=dict(
            encoder_hidden_states=jax.random.normal(ks[1], (b, s_txt, 48)),
            encoder_hidden_states_mask=mask),
        negative_prompt_embed_kwargs=dict(
            encoder_hidden_states=jnp.zeros((b, s_txt, 48)),
            encoder_hidden_states_mask=jnp.ones((b, s_txt), jnp.int32)))
    state2, logs = step(state, batch)
    assert int(state2.step) == 1
    assert np.isfinite(float(logs['loss']))
    # frozen trunk untouched by the optimizer step
    b0, b1 = jax.tree.leaves(state.frozen)[0], jax.tree.leaves(
        state2.frozen)[0]
    np.testing.assert_array_equal(np.asarray(b0), np.asarray(b1))
