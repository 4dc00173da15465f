"""LatentDiffusionTextImage: tied teacher/student distillation on a tiny
ArcFlux — the FLUX-scale wiring at test scale."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arcflow_tpu.models import LatentDiffusionTextImage
from arcflow_tpu.utils.pytree import flatten

TINY_NET = dict(in_channels=16, num_layers=1, num_single_layers=2,
                attention_head_dim=16, num_attention_heads=4,
                joint_attention_dim=32, pooled_projection_dim=16,
                axes_dims_rope=(4, 6, 6), guidance_embeds=True,
                checkpointing=False)


def make_model():
    return LatentDiffusionTextImage(
        diffusion=dict(
            type='ArcFlowImitationDataFree',
            policy_type='ArcFlow',
            denoising=dict(type='ArcFluxTransformer2DModel', patch_size=2,
                           num_gaussians=4, lora_rank=4, **TINY_NET),
            flow_loss=dict(type='DiffusionMSELoss',
                           data_info=dict(pred='u_t_pred', target='u_t'),
                           rescale_cfg=dict(scale=30.0)),
            num_timesteps=1,
            timestep_sampler=dict(type='ContinuousTimeStepSampler', shift=3.2)),
        teacher=dict(
            type='GaussianFlow',
            denoising=dict(type='FluxTransformer2DModel', patch_size=2,
                           **TINY_NET),
            num_timesteps=1),
        tie_teacher=True,
        latent_shape=(8, 8, 4),
        text_embed_dim=32, pooled_dim=16,
        train_cfg=dict(nfe=2, timestep_ratio=1.0, total_substeps=128,
                       num_intermediate_states=2, window_substeps=3,
                       gm_dropout=0.1, num_decay_iters=100,
                       distilled_guidance_scale=3.5,
                       teacher_distilled_guidance_scale=3.5,
                       teacher_guidance_scale=2.0),
        test_cfg=dict(nfe=2, timestep_ratio=1.0, total_substeps=128,
                      distilled_guidance_scale=3.5))


def make_batch(bs=2, s_txt=6):
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    return dict(
        latents=jax.random.normal(ks[0], (bs, 8, 8, 4)),
        prompt_embed_kwargs=dict(
            encoder_hidden_states=jax.random.normal(ks[1], (bs, s_txt, 32)),
            pooled_projections=jax.random.normal(ks[2], (bs, 16))),
        negative_prompt_embed_kwargs=dict(
            encoder_hidden_states=jnp.zeros((bs, s_txt, 32)),
            pooled_projections=jnp.zeros((bs, 16))))


@pytest.fixture(scope='module')
def model_and_params():
    model = make_model()
    trainable, frozen = model.init_params(jax.random.PRNGKey(1))
    return model, trainable, frozen


def test_param_economy(model_and_params):
    model, trainable, frozen = model_and_params
    n_adapter = sum(x.size for x in jax.tree.leaves(trainable))
    n_base = sum(x.size for x in jax.tree.leaves(frozen['base']))
    assert n_adapter < 0.5 * n_base   # adapter is the small side
    # teacher head present and disjoint from base trunk keys
    th = flatten(frozen['teacher_head'])
    assert any(k.startswith('proj_out.') for k in th)
    assert any(k.startswith('norm_out.') for k in th)
    # student tree assembles completely (apply succeeds) and teacher tree has
    # no lora leaves
    t_tree = flatten(model.teacher_params(frozen))
    assert not any('lora' in k for k in t_tree)


def test_loss_and_grads_adapter_only(model_and_params):
    model, trainable, frozen = model_and_params
    batch = make_batch()

    def loss_fn(tr):
        loss, lv = model.loss(tr, frozen, jax.random.PRNGKey(2), batch,
                              running_status=dict(iteration=jnp.asarray(50)))
        return loss, lv

    (loss, log_vars), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        trainable)
    assert np.isfinite(float(loss))
    assert 'loss_diffusion_step0' in log_vars
    assert 'loss_diffusion_step1' in log_vars
    gmax = max(float(jnp.abs(g).max()) for g in jax.tree.leaves(grads))
    assert np.isfinite(gmax) and gmax > 0


def test_train_step_integration(model_and_params):
    model, trainable, frozen = model_and_params
    import optax
    from arcflow_tpu.runner import (EmaConfig, TrainState, build_train_step)
    optimizers = {'diffusion': optax.adamw(1e-4)}
    state = TrainState.create(jax.random.PRNGKey(3), trainable, frozen,
                              optimizers, ema_keys=model.ema_keys)
    step = build_train_step(model, optimizers,
                            train_cfg=dict(diffusion_grad_clip=50.0),
                            ema_cfg=EmaConfig(momentum_policy='karras'),
                            donate=False)
    batch = make_batch()
    state2, logs = step(state, batch)
    assert int(state2.step) == 1
    assert np.isfinite(float(logs['loss']))
    # frozen base untouched
    b0 = jax.tree.leaves(state.frozen)[0]
    b1 = jax.tree.leaves(state2.frozen)[0]
    np.testing.assert_array_equal(np.asarray(b0), np.asarray(b1))


def test_val_step_2nfe(model_and_params):
    model, trainable, frozen = model_and_params
    import optax
    from arcflow_tpu.runner import TrainState
    state = TrainState.create(jax.random.PRNGKey(4), trainable, frozen,
                              {'diffusion': optax.sgd(0.0)},
                              ema_keys=model.ema_keys)
    out = model.val_step(state, jax.random.PRNGKey(5), make_batch())
    latents = np.asarray(out['pred_latents'])
    assert latents.shape == (2, 8, 8, 4)
    assert np.isfinite(latents).all()


def test_frozen_dtype_bf16_trunk_trains():
    """frozen_dtype='bfloat16' stores the shared trunk in bf16 (the
    reference's FSDP MixedPrecision layout) while the adapter stays fp32;
    the distillation loss remains finite and differentiable."""
    import copy
    model = make_model()
    model.frozen_dtype = 'bfloat16'
    trainable, frozen = model.init_params(jax.random.PRNGKey(0))
    f_leaves = [v for v in jax.tree.leaves(frozen)
                if jnp.issubdtype(v.dtype, jnp.floating)]
    assert f_leaves and all(v.dtype == jnp.bfloat16 for v in f_leaves)
    t_leaves = jax.tree.leaves(trainable)
    assert all(v.dtype == jnp.float32 for v in t_leaves)

    batch = make_batch()
    rs = dict(iteration=0)
    loss, _ = model.loss(trainable, frozen, jax.random.PRNGKey(1), batch,
                         running_status=rs)
    assert np.isfinite(float(loss))
    grads = jax.grad(lambda tr: model.loss(
        tr, frozen, jax.random.PRNGKey(1), batch,
        running_status=rs)[0])(trainable)
    gnorm = float(jnp.sqrt(sum(jnp.sum(jnp.square(g))
                               for g in jax.tree.leaves(grads))))
    assert np.isfinite(gnorm) and gnorm > 0
