"""SPMD program-efficiency audits (VERDICT round-2 item 1d).

Two guarantees about the multi-chip training program:
  * the compile emits NO "Involuntary full rematerialization" warnings
    (each one is a replicate-then-repartition — wasted all-gathers on the
    hot path);
  * total all-gather traffic in one train step stays bounded by a small
    multiple of the parameter bytes (the FSDP unshard cost: forward +
    backward re-gather, nothing else).
"""

import os
import subprocess
import sys

import jax
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


@pytest.mark.slow
def test_multichip_compile_is_warning_free():
    """Fresh-process dryrun (train + sharded inference) must not emit
    spmd_partitioner involuntary-rematerialization warnings."""
    env = {k: v for k, v in os.environ.items()
           if k not in ('XLA_FLAGS', 'JAX_PLATFORMS', 'JAX_NUM_CPU_DEVICES')}
    r = subprocess.run(
        [sys.executable, '-c',
         'import __graft_entry__ as g; g.dryrun_multichip(8)'],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, f'stdout={r.stdout}\nstderr={r.stderr}'
    assert 'train OK' in r.stdout and 'inference OK' in r.stdout
    bad = [ln for ln in r.stderr.splitlines()
           if 'Involuntary full rematerialization' in ln]
    assert not bad, ('SPMD partitioner fell back to full remat '
                     f'({len(bad)} ops):\n' + '\n'.join(bad[:5]))


def test_train_step_all_gather_bytes_bounded():
    """AOT-compile the tiny distillation step over an all-axes mesh and
    bound its all-gather bytes against the parameter bytes."""
    import __graft_entry__ as g
    import optax
    from arcflow_tpu.parallel import (audit_compiled, batch_axes,
                                      set_activation_sharding, shard_batch,
                                      shard_state, tree_bytes)
    from arcflow_tpu.runner import EmaConfig, TrainState, build_train_step
    import jax.numpy as jnp

    mesh = g._make_dryrun_mesh(8, jax.devices()[:8])
    set_activation_sharding(mesh)
    try:
        model = g._build_tiny_model()
        trainable, frozen = model.init_params(jax.random.PRNGKey(0))
        optimizers = {'diffusion': optax.adamw(1e-4)}
        state = TrainState.create(jax.random.PRNGKey(1), trainable, frozen,
                                  optimizers, ema_keys=model.ema_keys)
        state, _ = shard_state(state, mesh, fsdp_axis='fsdp',
                               tensor_axis='tensor', min_size=1024)
        bs = 2 * int(np.prod([mesh.shape[a] for a in batch_axes(mesh)]))
        ks = jax.random.split(jax.random.PRNGKey(2), 3)
        batch = dict(
            latents=jax.random.normal(ks[0], (bs, 8, 8, 64)),
            prompt_embed_kwargs=dict(
                encoder_hidden_states=jax.random.normal(ks[1], (bs, 8, 64)),
                pooled_projections=jax.random.normal(ks[2], (bs, 32))),
            negative_prompt_embed_kwargs=dict(
                encoder_hidden_states=jnp.zeros((bs, 8, 64)),
                pooled_projections=jnp.zeros((bs, 32))))
        batch = shard_batch(batch, mesh, axis='data')
        train_step = build_train_step(
            model, optimizers, train_cfg=model.train_cfg,
            ema_cfg=EmaConfig(momentum_policy='karras'), donate=False)
        compiled = train_step.lower(state, batch).compile()
    finally:
        from arcflow_tpu.parallel import clear_activation_sharding
        clear_activation_sharding()

    stats = audit_compiled(compiled)['collectives']
    param_bytes = tree_bytes(state.trainable) + tree_bytes(state.frozen)
    ag = stats['all-gather']
    assert ag['count'] > 0, 'FSDP program must all-gather sharded params'
    # Per NFE step the trunk unshards once forward and once for the
    # transposed (backward) pass, the teacher once per intermediate query;
    # with nfe=2 and 2 intermediate states that is ~8 full unshards of the
    # (shared) trunk. 12x param bytes leaves headroom without masking a
    # replicate-then-repartition regression (which multiplies traffic by
    # the mesh size, not a constant).
    assert ag['bytes'] <= 12 * param_bytes, (
        f"all-gather {ag['bytes'] / 1e6:.1f} MB vs params "
        f"{param_bytes / 1e6:.1f} MB — SPMD resharding regression?"
        f" full stats: {stats}")


def _tiny_qwen_model():
    """Tiny tied teacher/student ArcQwen distillation composition — the
    Qwen-family counterpart of __graft_entry__._build_tiny_model (masked
    joint attention, no guidance/pooled conditioning)."""
    from arcflow_tpu.models import LatentDiffusionTextImage
    net = dict(in_channels=64, num_layers=2, attention_head_dim=32,
               num_attention_heads=4, joint_attention_dim=48,
               axes_dims_rope=(8, 12, 12), checkpointing=False)
    return LatentDiffusionTextImage(
        diffusion=dict(
            type='ArcFlowImitationDataFree', policy_type='ArcFlow',
            denoising=dict(type='ArcQwenImageTransformer2DModel',
                           patch_size=2, num_gaussians=4, lora_rank=4,
                           **net),
            flow_loss=dict(type='DiffusionMSELoss',
                           data_info=dict(pred='u_t_pred', target='u_t'),
                           rescale_cfg=dict(scale=30.0)),
            num_timesteps=1,
            timestep_sampler=dict(type='ContinuousTimeStepSampler',
                                  shift=3.1)),
        teacher=dict(type='GaussianFlow',
                     denoising=dict(type='QwenImageTransformer2DModel',
                                    patch_size=2, **net),
                     num_timesteps=1),
        tie_teacher=True,
        latent_shape=(8, 8, 64), text_embed_dim=48,
        train_cfg=dict(nfe=2, timestep_ratio=1.0, total_substeps=128,
                       num_intermediate_states=2, window_substeps=3,
                       gm_dropout=0.1, num_decay_iters=100,
                       teacher_guidance_scale=2.0,
                       diffusion_grad_clip=50.0),
        test_cfg=dict(nfe=2, timestep_ratio=1.0))


def test_qwen_train_step_audit():
    """Tiny always-on version of ``bench.py --train --aot-20b`` (VERDICT
    r04 #1): the Qwen-family distillation step (masked flash path, teacher
    CFG via mask concat) compiled over the all-axes mesh must partition
    cleanly — all-gather bytes bounded, no involuntary remats."""
    import __graft_entry__ as g
    import optax
    import jax.numpy as jnp
    from arcflow_tpu.parallel import (audit_compiled, batch_axes,
                                      set_activation_sharding, shard_batch,
                                      shard_state, tree_bytes)
    from arcflow_tpu.runner import EmaConfig, TrainState, build_train_step

    mesh = g._make_dryrun_mesh(8, jax.devices()[:8])
    set_activation_sharding(mesh)
    try:
        model = _tiny_qwen_model()
        trainable, frozen = model.init_params(jax.random.PRNGKey(0))
        optimizers = {'diffusion': optax.adamw(1e-4)}
        state = TrainState.create(jax.random.PRNGKey(1), trainable, frozen,
                                  optimizers, ema_keys=model.ema_keys)
        state, _ = shard_state(state, mesh, fsdp_axis='fsdp',
                               tensor_axis='tensor', min_size=1024)
        bs = 2 * int(np.prod([mesh.shape[a] for a in batch_axes(mesh)]))
        ks = jax.random.split(jax.random.PRNGKey(2), 2)
        mask = jnp.ones((bs, 8), jnp.int32).at[:, 6:].set(0)
        batch = dict(
            latents=jax.random.normal(ks[0], (bs, 8, 8, 64)),
            prompt_embed_kwargs=dict(
                encoder_hidden_states=jax.random.normal(ks[1], (bs, 8, 48)),
                encoder_hidden_states_mask=mask),
            negative_prompt_embed_kwargs=dict(
                encoder_hidden_states=jnp.zeros((bs, 8, 48)),
                encoder_hidden_states_mask=jnp.ones((bs, 8), jnp.int32)))
        batch = shard_batch(batch, mesh, axis='data')
        train_step = build_train_step(
            model, optimizers, train_cfg=model.train_cfg,
            ema_cfg=EmaConfig(momentum_policy='karras'), donate=False)
        compiled = train_step.lower(state, batch).compile()
        state, logs = compiled(state, batch)
        assert np.isfinite(float(logs['loss']))
    finally:
        from arcflow_tpu.parallel import clear_activation_sharding
        clear_activation_sharding()

    remat = compiled.as_text().count('Involuntary full rematerialization')
    assert remat == 0, f'{remat} involuntary remats in the qwen train step'
    stats = audit_compiled(compiled)['collectives']
    param_bytes = tree_bytes(state.trainable) + tree_bytes(state.frozen)
    ag = stats['all-gather']
    assert ag['count'] > 0
    assert ag['bytes'] <= 12 * param_bytes, (ag, param_bytes, stats)


def test_sharded_w4a8_qwen_masked_inference_audit():
    """Tiny always-on version of ``bench.py --aot-infer --qwen`` (VERDICT
    r04 #1): the w4a8 (nibble-packed int4 weights, int8 activations) masked
    2-NFE Qwen sampling program over an fsdp x tensor x sp mesh — no
    involuntary remats, all-gather bounded by the quantized param bytes."""
    import jax.numpy as jnp
    from arcflow_tpu.diffusion import (ArcFlowPolicy,
                                       ContinuousTimeStepSampler,
                                       momentum_integration)
    from arcflow_tpu.models import ArcQwenImageTransformer2DModel
    from arcflow_tpu.parallel import (activation_sharding, audit_compiled,
                                      make_mesh, param_spec_for_path,
                                      tree_bytes)
    from arcflow_tpu.utils.quantize import (quantize_weights_int4,
                                            set_act_quant)
    from jax.sharding import NamedSharding

    model = ArcQwenImageTransformer2DModel(
        patch_size=2, num_gaussians=4, in_channels=16, num_layers=2,
        attention_head_dim=32, num_attention_heads=4,
        joint_attention_dim=48, axes_dims_rope=(8, 12, 12),
        checkpointing=False, dtype=jnp.float32)
    sampler = ContinuousTimeStepSampler(num_timesteps=1, shift=3.1)
    b = 1
    mask = jnp.ones((b, 8), jnp.int32).at[:, 6:].set(0)
    inputs = dict(
        hidden_states=jnp.zeros((b, 16, 16, 4)),
        encoder_hidden_states=jnp.zeros((b, 8, 48)),
        encoder_hidden_states_mask=mask)
    params = model.init(jax.random.PRNGKey(0), t=jnp.ones((b,)),
                        **inputs)['params']
    qparams, quant = quantize_weights_int4(params, min_size=1024,
                                           group_size=32)

    mesh = make_mesh({'fsdp': 2, 'tensor': 2, 'sp': 2})

    def place(tree):
        import jax.tree_util as jtu
        return jax.device_put(tree, jtu.tree_map_with_path(
            lambda p, x: NamedSharding(
                mesh, param_spec_for_path(
                    '/'.join(str(getattr(k, 'key', k)) for k in p), x, mesh,
                    min_size=1024)), tree))

    variables = {'params': place(qparams), 'quant': place(quant)}

    def sample_2nfe(variables, noise, txt_emb, txt_mask):
        x = noise
        raw = jnp.array([1.0, 0.5, 0.0])
        for i in range(2):
            sigma_src = sampler.warp_t(jnp.full((b,), raw[i]))
            out = model.apply(variables, x, sigma_src,
                              encoder_hidden_states=txt_emb,
                              encoder_hidden_states_mask=txt_mask)
            policy = ArcFlowPolicy.create(out, x, sigma_src)
            sigma_dst = sampler.warp_t(jnp.full((b,), raw[i + 1]))
            x = momentum_integration(policy, x, sigma_src, sigma_dst)
        return x

    set_act_quant(True)
    try:
        with activation_sharding(mesh):
            compiled = jax.jit(sample_2nfe).lower(
                variables, inputs['hidden_states'],
                inputs['encoder_hidden_states'],
                inputs['encoder_hidden_states_mask']).compile()
            out = compiled(variables, inputs['hidden_states'],
                           inputs['encoder_hidden_states'],
                           inputs['encoder_hidden_states_mask'])
    finally:
        set_act_quant(False)
    assert np.isfinite(np.asarray(out)).all()

    remat = compiled.as_text().count('Involuntary full rematerialization')
    assert remat == 0, f'{remat} involuntary remats in the qwen w4a8 program'
    stats = audit_compiled(compiled)['collectives']
    param_bytes = tree_bytes(variables['params']) + \
        tree_bytes(variables['quant'])
    ag = stats['all-gather']
    assert ag['bytes'] <= 4 * param_bytes, (ag, param_bytes)


def test_ring_attention_program_is_permute_only():
    """The compiled ring-attention program moves K/V with neighbour
    collective-permutes only — no all-to-all (that is the Ulysses layout)
    and no all-gather of the sequence (the point of the ring: no device
    ever holds full S)."""
    import jax.numpy as jnp
    from arcflow_tpu.models.layers import attention
    from arcflow_tpu.parallel import (activation_sharding, audit_compiled,
                                      make_mesh)

    mesh = make_mesh({'sp': 8})
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (2, 64, 4, 16)) for kk in ks)
    with activation_sharding(mesh, sp_mode='ring'):
        compiled = jax.jit(attention).lower(q, k, v).compile()
    stats = audit_compiled(compiled)['collectives']
    cp = stats['collective-permute']
    assert cp['count'] > 0, f'ring must ppermute K/V blocks: {stats}'
    assert stats['all-to-all']['count'] == 0, stats
    # the only gather-like traffic allowed is (re)assembling the output for
    # the caller's replicated result layout — never S x (H, D) K/V blocks
    seq_kv_bytes = 2 * q.size * q.dtype.itemsize
    assert stats['all-gather']['bytes'] <= seq_kv_bytes, stats


def test_sharded_w8a8_inference_program_audit():
    """Tiny version of ``bench.py --aot-infer`` (VERDICT r03 weak #3): the
    w8a8 2-NFE sampling program compiled over an fsdp x tensor x sp
    inference mesh must partition cleanly — no involuntary-remat warnings,
    all-gather traffic bounded by a small multiple of the (quantized)
    parameter bytes (the fsdp unshard cost across 2 NFE forwards)."""
    import jax.numpy as jnp
    from arcflow_tpu.diffusion import (ArcFlowPolicy,
                                       ContinuousTimeStepSampler,
                                       momentum_integration)
    from arcflow_tpu.models import ArcFluxTransformer2DModel
    from arcflow_tpu.parallel import (activation_sharding, audit_compiled,
                                      make_mesh, param_spec_for_path,
                                      tree_bytes)
    from arcflow_tpu.utils.quantize import (quantize_weights_int8,
                                            set_act_quant)
    from jax.sharding import NamedSharding

    model = ArcFluxTransformer2DModel(
        patch_size=2, num_gaussians=4, in_channels=16, num_layers=2,
        num_single_layers=2, attention_head_dim=32, num_attention_heads=4,
        joint_attention_dim=64, pooled_projection_dim=32,
        guidance_embeds=True, axes_dims_rope=(8, 12, 12),
        checkpointing=False, dtype=jnp.float32)
    sampler = ContinuousTimeStepSampler(num_timesteps=1, shift=3.2)
    b = 1
    inputs = dict(
        hidden_states=jnp.zeros((b, 16, 16, 4)),
        encoder_hidden_states=jnp.zeros((b, 8, 64)),
        pooled_projections=jnp.zeros((b, 32)),
        guidance=jnp.full((b,), 3.5))
    params = model.init(jax.random.PRNGKey(0), t=jnp.ones((b,)),
                        **inputs)['params']
    qparams, quant = quantize_weights_int8(params, min_size=1024)

    mesh = make_mesh({'fsdp': 2, 'tensor': 2, 'sp': 2})

    def place(tree):
        import jax.tree_util as jtu
        return jax.device_put(tree, jtu.tree_map_with_path(
            lambda p, x: NamedSharding(
                mesh, param_spec_for_path(
                    '/'.join(str(getattr(k, 'key', k)) for k in p), x, mesh,
                    min_size=1024)), tree))

    variables = {'params': place(qparams), 'quant': place(quant)}

    def sample_2nfe(variables, noise, txt_emb, pooled, guidance):
        x = noise
        raw = jnp.array([1.0, 0.5, 0.0])
        for i in range(2):
            sigma_src = sampler.warp_t(jnp.full((b,), raw[i]))
            out = model.apply(variables, x, sigma_src,
                              encoder_hidden_states=txt_emb,
                              pooled_projections=pooled, guidance=guidance)
            policy = ArcFlowPolicy.create(out, x, sigma_src)
            sigma_dst = sampler.warp_t(jnp.full((b,), raw[i + 1]))
            x = momentum_integration(policy, x, sigma_src, sigma_dst)
        return x

    set_act_quant(True)
    try:
        with activation_sharding(mesh):
            compiled = jax.jit(sample_2nfe).lower(
                variables, inputs['hidden_states'],
                inputs['encoder_hidden_states'],
                inputs['pooled_projections'], inputs['guidance']).compile()
            out = compiled(variables, inputs['hidden_states'],
                           inputs['encoder_hidden_states'],
                           inputs['pooled_projections'], inputs['guidance'])
    finally:
        set_act_quant(False)
    assert np.isfinite(np.asarray(out)).all()

    remat = compiled.as_text().count('Involuntary full rematerialization')
    assert remat == 0, f'{remat} involuntary remats in the inference program'
    stats = audit_compiled(compiled)['collectives']
    param_bytes = tree_bytes(variables['params']) + \
        tree_bytes(variables['quant'])
    ag = stats['all-gather']
    # 2 NFE forwards re-gather the fsdp-sharded weights once each; 4x the
    # param bytes leaves headroom without masking a replicate-then-
    # repartition regression
    assert ag['bytes'] <= 4 * param_bytes, (ag, param_bytes)
