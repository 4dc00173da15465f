#!/usr/bin/env python
"""Benchmark: 2-NFE ArcFlux text-to-image transformer throughput at 1024px.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: images/sec/chip for the full 2-NFE sampling program (2 ArcFlux DiT
forwards + mixture policy + analytic momentum integration per image) at
1024x1024 (128x128x16 latents, p=2 -> 4096 image tokens + 512 text tokens).

The reference publishes no throughput numbers (BASELINE.md); the north-star
target is <1 s end-to-end on v5p-8, i.e. 0.125 images/sec/chip —
``vs_baseline`` is measured value / 0.125. The transformer is the dominant
cost at 2 NFE; VAE decode will be added to the e2e figure when the VAE lands.

Default mode measures the FULL 12B FLUX geometry (19 joint + 38 single
blocks) on one chip under w8a8 (int8 weights + dynamic per-token int8
activations at the MXU int8 rate) — the mode that meets the <1 s north
star, quality-gated by tests/test_quantized_quality.py. Other modes:
`--int8` weight-only int8 (bf16 compute); `--int4` weight-only int4
(nibble-packed, group-128 scales — the capacity mode); `--bf16` largest
truncated bf16 geometry + disclosed FLOP-scaling; `--qwen` the Qwen-Image
family (FULL 20B geometry in int4 on one chip, int8 depth-ladder
fallback); `--sharded/--mesh` the 12B geometry over a device mesh
(fsdp/tensor/sp axes) on multi-chip hosts; `--train` the distillation
optimizer step; `--train --aot-12b` the simulated-v5p-8 12B FSDP
compile audit (AOT_12B.json).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

from arcflow_tpu.utils import setup_jax


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(num_layers, num_single_layers, latent=128, txt=512, k=16,
          mesh=None, batch=1, int8=False, w8a8=False, int4=False,
          sp_mode='ulysses'):
    from arcflow_tpu.models import ArcFluxTransformer2DModel
    from arcflow_tpu.diffusion import (ArcFlowPolicy, ContinuousTimeStepSampler,
                                       momentum_integration)
    from arcflow_tpu.utils.quantize import set_serving
    set_serving(True)   # forward-only program: splash attention engages
    model = ArcFluxTransformer2DModel(
        patch_size=2, num_gaussians=k, in_channels=64,
        num_layers=num_layers, num_single_layers=num_single_layers,
        attention_head_dim=128, num_attention_heads=24,
        joint_attention_dim=4096, pooled_projection_dim=768,
        guidance_embeds=True, checkpointing=False, dtype=jnp.bfloat16)
    sampler = ContinuousTimeStepSampler(num_timesteps=1, shift=3.2)

    b = batch
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    inputs = dict(
        hidden_states=jax.random.normal(ks[0], (b, latent, latent, 16),
                                        jnp.bfloat16),
        encoder_hidden_states=jax.random.normal(ks[1], (b, txt, 4096),
                                                jnp.bfloat16),
        pooled_projections=jax.random.normal(ks[2], (b, 768), jnp.bfloat16),
        guidance=jnp.full((b,), 3.5))

    def init_fn(rng):
        p = model.init(rng, t=jnp.ones((b,)), **inputs)['params']
        # cast-in-graph: frozen inference params live in bf16 (the reference
        # loads the base model in torch_dtype=bfloat16); fusing the cast into
        # init keeps peak HBM at one fp32 param, not the whole fp32 tree
        return jax.tree.map(lambda x: x.astype(jnp.bfloat16), p)

    if int8 or int4:
        # int8/int4 inference (production path: quantize_weights_int{8,4} on
        # converted real weights — tests/test_quantize.py covers that
        # transform). The bench builds the quantized tree directly ON
        # DEVICE: eval_shape through init+quantize yields the exact
        # shapes/dtypes of the real transform with zero host compute, and
        # random quantized kernels cost the same HBM + MXU as real ones
        # (int8: 11.6 GB; int4: 6.0 GB for the full 12B geometry).
        from arcflow_tpu.utils.quantize import (quantize_weights_int4,
                                                quantize_weights_int8,
                                                set_act_quant)
        set_act_quant(w8a8)
        t0 = time.perf_counter()
        shapes = jax.eval_shape(init_fn, ks[3])
        quant_fn = quantize_weights_int4 if int4 else quantize_weights_int8
        q_shapes, s_shapes = jax.eval_shape(quant_fn, shapes)

        def _gen_leaf(key, sd):
            if sd.dtype == jnp.int4:
                v = jax.random.normal(key, sd.shape, jnp.bfloat16) * 2.5
                return jnp.clip(jnp.round(v), -7, 7).astype(jnp.int4)
            if sd.dtype == jnp.int8:
                v = jax.random.normal(key, sd.shape, jnp.bfloat16) * 40.0
                return jnp.clip(jnp.round(v), -127, 127).astype(jnp.int8)
            return (jax.random.normal(key, sd.shape, jnp.bfloat16) * 0.02
                    ).astype(sd.dtype)

        def gen(rng):
            leaves, treedef = jax.tree.flatten(q_shapes)
            qleaves, qtreedef = jax.tree.flatten(s_shapes)
            keys = jax.random.split(rng, len(leaves) + len(qleaves))
            qp = jax.tree.unflatten(
                treedef, [_gen_leaf(kk, sd) for kk, sd in zip(keys, leaves)])
            # int4 mode keeps the nibble-packed kernels in the quant tree:
            # random bytes there (two random nibbles each); float leaves
            # are scales
            quant = jax.tree.unflatten(qtreedef, [
                jax.random.randint(kk, sd.shape, -128, 128, jnp.int8)
                if sd.dtype == jnp.int8
                else jnp.full(sd.shape, 2e-4, sd.dtype)
                for kk, sd in zip(keys[len(leaves):], qleaves)])
            return {'params': qp, 'quant': quant}

        log(f'generating {"int4" if int4 else "int8"} weight tree '
            f'on device...')
        variables = jax.jit(gen)(ks[3])
        jax.block_until_ready(variables)
        log(f'quantized tree ready: {time.perf_counter() - t0:.1f}s')

        def sample_2nfe_q(variables, noise, txt_emb, pooled, guidance):
            x = noise
            raw = jnp.array([1.0, 0.5, 0.0])
            for i in range(2):
                raw_src = jnp.full((b,), raw[i])
                sigma_src = sampler.warp_t(raw_src)
                out = model.apply(variables, x, sigma_src,
                                  encoder_hidden_states=txt_emb,
                                  pooled_projections=pooled,
                                  guidance=guidance)
                policy = ArcFlowPolicy.create(out, x, sigma_src)
                sigma_dst = sampler.warp_t(jnp.full((b,), raw[i + 1]))
                x = momentum_integration(policy, x, sigma_src,
                                         sigma_dst).astype(jnp.bfloat16)
            return x

        fn = jax.jit(sample_2nfe_q, donate_argnums=(1,))
        args = (variables, inputs['hidden_states'],
                inputs['encoder_hidden_states'],
                inputs['pooled_projections'], inputs['guidance'])
        return fn, args, model

    if mesh is not None:
        # sharded inference: params over fsdp(+tensor), activations pinned
        # (the multi-chip path for the full 12B geometry; runs wherever
        # >1 devices exist — the 1-chip bench env uses mesh=None). A
        # 'pipe'/'expert' mesh axis additionally pins the scan-stacked
        # block layer dim / MoE expert dim (path-aware specs).
        from jax.sharding import NamedSharding
        from arcflow_tpu.parallel import (moe_param_spec, param_spec_for,
                                          set_activation_sharding,
                                          stacked_param_spec)
        set_activation_sharding(mesh, sp_mode=sp_mode)
        fsdp = mesh.shape.get('fsdp', 1)
        tensor = mesh.shape.get('tensor', 1)
        pipe = mesh.shape.get('pipe', 1)
        expert = mesh.shape.get('expert', 1)
        shapes = jax.eval_shape(init_fn, ks[3])

        def spec_of(path, x):
            ps = '/'.join(str(getattr(kk, 'key', kk)) for kk in path)
            stacked = 'blocks' in ps
            if expert > 1 and 'moe' in ps:
                return NamedSharding(mesh, moe_param_spec(
                    x, 'expert', expert, stacked=stacked, pipe_axis='pipe',
                    pipe_size=pipe, fsdp_axis='fsdp', fsdp_size=fsdp,
                    tensor_axis='tensor', tensor_size=tensor))
            if pipe > 1 and stacked:
                return NamedSharding(mesh, stacked_param_spec(
                    x, 'pipe', pipe, 'fsdp', fsdp, 'tensor', tensor))
            return NamedSharding(mesh, param_spec_for(
                x, 'fsdp', fsdp, 'tensor', tensor))
        shardings = jax.tree_util.tree_map_with_path(spec_of, shapes)
        params = jax.jit(init_fn, out_shardings=shardings)(ks[3])
    else:
        params = jax.jit(init_fn)(ks[3])
    jax.block_until_ready(params)

    # full 2-NFE sampling program: 2 DiT forwards + analytic integration
    def sample_2nfe(params, noise, txt_emb, pooled, guidance):
        x = noise
        raw = jnp.array([1.0, 0.5, 0.0])
        for i in range(2):
            raw_src = jnp.full((b,), raw[i])
            sigma_src = sampler.warp_t(raw_src)
            out = model.apply({'params': params}, x, sigma_src,
                              encoder_hidden_states=txt_emb,
                              pooled_projections=pooled, guidance=guidance)
            policy = ArcFlowPolicy.create(out, x, sigma_src)
            sigma_dst = sampler.warp_t(jnp.full((b,), raw[i + 1]))
            x = momentum_integration(policy, x, sigma_src, sigma_dst).astype(
                jnp.bfloat16)
        return x

    fn = jax.jit(sample_2nfe, donate_argnums=(1,))
    args = (params, inputs['hidden_states'], inputs['encoder_hidden_states'],
            inputs['pooled_projections'], inputs['guidance'])
    return fn, args, model


def build_qwen(num_layers, latent=128, txt=512, k=16, batch=1,
               int8=False, w8a8=False, int4=False):
    """Qwen-Image geometry (reference arcqwen.py: 60 joint blocks, dim 3072,
    joint_attention_dim 3584) with a REAL text key mask — the 2-NFE program
    runs all blocks through the masked (segment-ids) flash-attention path.

    ``int4``: weight-only int4 (group-128 scales) — the FULL 20B geometry
    fits one 16 GB chip (s4 packs 2/byte in HBM)."""
    from arcflow_tpu.models import ArcQwenImageTransformer2DModel
    from arcflow_tpu.diffusion import (ArcFlowPolicy, ContinuousTimeStepSampler,
                                       momentum_integration)
    from arcflow_tpu.utils.quantize import set_serving
    set_serving(True)   # forward-only program (masked path keeps flash)
    model = ArcQwenImageTransformer2DModel(
        patch_size=2, num_gaussians=k, in_channels=64,
        num_layers=num_layers, attention_head_dim=128,
        num_attention_heads=24, joint_attention_dim=3584,
        checkpointing=False, dtype=jnp.bfloat16)
    sampler = ContinuousTimeStepSampler(num_timesteps=1, shift=3.1)

    b = batch
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    # per-sample text padding, like real Qwen2.5-VL prompt embeds
    mask = (jnp.arange(txt)[None, :] <
            jnp.full((b, 1), int(txt * 0.75))).astype(jnp.int32)
    inputs = dict(
        hidden_states=jax.random.normal(ks[0], (b, latent, latent, 16),
                                        jnp.bfloat16),
        encoder_hidden_states=jax.random.normal(ks[1], (b, txt, 3584),
                                                jnp.bfloat16),
        encoder_hidden_states_mask=mask)

    def init_fn(rng):
        p = model.init(rng, t=jnp.ones((b,)), **inputs)['params']
        return jax.tree.map(lambda x: x.astype(jnp.bfloat16), p)

    if int8 or int4:
        from arcflow_tpu.utils.quantize import (quantize_weights_int4,
                                                quantize_weights_int8,
                                                set_act_quant)
        set_act_quant(w8a8)
        t0 = time.perf_counter()
        shapes = jax.eval_shape(init_fn, ks[3])
        quant_fn = quantize_weights_int4 if int4 else quantize_weights_int8
        q_shapes, s_shapes = jax.eval_shape(quant_fn, shapes)

        def _gen_leaf(key, sd):
            if sd.dtype == jnp.int4:
                v = jax.random.normal(key, sd.shape, jnp.bfloat16) * 2.5
                return jnp.clip(jnp.round(v), -7, 7).astype(jnp.int4)
            if sd.dtype == jnp.int8:
                v = jax.random.normal(key, sd.shape, jnp.bfloat16) * 40.0
                return jnp.clip(jnp.round(v), -127, 127).astype(jnp.int8)
            return (jax.random.normal(key, sd.shape, jnp.bfloat16) * 0.02
                    ).astype(sd.dtype)

        def gen(rng):
            leaves, treedef = jax.tree.flatten(q_shapes)
            qleaves, qtreedef = jax.tree.flatten(s_shapes)
            keys = jax.random.split(rng, len(leaves) + len(qleaves))
            qp = jax.tree.unflatten(
                treedef, [_gen_leaf(kk, sd) for kk, sd in zip(keys, leaves)])
            # int4 mode keeps the nibble-packed kernels in the quant tree:
            # random bytes there (two random nibbles each); float leaves
            # are scales
            quant = jax.tree.unflatten(qtreedef, [
                jax.random.randint(kk, sd.shape, -128, 128, jnp.int8)
                if sd.dtype == jnp.int8
                else jnp.full(sd.shape, 2e-4, sd.dtype)
                for kk, sd in zip(keys[len(leaves):], qleaves)])
            return {'params': qp, 'quant': quant}

        log(f'generating {"int4" if int4 else "int8"} qwen weight tree '
            f'on device...')
        variables = jax.jit(gen)(ks[3])
        jax.block_until_ready(variables)
        log(f'quantized tree ready: {time.perf_counter() - t0:.1f}s')
    else:
        variables = {'params': jax.jit(init_fn)(ks[3])}
        jax.block_until_ready(variables)

    def sample_2nfe(variables, noise, txt_emb, txt_mask):
        x = noise
        raw = jnp.array([1.0, 0.5, 0.0])
        for i in range(2):
            raw_src = jnp.full((b,), raw[i])
            sigma_src = sampler.warp_t(raw_src)
            out = model.apply(variables, x, sigma_src,
                              encoder_hidden_states=txt_emb,
                              encoder_hidden_states_mask=txt_mask)
            policy = ArcFlowPolicy.create(out, x, sigma_src)
            sigma_dst = sampler.warp_t(jnp.full((b,), raw[i + 1]))
            x = momentum_integration(policy, x, sigma_src,
                                     sigma_dst).astype(jnp.bfloat16)
        return x

    fn = jax.jit(sample_2nfe, donate_argnums=(1,))
    args = (variables, inputs['hidden_states'],
            inputs['encoder_hidden_states'],
            inputs['encoder_hidden_states_mask'])
    return fn, args, model


def count_logical_params(variables) -> int:
    """Model-parameter count for a (possibly quantized) variables tree:
    nibble-packed int4 kernels hold two parameters per stored element;
    scale tensors are quantization metadata, not parameters."""
    from arcflow_tpu.utils.pytree import flatten
    if isinstance(variables, dict) and 'quant' in variables:
        n = sum(x.size for x in jax.tree.leaves(variables['params'])
                if hasattr(x, 'size'))
        for k, v in flatten(variables['quant']).items():
            if k.endswith('.kernel_packed4'):
                n += v.size * 2
        return n
    return sum(x.size for x in jax.tree.leaves(variables)
               if hasattr(x, 'size'))


def try_bench_qwen(num_layers, iters=8, batch=1, int8=False, w8a8=False,
                   int4=False):
    fn, args, model = build_qwen(num_layers, batch=batch, int8=int8,
                                 w8a8=w8a8, int4=int4)
    n_params = count_logical_params(args[0])
    log(f'qwen config: {num_layers} joint blocks, {n_params / 1e9:.2f}B '
        f'params')
    variables, noise, txt, mask = args
    t0 = time.perf_counter()
    out = fn(variables, noise, txt, mask)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    log(f'compile+first run: {time.perf_counter() - t0:.1f}s')
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(variables, out, txt, mask)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    per_image = (time.perf_counter() - t0) / iters / batch
    return per_image, n_params, (fn, (variables, out, txt, mask))


def bench_qwen_vae_decode(latent=128, iters=4):
    """Qwen (Wan image-mode) VAE decode cost at 1024px."""
    from arcflow_tpu.models import PretrainedVAEQwenImage
    vae = PretrainedVAEQwenImage(dtype='bfloat16')
    params = jax.jit(vae.init_params, static_argnums=(1,))(
        jax.random.PRNGKey(0), 64)
    decode = jax.jit(lambda p, z: vae.decode(p, z))
    z = jax.random.normal(jax.random.PRNGKey(1), (1, latent, latent, 16))
    img = decode(params, z)
    _ = float(jnp.sum(img))
    t0 = time.perf_counter()
    for _ in range(iters):
        img = decode(params, z)
    _ = float(jnp.sum(img))
    return (time.perf_counter() - t0) / iters


def bench_vae_decode(latent=128, iters=4):
    """VAE decode cost at 1024px (flax AutoencoderKL decoder; random weights
    cost the same FLOPs as real ones)."""
    from arcflow_tpu.models import PretrainedVAEDecoder
    vae = PretrainedVAEDecoder(latent_channels=16, dtype='bfloat16')
    params = jax.jit(vae.init_params, static_argnums=(1,))(
        jax.random.PRNGKey(0), latent * 8)
    decode = jax.jit(lambda p, z: vae.decode(p, z))
    z = jax.random.normal(jax.random.PRNGKey(1), (1, latent, latent, 16))
    img = decode(params, z)
    _ = float(jnp.sum(img))
    t0 = time.perf_counter()
    for _ in range(iters):
        img = decode(params, z)
    _ = float(jnp.sum(img))
    return (time.perf_counter() - t0) / iters


def bench_train(layers, single_layers, latent=64, txt=512, batch=1, iters=6,
                frozen_quant=None, optim='adamw', family='flux',
                offload=False):
    """One full 2-NFE distillation optimizer step on one chip: per NFE step
    a student forward + 4 CFG'd frozen-teacher queries per segment, summed
    loss, one backward, per-submodule clip with NaN skip, in-step karras EMA
    — all a single donated-state XLA program (runner/train_step.py).
    512px latents (64x64x16). Returns (sec/step, n_params).

    ``frozen_quant='int8'`` quantizes the frozen trunk (weights never
    update) — halves frozen HBM vs bf16, roughly doubling the measurable
    on-chip training scale; quality gated by
    tests/test_quantized_quality.py's int8-teacher distillation run.

    ``family='qwen'`` measures the ArcQwen distillation step instead
    (masked 60-block-geometry blocks at depth ``layers``, reference
    configs/qwen/arcqwen_2nfe_k16.py: joint_attention_dim 3584, teacher
    CFG 2x batch through the masked flash-attention path, no guidance
    embeds)."""
    import optax
    from arcflow_tpu.models import LatentDiffusionTextImage
    from arcflow_tpu.runner import EmaConfig, TrainState, build_train_step

    if family == 'qwen':
        net = dict(in_channels=64, num_layers=layers,
                   attention_head_dim=128, num_attention_heads=24,
                   joint_attention_dim=3584, checkpointing=True)
        student = dict(type='ArcQwenImageTransformer2DModel', patch_size=2,
                       num_gaussians=16, lora_rank=256, **net)
        teacher_net = dict(type='QwenImageTransformer2DModel', patch_size=2,
                           **net)
        text_dim, shift = 3584, 3.1
        guidance_cfg = {}
    else:
        net = dict(in_channels=64, num_layers=layers,
                   num_single_layers=single_layers, attention_head_dim=128,
                   num_attention_heads=24, joint_attention_dim=4096,
                   pooled_projection_dim=768, guidance_embeds=True,
                   checkpointing=True)
        student = dict(type='ArcFluxTransformer2DModel', patch_size=2,
                       num_gaussians=16, lora_rank=256, **net)
        teacher_net = dict(type='FluxTransformer2DModel', patch_size=2,
                           **net)
        text_dim, shift = 4096, 3.2
        guidance_cfg = dict(distilled_guidance_scale=3.5,
                            teacher_distilled_guidance_scale=3.5)
    model = LatentDiffusionTextImage(
        diffusion=dict(
            type='ArcFlowImitationDataFree', policy_type='ArcFlow',
            denoising=student,
            flow_loss=dict(type='DiffusionMSELoss',
                           data_info=dict(pred='u_t_pred', target='u_t'),
                           rescale_cfg=dict(scale=30.0)),
            num_timesteps=1,
            timestep_sampler=dict(type='ContinuousTimeStepSampler',
                                  shift=shift)),
        teacher=dict(type='GaussianFlow', denoising=teacher_net,
                     num_timesteps=1),
        tie_teacher=True,
        # bf16 frozen trunk = the reference's FSDP MixedPrecision layout
        frozen_dtype='bfloat16', frozen_quant=frozen_quant,
        latent_shape=(latent, latent, 16), text_embed_dim=text_dim,
        pooled_dim=768,
        train_cfg=dict(nfe=2, timestep_ratio=1.0, total_substeps=128,
                       num_intermediate_states=4, window_substeps=3,
                       gm_dropout=0.1, num_decay_iters=100,
                       teacher_guidance_scale=2.0,
                       diffusion_grad_clip=50.0, **guidance_cfg),
        test_cfg=dict(nfe=2, timestep_ratio=1.0))

    # ONE jitted init program: the per-leaf eager path costs thousands of
    # tunnel dispatches and holds the full fp32 tree on the chip before the
    # bf16 cast / int8 quantize; under jit XLA frees each fp32 leaf after
    # its cast, so the reachable geometry is set by the TRAINED state, not
    # the init peak
    t0 = time.perf_counter()
    trainable, frozen = jax.jit(model.init_params)(jax.random.PRNGKey(0))
    jax.block_until_ready(frozen)
    # count PARAMETERS, not array elements: int4 trunks pack two weights
    # per int8 element ('kernel_packed4'), so size alone would halve the
    # reported scale (and scale tables aren't model weights at all)
    from arcflow_tpu.utils.pytree import flatten as _flatten
    flat = _flatten({'t': trainable, 'f': frozen})
    n_params = sum(
        v.size * (2 if k.endswith('kernel_packed4') else 1)
        for k, v in flat.items()
        if not (k.endswith('_scale') or k.endswith('_scale4')))
    n_train = sum(x.size for x in jax.tree.leaves(trainable))
    geo = f'{layers}j' if family == 'qwen' else f'{layers}j+{single_layers}s'
    log(f'train config: {family} {geo}, {n_params / 1e9:.2f}B '
        f'params ({n_train / 1e6:.0f}M trainable); init '
        f'{time.perf_counter() - t0:.1f}s')
    # built through the product builder (runner/optim.py), not raw optax:
    # 'adamw8bit' resolves the reference's bitsandbytes memory-efficient
    # slot to Adafactor — no fp32 m/v pair (~8 bytes/trainable param saved),
    # which is what lets the biggest ladder geometries train on one chip
    from arcflow_tpu.runner.optim import build_single_optimizer
    opt_cfg = (dict(type='AdamW8bit', lr=1e-4) if optim == 'adamw8bit'
               else dict(type='AdamW', lr=1e-4))
    optimizers = {'diffusion': build_single_optimizer(opt_cfg, None)}
    state = TrainState.create(jax.random.PRNGKey(1), trainable, frozen,
                              optimizers, ema_keys=model.ema_keys)
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    if family == 'qwen':
        # per-sample text padding, like real Qwen2.5-VL prompt embeds —
        # teacher CFG concatenates the negative mask too
        mask = (jnp.arange(txt)[None, :] <
                jnp.full((batch, 1), int(txt * 0.75))).astype(jnp.int32)
        pos = dict(encoder_hidden_states=jax.random.normal(
                       ks[1], (batch, txt, text_dim)),
                   encoder_hidden_states_mask=mask)
        neg = dict(encoder_hidden_states=jnp.zeros((batch, txt, text_dim)),
                   encoder_hidden_states_mask=jnp.ones((batch, txt),
                                                       jnp.int32))
    else:
        pos = dict(encoder_hidden_states=jax.random.normal(
                       ks[1], (batch, txt, text_dim)),
                   pooled_projections=jax.random.normal(ks[2], (batch, 768)))
        neg = dict(encoder_hidden_states=jnp.zeros((batch, txt, text_dim)),
                   pooled_projections=jnp.zeros((batch, 768)))
    batch_data = dict(
        latents=jax.random.normal(ks[0], (batch, latent, latent, 16)),
        prompt_embed_kwargs=pos,
        negative_prompt_embed_kwargs=neg)

    # evict the init / TrainState.create executables before the train step
    # loads — compiled programs live in HBM (the 12j train step alone is
    # 645 MB of generated code per memory_analysis). Measured: this alone
    # does NOT unlock the next ladder rung (the binding term is the train
    # step's own args + temps + code, which the TPU sums with no
    # arg/temp overlap), but it removes dead code from the accounting.
    jax.clear_caches()
    offload_shardings = None
    if offload:
        # cold state (optimizer slots + EMA) lives in the TPU host's pinned
        # memory; the step streams it on/off-device around the update
        from jax.sharding import SingleDeviceSharding
        dev = jax.devices()[0]
        dev_s = SingleDeviceSharding(dev)
        host_s = SingleDeviceSharding(dev, memory_kind='pinned_host')
        offload_shardings = (dev_s, host_s)
        state = state.replace(
            opt_states=jax.tree.map(
                lambda x: jax.device_put(x, host_s), state.opt_states),
            ema=jax.tree.map(lambda x: jax.device_put(x, host_s), state.ema)
            if state.ema is not None else None)
        jax.block_until_ready(state.opt_states)
    train_step = build_train_step(
        model, optimizers, train_cfg=model.train_cfg,
        ema_cfg=EmaConfig(momentum_policy='karras'), donate=True,
        offload_shardings=offload_shardings)
    t0 = time.perf_counter()
    state, logs = train_step(state, batch_data)
    loss0 = float(logs['loss'])
    log(f'train compile+first step: {time.perf_counter() - t0:.1f}s '
        f'(loss {loss0:.3f})')
    assert jnp.isfinite(loss0)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, logs = train_step(state, batch_data)
    _ = float(logs['loss'])   # host readback syncs the chain
    return (time.perf_counter() - t0) / iters, n_params


def bench_aot_12b(mesh_axes=None, batch_per_chip=1, latent=128, txt=512,
                  family='flux'):
    """Full-scale training evidence without full-scale hardware: AOT-compile
    the FULL FSDP distillation train step (tied teacher + Arc student,
    1024px latents, 2-NFE multi-step loss, optimizer + EMA) over a simulated
    v5p-8 mesh ({data:2, fsdp:4}, the flagship _mesh_train.py layout) and
    report the compiled program's per-chip memory + collective totals from
    the optimized HLO. No parameters are materialized — ``.lower()`` runs on
    ShapeDtypeStructs carrying the exact shardings ``shard_state`` computes.

    ``family='flux'`` audits the FLUX-12B geometry (19j+38s);
    ``family='qwen'`` the Qwen-Image-20B geometry (60 masked joint blocks,
    joint_attention_dim 3584, teacher CFG through the masked flash path) —
    the reference ships 2-8-GPU Qwen FSDP training
    (reference configs/qwen/_fsdp_train.py:1).

    The fit claim: per-chip (argument + temp) bytes must sit inside a v5p
    chip's 95 GB HBM — the TPU analogue of the reference's measured
    ~16 GB/GPU (FLUX) / ~20 GB/GPU (Qwen) FSDP-8 numbers (BASELINE.md VRAM
    table).
    """
    import numpy as np
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from arcflow_tpu.models import LatentDiffusionTextImage
    from arcflow_tpu.parallel import (audit_compiled, batch_axes, make_mesh,
                                      param_spec_for,
                                      set_activation_sharding,
                                      stacked_param_spec, tree_bytes)
    from arcflow_tpu.runner import EmaConfig, TrainState, build_train_step

    mesh = make_mesh(dict(mesh_axes or {'data': 2, 'fsdp': 4}))
    set_activation_sharding(mesh)
    if family == 'qwen':
        net = dict(in_channels=64, num_layers=60, attention_head_dim=128,
                   num_attention_heads=24, joint_attention_dim=3584,
                   checkpointing=True)
        student = dict(type='ArcQwenImageTransformer2DModel', patch_size=2,
                       num_gaussians=16, lora_rank=256, **net)
        teacher_net = dict(type='QwenImageTransformer2DModel', patch_size=2,
                           **net)
        text_dim, shift = 3584, 3.1
        guidance_cfg = {}
    else:
        net = dict(in_channels=64, num_layers=19, num_single_layers=38,
                   attention_head_dim=128, num_attention_heads=24,
                   joint_attention_dim=4096, pooled_projection_dim=768,
                   guidance_embeds=True, checkpointing=True)
        student = dict(type='ArcFluxTransformer2DModel', patch_size=2,
                       num_gaussians=16, lora_rank=256, **net)
        teacher_net = dict(type='FluxTransformer2DModel', patch_size=2,
                           **net)
        text_dim, shift = 4096, 3.2
        guidance_cfg = dict(distilled_guidance_scale=3.5,
                            teacher_distilled_guidance_scale=3.5)
    model = LatentDiffusionTextImage(
        diffusion=dict(
            type='ArcFlowImitationDataFree', policy_type='ArcFlow',
            denoising=student,
            flow_loss=dict(type='DiffusionMSELoss',
                           data_info=dict(pred='u_t_pred', target='u_t'),
                           rescale_cfg=dict(scale=30.0)),
            num_timesteps=1,
            timestep_sampler=dict(type='ContinuousTimeStepSampler',
                                  shift=shift)),
        teacher=dict(type='GaussianFlow', denoising=teacher_net,
                     num_timesteps=1),
        tie_teacher=True, frozen_dtype='bfloat16',
        latent_shape=(latent, latent, 16), text_embed_dim=text_dim,
        pooled_dim=768,
        train_cfg=dict(nfe=2, timestep_ratio=1.0, total_substeps=128,
                       num_intermediate_states=4, window_substeps=3,
                       gm_dropout=0.1, num_decay_iters=100,
                       teacher_guidance_scale=2.0,
                       diffusion_grad_clip=50.0, **guidance_cfg),
        test_cfg=dict(nfe=2, timestep_ratio=1.0))

    optimizers = {'diffusion': optax.adamw(1e-4)}
    t0 = time.perf_counter()
    trainable, frozen = jax.eval_shape(model.init_params,
                                       jax.random.PRNGKey(0))
    state = jax.eval_shape(
        lambda t, f: TrainState.create(jax.random.PRNGKey(1), t, f,
                                       optimizers, ema_keys=model.ema_keys),
        trainable, frozen)
    n_params = sum(x.size for x in jax.tree.leaves((trainable, frozen)))
    log(f'abstract {family} train state: {n_params / 1e9:.2f}B params '
        f'({time.perf_counter() - t0:.1f}s)')

    fsdp = mesh.shape.get('fsdp', 1)
    pipe = mesh.shape.get('pipe', 1)

    def abstract(path, sd):
        ps = '/'.join(str(getattr(kk, 'key', kk)) for kk in path)
        if pipe > 1 and 'blocks' in ps:
            # pipeline placement: the scan-stacked layer dim over 'pipe'
            # (each stage owns its layers; weights never all-gather)
            spec = stacked_param_spec(sd, 'pipe', pipe, 'fsdp', fsdp)
        else:
            spec = param_spec_for(sd, 'fsdp', fsdp)
        sh = NamedSharding(mesh, spec)
        return jax.ShapeDtypeStruct(sd.shape, sd.dtype, sharding=sh)

    state_abs = jax.tree_util.tree_map_with_path(abstract, state)
    n_dev = int(np.prod(list(mesh.shape.values())))
    bs = batch_per_chip * n_dev
    bsh = NamedSharding(mesh, P(tuple(batch_axes(mesh))))

    def babs(shape, dtype=jnp.float32):
        return jax.ShapeDtypeStruct(shape, dtype, sharding=bsh)

    if family == 'qwen':
        embeds = dict(encoder_hidden_states=babs((bs, txt, text_dim)),
                      encoder_hidden_states_mask=babs((bs, txt), jnp.int32))
    else:
        embeds = dict(encoder_hidden_states=babs((bs, txt, text_dim)),
                      pooled_projections=babs((bs, 768)))
    batch = dict(
        latents=babs((bs, latent, latent, 16)),
        prompt_embed_kwargs=dict(embeds),
        negative_prompt_embed_kwargs=dict(embeds))

    train_step = build_train_step(
        model, optimizers, train_cfg=model.train_cfg,
        ema_cfg=EmaConfig(momentum_policy='karras'), donate=True)
    t0 = time.perf_counter()
    lowered = train_step.lower(state_abs, batch)
    log(f'lowered in {time.perf_counter() - t0:.1f}s; compiling...')
    t0 = time.perf_counter()
    compiled = lowered.compile()
    log(f'compiled in {time.perf_counter() - t0:.1f}s')
    stats = audit_compiled(compiled)
    hlo = compiled.as_text()
    remat_warnings = hlo.count('Involuntary full rematerialization')
    state_bytes = tree_bytes(state)
    return dict(mesh=dict(mesh.shape), n_params=n_params,
                global_batch=bs, state_bytes=state_bytes,
                collectives=stats['collectives'], memory=stats['memory'],
                remat_warnings=remat_warnings)


def bench_aot_infer(mesh_axes, latent=128, txt=512, sp_mode='ulysses',
                    single_chip_ms=None, family='flux'):
    """Multi-chip evidence for the inference north star (<1 s on v5p-8):
    AOT-compile the FULL quantized 2-NFE sampling program over a simulated
    v5p-8 inference mesh (sp x tensor [x fsdp], the single-image layout) and
    report per-chip memory, collective bytes/counts, remat warnings, and a
    roofline latency estimate.

    ``family='flux'``: the 12B w8a8 program (int8 weights + dynamic int8
    activations). ``family='qwen'``: the 20.6B w4a8 program — nibble-packed
    group-128 int4 weights through the Pallas grouped matmul, int8
    activations, MASKED (segment-ids) flash attention — the fastest
    measured single-chip Qwen mode.

    No parameters materialize — the quantized tree is eval_shape'd through
    the real ``quantize_weights_int{8,4}`` transform and lowered as
    ShapeDtypeStructs carrying ``param_spec_for_path`` shardings (the same
    placement rule the serving pipeline's ``shard()`` uses).

    Roofline model (assumptions recorded in the artifact):
      * compute: the MEASURED single-chip transformer per-image time
        (817.0 ms FLUX w8a8 post-splash-attention / 1045 ms Qwen w4a8,
        full geometry) divided by the axes that
        partition compute for batch 1 — 'tensor' x 'sp' (fsdp only shards
        storage at batch 1);
      * comm: per-chip collective bytes from the optimized HLO (SPMD module
        shapes are per-device) at an effective 1e11 B/s ICI rate per chip —
        conservative for a v5p 3D torus (6 links/chip, ~90 GB/s each);
      * latency bounds: max(compute, comm) if perfectly overlapped,
        compute + comm fully serial.
    """
    import numpy as np
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P
    from arcflow_tpu.diffusion import (ArcFlowPolicy,
                                       ContinuousTimeStepSampler,
                                       momentum_integration)
    from arcflow_tpu.models import (ArcFluxTransformer2DModel,
                                    ArcQwenImageTransformer2DModel)
    from arcflow_tpu.parallel import (audit_compiled, make_mesh,
                                      param_spec_for_path,
                                      set_activation_sharding)
    from arcflow_tpu.utils.quantize import (quantize_weights_int4,
                                            quantize_weights_int8,
                                            set_act_quant)

    mesh = make_mesh(dict(mesh_axes))
    set_activation_sharding(mesh, sp_mode=sp_mode)
    set_act_quant(True)
    b = 1
    if family == 'qwen':
        # measured single-chip w4a8 (README "serving throughput"):
        # 1157 ms e2e incl. 112 ms Wan-VAE decode -> 1045 ms transformer
        single_chip_ms = single_chip_ms or 1045.0
        quant_fn, mode = quantize_weights_int4, 'w4a8'
        model = ArcQwenImageTransformer2DModel(
            patch_size=2, num_gaussians=16, in_channels=64, num_layers=60,
            attention_head_dim=128, num_attention_heads=24,
            joint_attention_dim=3584, checkpointing=False,
            dtype=jnp.bfloat16)
        sampler = ContinuousTimeStepSampler(num_timesteps=1, shift=3.1)
        mask = (jnp.arange(txt)[None, :] <
                jnp.full((b, 1), int(txt * 0.75))).astype(jnp.int32)
        inputs = dict(
            hidden_states=jnp.zeros((b, latent, latent, 16), jnp.bfloat16),
            encoder_hidden_states=jnp.zeros((b, txt, 3584), jnp.bfloat16),
            encoder_hidden_states_mask=mask)
    else:
        single_chip_ms = single_chip_ms or 817.0
        quant_fn, mode = quantize_weights_int8, 'w8a8'
        model = ArcFluxTransformer2DModel(
            patch_size=2, num_gaussians=16, in_channels=64,
            num_layers=19, num_single_layers=38,
            attention_head_dim=128, num_attention_heads=24,
            joint_attention_dim=4096, pooled_projection_dim=768,
            guidance_embeds=True, checkpointing=False, dtype=jnp.bfloat16)
        sampler = ContinuousTimeStepSampler(num_timesteps=1, shift=3.2)
        inputs = dict(
            hidden_states=jnp.zeros((b, latent, latent, 16), jnp.bfloat16),
            encoder_hidden_states=jnp.zeros((b, txt, 4096), jnp.bfloat16),
            pooled_projections=jnp.zeros((b, 768), jnp.bfloat16),
            guidance=jnp.full((b,), 3.5))

    def init_fn(rng):
        p = model.init(rng, t=jnp.ones((b,)), **inputs)['params']
        return jax.tree.map(lambda x: x.astype(jnp.bfloat16), p)

    t0 = time.perf_counter()
    shapes = jax.eval_shape(init_fn, jax.random.PRNGKey(0))
    q_shapes, s_shapes = jax.eval_shape(quant_fn, shapes)
    variables = {'params': q_shapes, 'quant': s_shapes}

    def abstract(path, sd):
        ps = '/'.join(str(getattr(kk, 'key', kk)) for kk in path)
        spec = param_spec_for_path(ps, sd, mesh)
        return jax.ShapeDtypeStruct(sd.shape, sd.dtype,
                                    sharding=NamedSharding(mesh, spec))
    variables_abs = jax.tree_util.tree_map_with_path(abstract, variables)
    n_params = count_logical_params(
        {'params': q_shapes, 'quant': s_shapes})
    log(f'abstract {family} {mode} tree: {n_params / 1e9:.2f}B params '
        f'({time.perf_counter() - t0:.1f}s)')

    extra_keys = tuple(k for k in inputs if k != 'hidden_states')

    def sample_2nfe(variables, noise, *extra):
        kw = dict(zip(extra_keys, extra))
        x = noise
        raw = jnp.array([1.0, 0.5, 0.0])
        for i in range(2):
            raw_src = jnp.full((b,), raw[i])
            sigma_src = sampler.warp_t(raw_src)
            out = model.apply(variables, x, sigma_src, **kw)
            policy = ArcFlowPolicy.create(out, x, sigma_src)
            sigma_dst = sampler.warp_t(jnp.full((b,), raw[i + 1]))
            x = momentum_integration(policy, x, sigma_src, sigma_dst).astype(
                jnp.bfloat16)
        return x

    rep = NamedSharding(mesh, P())
    arg_abs = [jax.ShapeDtypeStruct(v.shape, v.dtype, sharding=rep)
               for v in ([inputs['hidden_states']]
                         + [inputs[k] for k in extra_keys])]
    t0 = time.perf_counter()
    lowered = jax.jit(sample_2nfe).lower(variables_abs, *arg_abs)
    log(f'lowered in {time.perf_counter() - t0:.1f}s; compiling...')
    t0 = time.perf_counter()
    compiled = lowered.compile()
    log(f'compiled in {time.perf_counter() - t0:.1f}s')
    stats = audit_compiled(compiled)
    remat_warnings = compiled.as_text().count(
        'Involuntary full rematerialization')

    comm_bytes = sum(v['bytes'] for v in stats['collectives'].values())
    par = 1
    for a in ('tensor', 'sp'):
        par *= mesh.shape.get(a, 1)
    ici_bw = 1e11
    compute_ms = single_chip_ms / par
    comm_ms = comm_bytes / ici_bw * 1e3
    mem = stats['memory'] or {}
    per_chip = mem.get('argument_bytes', 0) + mem.get('temp_bytes', 0)
    return dict(
        mesh=dict(mesh.shape), sp_mode=sp_mode, family=family, mode=mode,
        n_params=n_params, latent=latent, txt=txt, batch=b,
        collectives=stats['collectives'], memory=stats['memory'],
        per_chip_bytes=per_chip, remat_warnings=remat_warnings,
        roofline=dict(
            single_chip_transformer_ms=single_chip_ms,
            compute_partition=par, compute_ms=round(compute_ms, 1),
            comm_bytes_per_chip=comm_bytes,
            ici_bw_assumed_bytes_per_s=ici_bw,
            comm_ms=round(comm_ms, 1),
            overlapped_ms=round(max(compute_ms, comm_ms), 1),
            serial_ms=round(compute_ms + comm_ms, 1),
            note=f'compute = measured single-chip {mode} per-image / '
                 '(tensor*sp); comm = per-chip HLO collective bytes at an '
                 'effective 100 GB/s; VAE decode (+~90 ms measured single-'
                 'chip) excluded'))


def try_bench(layers, single_layers, iters=8, mesh=None, batch=1,
              int8=False, w8a8=False, int4=False, sp_mode='ulysses'):
    fn, args, model = build(layers, single_layers, mesh=mesh, batch=batch,
                            int8=int8, w8a8=w8a8, int4=int4,
                            sp_mode=sp_mode)
    n_params = count_logical_params(args[0])
    log(f'config: {layers} joint + {single_layers} single blocks, '
        f'{n_params / 1e9:.2f}B params')
    params, noise, txt, pooled, g = args
    # warmup / compile (host readback forces real completion — async remote
    # dispatch makes block_until_ready unreliable for timing here)
    t0 = time.perf_counter()
    out = fn(params, noise, txt, pooled, g)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    log(f'compile+first run: {time.perf_counter() - t0:.1f}s')
    # timing: chain `iters` dependent steps, sync at both ends
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(params, out, txt, pooled, g)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    per_image = (time.perf_counter() - t0) / iters / batch
    return per_image, n_params, (fn, (params, out, txt, pooled, g))


def bench_sustained(fn, args, batch=1, n_images=8, latent=128,
                    family='flux'):
    """Sustained serving throughput (VERDICT r04 weak #2): a pipelined
    generate-N loop — dispatch transformer(i+1) and decode(i) before the
    host readback of image i-1, so host readback/postprocess (12.6 MB/image
    over the tunnel) overlaps device compute via JAX async dispatch. The
    chip has ONE TensorCore, so the transformer and VAE-decode programs
    still serialize on-device — this measures the true img/s a serving
    loop sustains, alongside the serial p50 latency the default path
    reports.

    Returns seconds/image including the VAE decode and the amortized
    host readback of every decoded image."""
    import numpy as np
    if family == 'qwen':
        from arcflow_tpu.models import PretrainedVAEQwenImage
        vae = PretrainedVAEQwenImage(dtype='bfloat16')
        vae_params = jax.jit(vae.init_params, static_argnums=(1,))(
            jax.random.PRNGKey(0), 64)
    else:
        from arcflow_tpu.models import PretrainedVAEDecoder
        vae = PretrainedVAEDecoder(latent_channels=16, dtype='bfloat16')
        vae_params = jax.jit(vae.init_params, static_argnums=(1,))(
            jax.random.PRNGKey(0), latent * 8)
    # serve uint8 (what an image server ships): 4x less readback than fp32
    # — over the tunneled chip the per-image readback does NOT fully hide
    # behind compute, so its size is on the measured path
    decode = jax.jit(
        lambda p, z: (jnp.clip(vae.decode(p, z) * 0.5 + 0.5, 0.0, 1.0)
                      * 255.0).astype(jnp.uint8))
    params, lat, *rest = args
    # compile/warm both programs on the loop's exact layouts
    lat = fn(params, lat, *rest)
    img = decode(vae_params, lat)
    _ = np.asarray(img)
    t0 = time.perf_counter()
    pending = None
    for _ in range(n_images):
        # fn donates `lat`; its only other consumer (last iteration's
        # decode) was dispatched before it, and the device executes
        # programs in dispatch order
        new_lat = fn(params, lat, *rest)
        img = decode(vae_params, new_lat)
        if pending is not None:
            _ = np.asarray(pending)   # image i-1 readback overlaps compute
        pending = img
        lat = new_lat
    _ = np.asarray(pending)           # sync: last image fully on host
    return (time.perf_counter() - t0) / (n_images * batch)


def main():
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument('--layers', type=int, default=None,
                   help='pin joint-block depth (default: largest that fits)')
    p.add_argument('--single', type=int, default=None)
    p.add_argument('--sharded', action='store_true',
                   help='shard the FULL 12B geometry over all devices '
                        '(fsdp mesh); use on multi-chip hosts')
    p.add_argument('--batch', type=int, default=1)
    p.add_argument('--bf16', action='store_true',
                   help='force bf16 weights (largest truncated geometry '
                        'that fits HBM + 12B FLOP extrapolation) instead '
                        'of the default measured int8 full-12B run')
    p.add_argument('--w8a8', action='store_true',
                   help='int8 weights AND dynamic per-token int8 '
                        'activations: the big matmuls run at the MXU int8 '
                        'rate (~1.7x bf16 ceiling on v5e)')
    p.add_argument('--int8', action='store_true',
                   help='weight-only int8 (the full 12B geometry fits one '
                        'chip)')
    p.add_argument('--int4', action='store_true',
                   help='weight-only int4, group-128 scales (quarter '
                        'weight HBM: full FLUX-12B in 6 GB, full Qwen-20B '
                        'in 10.2 GB on one chip)')
    p.add_argument('--mesh', type=str, default=None,
                   help="explicit mesh, e.g. 'sp=4,tensor=2' for the "
                        'single-image latency (sequence-parallel) config')
    p.add_argument('--sp-mode', choices=('ulysses', 'ring'),
                   default='ulysses',
                   help='sequence-parallel layout under --mesh sp>1: '
                        'all-to-all to head shards (ulysses, default) or '
                        'ring/context-parallel K/V rotation (long-context; '
                        'Pallas flash per hop)')
    p.add_argument('--frozen-int8', action='store_true',
                   help='with --train: int8-quantize the frozen trunk '
                        '(weights never update) — halves frozen HBM, '
                        'roughly doubles the measurable on-chip training '
                        'scale; quality gated by '
                        'tests/test_quantized_quality.py')
    p.add_argument('--frozen-int4', action='store_true',
                   help='with --train: nibble-packed group-128 int4 frozen '
                        'trunk — quarter of bf16, halving trunk HBM again '
                        'vs --frozen-int8; quality gated by the int4-teacher '
                        'distillation run in tests/test_quantized_quality.py')
    p.add_argument('--optim', choices=('adamw', 'adamw8bit'),
                   default='adamw',
                   help="with --train: optimizer for the measured step. "
                        "'adamw8bit' is the reference's bitsandbytes "
                        'memory-efficient slot (maps to Adafactor here, '
                        'runner/optim.py) — dropping the fp32 Adam m/v '
                        'pair frees ~8 bytes/trainable param of HBM for '
                        'bigger geometries')
    p.add_argument('--offload', action='store_true',
                   help='with --train: keep optimizer slots + EMA in the '
                        "TPU host's pinned memory (memory_kind="
                        "'pinned_host'), streamed on/off-device around the "
                        'update — frees their HBM argument bytes for '
                        'bigger geometries at the cost of per-step PCIe '
                        'traffic')
    p.add_argument('--train', action='store_true',
                   help='benchmark the full distillation optimizer step '
                        '(10 DiT forwards + backward, clip, EMA) instead '
                        'of inference; largest full-width geometry that '
                        'fits one chip at 512px latents')
    p.add_argument('--qwen', action='store_true',
                   help='Qwen-Image geometry (60 joint blocks, dim 3072, '
                        'masked joint attention on the segment-ids flash '
                        'path): largest int8 depth that fits one chip, '
                        'FLOP-scaled to the 20B full geometry')
    p.add_argument('--aot-infer', action='store_true',
                   help='AOT-compile the FULL 12B w8a8 2-NFE sampling '
                        'program over a simulated v5p-8 inference mesh '
                        '(--mesh, default sp=4,tensor=2) and report '
                        'per-chip memory + collectives + roofline latency; '
                        'merges into AOT_INFER.json (no TPU needed). With '
                        '--qwen: the 20.6B w4a8 masked-flash program -> '
                        'AOT_INFER_QWEN.json')
    p.add_argument('--aot-12b', action='store_true',
                   help='with --train: AOT-compile the FULL 12B FSDP train '
                        'step on a simulated v5p-8 CPU mesh and report '
                        'per-chip memory + collective totals (no TPU '
                        'needed); writes AOT_12B.json next to this script. '
                        'With --qwen: the 20.6B Qwen step -> AOT_20B.json')
    p.add_argument('--aot-20b', action='store_true',
                   help='with --train: alias for --aot-12b --qwen (the '
                        'full 60-block 20.6B Qwen distillation step)')
    args_cli = p.parse_args()

    if args_cli.aot_infer:
        os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                                   + ' --xla_force_host_platform_device_count=8')
        jax.config.update('jax_platforms', 'cpu')
        family = 'qwen' if args_cli.qwen else 'flux'
        axes = {'sp': 4, 'tensor': 2}
        if args_cli.mesh:
            axes = {k: int(v) for k, v in
                    (kv.split('=') for kv in args_cli.mesh.split(','))}
        out = bench_aot_infer(axes, sp_mode=args_cli.sp_mode, family=family)
        fname = 'AOT_INFER_QWEN.json' if family == 'qwen' \
            else 'AOT_INFER.json'
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            fname)
        all_out = {}
        if os.path.exists(path):
            with open(path) as f:
                all_out = json.load(f)
        key = ','.join(f'{k}={v}' for k, v in out['mesh'].items()) + \
            (f'/{args_cli.sp_mode}' if args_cli.sp_mode != 'ulysses' else '')
        all_out[key] = out
        with open(path, 'w') as f:
            json.dump(all_out, f, indent=1)
        log(f'wrote {path} [{key}]')
        rl = out['roofline']
        hbm = 95e9   # v5p HBM per chip
        print(json.dumps(dict(
            metric=f'roofline latency, {out["n_params"] / 1e9:.2f}B '
                   f'{family} {out["mode"]} 2-NFE sampling AOT-compiled '
                   f'on simulated v5p-8 inference mesh {out["mesh"]} '
                   f'({out["per_chip_bytes"] / 1e9:.2f} GB/chip of '
                   f'{hbm / 1e9:.0f} GB, {out["remat_warnings"]} remat '
                   f'warnings; compute {rl["compute_ms"]} ms + comm '
                   f'{rl["comm_ms"]} ms)',
            value=rl['serial_ms'], unit='ms',
            vs_baseline=round(1000.0 / rl['serial_ms'], 3))))
        return

    if args_cli.train and (args_cli.aot_12b or args_cli.aot_20b):
        # simulated v5p-8: 8 CPU devices (env must be set before the first
        # backend touch; the axon sitecustomize overrides JAX_PLATFORMS so
        # the platform switch must go through jax.config)
        os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                                   + ' --xla_force_host_platform_device_count=8')
        jax.config.update('jax_platforms', 'cpu')
        family = 'qwen' if (args_cli.qwen or args_cli.aot_20b) else 'flux'
        axes = None
        if args_cli.mesh:
            axes = {k: int(v) for k, v in
                    (kv.split('=') for kv in args_cli.mesh.split(','))}
        out = bench_aot_12b(mesh_axes=axes, batch_per_chip=args_cli.batch,
                            family=family)
        # a pipe-mesh audit gets its own artifact so the flagship FSDP
        # evidence (AOT_12B.json / AOT_20B.json) is never clobbered by a PP
        # experiment
        suffix = '_PP' if (axes or {}).get('pipe', 1) > 1 else ''
        stem = 'AOT_20B' if family == 'qwen' else 'AOT_12B'
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            f'{stem}{suffix}.json')
        with open(path, 'w') as f:
            json.dump(out, f, indent=1)
        log(f'wrote {path}')
        mem = out['memory'] or {}
        per_chip = (mem.get('argument_bytes', 0) + mem.get('temp_bytes', 0))
        hbm = 95e9   # v5p HBM per chip
        print(json.dumps(dict(
            metric=f'per-chip bytes, {out["n_params"] / 1e9:.2f}B {family} '
                   f'FSDP train step AOT-compiled on '
                   f'simulated v5p-8 mesh {out["mesh"]} '
                   f'(global batch '
                   f'{out["global_batch"]}, 1024px; '
                   f'{out["remat_warnings"]} remat warnings; '
                   f'all-gather {out["collectives"]["all-gather"]["bytes"] / 1e9:.2f} GB)',
            value=round(per_chip / 1e9, 3), unit='GB/chip',
            vs_baseline=round(hbm / per_chip, 3) if per_chip else 0.0)))
        return

    setup_jax()
    log(f'devices: {jax.devices()}')

    if args_cli.train:
        family = 'qwen' if args_cli.qwen else 'flux'
        if args_cli.layers is None:
            # ladder in SUBPROCESSES: after an OOM the (tunneled) TPU does
            # not reclaim the failed attempt's buffers promptly in-process —
            # a config that fits on a clean chip then OOMs too. One process
            # per attempt guarantees a clean device state.
            import subprocess
            # measured r4: 7j+14s (4.68B) fits at 1359 ms/step, 8j+16s
            # runtime-OOMs — start at the known ceiling
            ladder = [(7, 14), (6, 12), (5, 10), (4, 8), (3, 6), (2, 4)]
            if args_cli.frozen_int8:
                # int8 frozen trunk: the HBM budget doubles the reachable
                # scale — start the ladder at the larger geometries
                ladder = [(10, 20), (8, 16), (6, 12), (4, 8)]
            if args_cli.frozen_int4:
                # int4 trunk halves frozen HBM again vs int8 (6.65B fit at
                # int8; 12j+24s=7.9B missed by 2.15 GB — int4 recovers ~4 GB
                # there)
                ladder = [(14, 28), (13, 26), (12, 24), (10, 20)]
            quant_flag = (['--frozen-int4'] if args_cli.frozen_int4 else
                          ['--frozen-int8'] if args_cli.frozen_int8 else [])
            if args_cli.offload:
                # opt slots + EMA leave the HBM argument accounting: the
                # ladder starts above the measured on-device ceilings
                quant_flag += ['--offload']
                ladder = ([(13, 26), (12, 24), (11, 22)] + ladder
                          if args_cli.frozen_int8 or args_cli.frozen_int4
                          else [(9, 18), (8, 16)] + ladder)
            if args_cli.optim == 'adamw8bit' and args_cli.frozen_int4:
                # no fp32 m/v + int4 trunk: the ladder reaches past 12j
                ladder = [(19, 38), (17, 34), (16, 32)] + ladder
            if family == 'qwen':
                # Qwen blocks are ~360M each; measured on the 16 GB chip:
                # int8 trunk 17j=6.11B fits (1107 ms/step), 18j runtime-OOMs,
                # 20j compile-OOMs by 306 MB; bf16 13j=4.69B fits (900 ms).
                # --frozen-int4 / --optim adamw8bit intentionally reuse the
                # int8-measured ladder: r4 measured that neither unlocks a
                # bigger FLUX geometry (the binding term is train-step
                # TEMPS, not weight bytes — CLAUDE.md), so there is no
                # qwen-specific int4 tier until that changes
                ladder = [(17, 0), (16, 0), (12, 0)] if quant_flag \
                    else [(13, 0), (11, 0), (9, 0), (6, 0)]
            for layers, single in ladder:
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), '--train',
                     '--layers', str(layers), '--single', str(single),
                     '--batch', str(args_cli.batch),
                     '--optim', args_cli.optim] + quant_flag
                    + (['--qwen'] if family == 'qwen' else []),
                    capture_output=True, text=True)
                sys.stderr.write(r.stderr)
                line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() \
                    else ''
                if r.returncode == 0 and line.startswith('{') and \
                        json.loads(line)['value'] > 0:
                    print(line)
                    return
                log(f'train config ({layers},{single}) subprocess failed')
            print(json.dumps(dict(metric='train steps/sec', value=0.0,
                                  unit='steps/s', vs_baseline=0.0)))
            return
        layers = args_cli.layers
        single = 0 if family == 'qwen' else (args_cli.single or layers * 2)
        fq = ('int4' if args_cli.frozen_int4 else
              'int8' if args_cli.frozen_int8 else None)
        sec, n_params = bench_train(layers, single, batch=args_cli.batch,
                                    frozen_quant=fq, optim=args_cli.optim,
                                    family=family,
                                    offload=args_cli.offload)
        log(f'train step: {sec * 1000:.1f} ms')
        trunk = f', {fq} frozen trunk' if fq else ''
        if args_cli.offload:
            trunk += ', host-offloaded opt+EMA'
        if args_cli.optim == 'adamw8bit':
            trunk += ', adafactor (AdamW8bit slot)'
        name = ('ArcQwen' if family == 'qwen' else 'ArcFlux')
        geo = f'{layers}j' if family == 'qwen' else f'{layers}j+{single}s'
        print(json.dumps(dict(
            metric=f'distillation optimizer steps/sec, 512px 2-NFE '
                   f'({name} {geo} {n_params / 1e9:.2f}B '
                   f'tied teacher+student{trunk}, 10 DiT fwd + 1 bwd per '
                   f'step, measured on one chip)',
            value=round(1.0 / sec, 4), unit='steps/s/chip',
            vs_baseline=0.0)))
        return

    if args_cli.qwen:
        # Qwen 20B: int8 (20.4 GB) overflows one 16 GB chip, but int4
        # (10.2 GB, s4 packed in HBM) fits the FULL geometry — measure
        # that first; fall back to the deepest int8 depth FLOP-scaled to
        # 60 blocks (every joint block is identical; embedders/heads noise)
        use_int8 = not args_cli.bf16
        if args_cli.layers:
            attempts = [(args_cli.layers, dict(int8=use_int8,
                                               w8a8=args_cli.w8a8))]
        elif args_cli.bf16:
            attempts = [(d, dict()) for d in (20, 16, 12)]
        elif args_cli.int4:
            # w4a8 when combined with --w8a8: int4-resident weights, one
            # K=group int8 dot per scale group at the MXU int8 rate
            attempts = [(60, dict(int4=True, w8a8=args_cli.w8a8))]
        elif args_cli.w8a8:
            attempts = [(d, dict(int8=True, w8a8=True))
                        for d in (44, 40, 36, 32)]
        else:
            attempts = [(60, dict(int4=True))] + \
                [(d, dict(int8=True)) for d in (44, 40, 36, 32)]
        for depth, mode_kw in attempts:
            try:
                per_img, n_params, qloop = try_bench_qwen(
                    depth, batch=args_cli.batch, **mode_kw)
                break
            except Exception as e:  # noqa: BLE001 - OOM fallback
                log(f'qwen depth {depth} {mode_kw} failed: '
                    f'{type(e).__name__}: {str(e)[:200]}')
        else:
            print(json.dumps(dict(
                metric='images/sec/chip 1024px 2-NFE Qwen', value=0.0,
                unit='img/s', vs_baseline=0.0)))
            return
        qsustained = None
        try:
            qsustained = bench_sustained(qloop[0], qloop[1],
                                         batch=args_cli.batch,
                                         family='qwen')
            log(f'qwen sustained serving loop: {qsustained * 1000:.1f} '
                f'ms/image ({1.0 / qsustained:.3f} img/s incl. decode + '
                f'readback)')
        except Exception as e:   # noqa: BLE001 - HBM headroom fallback
            log(f'qwen sustained bench failed ({type(e).__name__}: '
                f'{str(e)[:200]}); reporting serial only')
        del qloop   # frees the transformer tree before the VAE bench
        try:
            vae_decode_s = bench_qwen_vae_decode()
            log(f'Qwen VAE decode (1024px): {vae_decode_s * 1000:.1f} ms')
        except Exception as e:   # noqa: BLE001
            log(f'Qwen VAE decode bench failed ({type(e).__name__})')
            vae_decode_s = 0.0
        e2e = per_img + vae_decode_s
        ratio = 60.0 / depth
        e2e_20b = per_img * ratio + vae_decode_s
        target = 0.125
        mode = ('w4a8 (int4 group-128 weights, int8 acts)'
                if mode_kw.get('int4') and mode_kw.get('w8a8') else
                'weight-only int4 (group-128)' if mode_kw.get('int4') else
                'w8a8' if args_cli.w8a8 else
                'weight-only int8' if use_int8 else 'bf16')
        geom = ('FULL 20B geometry MEASURED' if depth == 60 else
                f'{depth}/60 joint blocks, 20B-geometry extrapolation '
                f'{1.0 / e2e_20b:.3f} img/s')
        qsus = (f'; sustained generate-N loop incl. per-image uint8 '
                f'readback {qsustained * 1000:.0f} ms/img'
                if qsustained is not None else '')
        metric = ('images/sec/chip, 1024px 2-NFE Qwen-Image e2e (ArcQwen '
                  f'{n_params / 1e9:.2f}B params {mode}, masked flash '
                  f'attention, + Wan VAE decode '
                  f'{vae_decode_s * 1000:.0f}ms; {geom}{qsus})')
        log(f'qwen per-image: {per_img * 1000:.1f} ms; e2e: '
            f'{e2e * 1000:.1f} ms; 20B extrapolated: '
            f'{e2e_20b * 1000:.1f} ms')
        print(json.dumps(dict(metric=metric, value=round(1.0 / e2e, 4),
                              unit='img/s/chip',
                              vs_baseline=round((1.0 / e2e_20b) / target,
                                                3))))
        return

    mesh = None
    use_int8 = (args_cli.int8 or args_cli.w8a8) or not (
        args_cli.bf16 or args_cli.sharded or args_cli.mesh
        or args_cli.int4 or args_cli.layers is not None)
    # DEFAULT mode is w8a8: the only single-chip mode under the 1 s north
    # star (981 ms vs 1139 ms weight-only), and its quality is now gated —
    # tests/test_quantized_quality.py holds the trained toy student's
    # in-support within 0.08 of fp32 through the same kernels, and
    # tests/test_pipelines.py holds w8-only sampling at cos>0.99 vs bf16.
    # --int8 selects weight-only int8 explicitly; --int4 weight-only int4.
    if use_int8 and not args_cli.int8:
        args_cli.w8a8 = True
    if args_cli.sharded or args_cli.mesh:
        from arcflow_tpu.parallel import make_mesh
        if args_cli.mesh:
            axes = {k: int(v) for k, v in
                    (kv.split('=') for kv in args_cli.mesh.split(','))}
        else:
            axes = {'fsdp': jax.device_count()}
        mesh = make_mesh(axes)
        log(f'sharded bench over {dict(mesh.shape)}')
        configs = [(args_cli.layers or 19, args_cli.single or 38, False)]
    elif use_int8:
        # DEFAULT: the FULL 12B FLUX geometry, measured (no extrapolation) —
        # int8 kernels fit one 16 GB chip; fall back to the bf16 truncated
        # ladder if anything in the int8 path fails
        configs = [(args_cli.layers or 19, args_cli.single or 38, True),
                   (8, 16, False), (6, 12, False), (4, 8, False)]
    elif args_cli.int4:
        configs = [(args_cli.layers or 19, args_cli.single or 38, False)]
    elif args_cli.layers is not None:
        configs = [(args_cli.layers, args_cli.single or args_cli.layers * 2,
                    False)]
    else:
        # largest full-width bf16 depth that fits chip HBM, keeping the 1:2
        # ratio; FLUX-12B is (19, 38)
        configs = [(8, 16, False), (6, 12, False), (4, 8, False), (2, 4, False)]

    for layers, single, int8_mode in configs:
        try:
            per_img, n_params, loop = try_bench(
                layers, single, mesh=mesh,
                batch=args_cli.batch,
                int8=int8_mode,
                w8a8=args_cli.w8a8 and int8_mode,
                int4=args_cli.int4,
                sp_mode=args_cli.sp_mode)
            break
        except Exception as e:  # noqa: BLE001 - OOM fallback
            log(f'config ({layers},{single},int8={int8_mode}) failed: '
                f'{type(e).__name__}: {str(e)[:200]}')
    else:
        print(json.dumps(dict(metric='images/sec/chip 1024px 2-NFE',
                              value=0.0, unit='img/s', vs_baseline=0.0)))
        return

    # sustained serving loop (pipelined transformer+decode+readback) — the
    # throughput a generate-N server actually sees; the transformer tree
    # must still be live, so this runs before the standalone decode bench
    sustained_s = None
    # batch 1 only: at --batch 2 the loop's decode temps OOM on top of the
    # 11.6 GB int8 tree, and the in-process OOM then poisons the device
    # for the standalone VAE bench (CLAUDE.md). Batch 2 is also a measured
    # NEGATIVE for throughput here: 1030 ms/image transformer vs 841 at
    # batch 1 (the 4608-token seq already saturates the MXU; doubling the
    # batch doubles HBM pressure past the sweet spot).
    if mesh is None and args_cli.batch == 1:
        try:
            sustained_s = bench_sustained(loop[0], loop[1],
                                          batch=args_cli.batch)
            log(f'sustained serving loop: {sustained_s * 1000:.1f} ms/image '
                f'({1.0 / sustained_s:.3f} img/s incl. decode + readback)')
        except Exception as e:   # noqa: BLE001 - HBM headroom fallback
            log(f'sustained bench failed ({type(e).__name__}: '
                f'{str(e)[:200]}); reporting serial only')
    del loop   # frees the transformer tree before the standalone VAE bench

    try:
        vae_decode_s = bench_vae_decode()
        log(f'VAE decode (1024px): {vae_decode_s * 1000:.1f} ms')
    except Exception as e:   # noqa: BLE001
        log(f'VAE decode bench failed ({type(e).__name__}); excluding')
        vae_decode_s = 0.0

    e2e = per_img + vae_decode_s
    imgs_per_sec = 1.0 / e2e
    target = 0.125  # north star: <1 s e2e on v5p-8 => 0.125 img/s/chip
    mode = ('w4a8 (int4 group-128 weights, int8 acts)'
            if args_cli.w8a8 and args_cli.int4
            else 'int8 weights + int8 activations (w8a8; trained-student '
            'quality gated within 0.08 in-support of fp32 by '
            'tests/test_quantized_quality.py)' if args_cli.w8a8
            else 'weight-only int4, group-128 scales' if args_cli.int4
            else 'weight-only int8, bf16 compute' if int8_mode else 'bf16')
    if (layers, single) == (19, 38):
        # the real thing: full 12B geometry, measured end to end. Headline
        # stays the serial per-image device time (transformer + decode,
        # chained — comparable across rounds); the sustained generate-N
        # loop (pipelined dispatch + per-image uint8 host readback) is
        # disclosed alongside: measured, readback does not fully hide
        # behind compute over the tunneled chip.
        sus = (f'sustained generate-N loop incl. per-image uint8 readback '
               f'{sustained_s * 1000:.0f} ms/img '
               f'({1.0 / sustained_s:.3f} img/s), '
               if sustained_s is not None else '')
        metric = ('images/sec/chip, 1024px 2-NFE e2e, FULL FLUX-12B '
                  f'geometry MEASURED on one chip ({mode}; 19j+38s blocks, '
                  f'{n_params / 1e9:.2f}B params; {sus}serial p50 '
                  f'{e2e * 1000:.0f} ms = transformer '
                  f'{per_img * 1000:.0f} + VAE decode '
                  f'{vae_decode_s * 1000:.0f} ms)')
        vs_baseline = imgs_per_sec / target
    else:
        # truncated-geometry fallback: FLOP-scale to the 12B geometry for
        # the vs_baseline figure (disclosed in the metric text)
        full_cost_ratio = (19 * 36 + 38 * 15) / (layers * 36 + single * 15)
        e2e_12b = per_img * full_cost_ratio + vae_decode_s
        metric = ('images/sec/chip, 1024px 2-NFE e2e (ArcFlux transformer '
                  f'{layers}j+{single}s blocks {n_params / 1e9:.2f}B params '
                  f'{mode} + VAE decode {vae_decode_s * 1000:.0f}ms; '
                  f'12B-geometry extrapolation {1.0 / e2e_12b:.3f} img/s)')
        vs_baseline = (1.0 / e2e_12b) / target
    result = dict(metric=metric, value=round(imgs_per_sec, 4),
                  unit='img/s/chip', vs_baseline=round(vs_baseline, 3))
    log(f'transformer per-image: {per_img * 1000:.1f} ms; '
        f'e2e: {e2e * 1000:.1f} ms')
    print(json.dumps(result))


if __name__ == '__main__':
    main()
