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

The model geometry auto-scales to chip HBM: full FLUX width (3072 hidden,
24 heads) with as many (joint, single) blocks as fit, keeping the reference's
1:2 joint:single ratio. Throughput for the full 12B geometry is reported by
FLOP-scaling from the largest fitting depth (printed in the JSON as context).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

from arcflow_tpu.utils import setup_jax


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(num_layers, num_single_layers, latent=128, txt=512, k=16,
          mesh=None, batch=1, int8=False):
    from arcflow_tpu.models import ArcFluxTransformer2DModel
    from arcflow_tpu.diffusion import (ArcFlowPolicy, ContinuousTimeStepSampler,
                                       momentum_integration)
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

    if int8:
        # weight-only int8: init on the host CPU (the fp32/bf16 12B tree
        # does not fit chip HBM), quantize per-output-channel, ship the
        # int8 kernels + scales to the device (11.6 GB -> fits one v5e)
        from arcflow_tpu.utils.quantize import quantize_weights_int8
        cpu = jax.devices('cpu')[0]
        log('initializing on host CPU for int8 quantization...')
        t0 = time.perf_counter()
        with jax.default_device(cpu):
            host_inputs = {kk: jnp.zeros(v.shape, v.dtype)
                           for kk, v in inputs.items()}
            p = model.init(jax.random.PRNGKey(0), t=jnp.ones((b,)),
                           **host_inputs)['params']
            p = jax.tree.map(lambda x: x.astype(jnp.bfloat16), p)
            qp, quant = quantize_weights_int8(p)
            del p
        log(f'host init+quantize: {time.perf_counter() - t0:.0f}s')
        dev = jax.devices()[0]
        variables = jax.device_put({'params': qp, 'quant': quant}, dev)
        jax.block_until_ready(variables)

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
        # >1 devices exist — the 1-chip bench env uses mesh=None)
        from jax.sharding import NamedSharding
        from arcflow_tpu.parallel import (param_spec_for,
                                          set_activation_sharding)
        set_activation_sharding(mesh)
        fsdp = mesh.shape.get('fsdp', 1)
        tensor = mesh.shape.get('tensor', 1)
        shapes = jax.eval_shape(init_fn, ks[3])
        shardings = jax.tree.map(
            lambda x: NamedSharding(mesh, param_spec_for(
                x, 'fsdp', fsdp, 'tensor', tensor)), shapes)
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


def try_bench(layers, single_layers, iters=8, mesh=None, batch=1,
              int8=False):
    fn, args, model = build(layers, single_layers, mesh=mesh, batch=batch,
                            int8=int8)
    n_params = sum(x.size for x in jax.tree.leaves(args[0])
                   if hasattr(x, 'size'))
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
    return per_image, n_params


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
    p.add_argument('--int8', action='store_true',
                   help='weight-only int8 (the full 12B geometry fits one '
                        'chip; implies --layers 19 --single 38 by default)')
    p.add_argument('--mesh', type=str, default=None,
                   help="explicit mesh, e.g. 'sp=4,tensor=2' for the "
                        'single-image latency (sequence-parallel) config')
    args_cli = p.parse_args()

    setup_jax()
    log(f'devices: {jax.devices()}')

    mesh = None
    if args_cli.sharded or args_cli.mesh:
        from arcflow_tpu.parallel import make_mesh
        if args_cli.mesh:
            axes = {k: int(v) for k, v in
                    (kv.split('=') for kv in args_cli.mesh.split(','))}
        else:
            axes = {'fsdp': jax.device_count()}
        mesh = make_mesh(axes)
        log(f'sharded bench over {dict(mesh.shape)}')
        configs = [(args_cli.layers or 19, args_cli.single or 38)]
    elif args_cli.int8:
        configs = [(args_cli.layers or 19, args_cli.single or 38)]
    elif args_cli.layers is not None:
        configs = [(args_cli.layers, args_cli.single or args_cli.layers * 2)]
    else:
        # largest full-width depth that fits chip HBM, keeping the 1:2
        # ratio; FLUX-12B is (19, 38)
        configs = [(8, 16), (6, 12), (4, 8), (2, 4)]

    for layers, single in configs:
        try:
            per_img, n_params = try_bench(layers, single, mesh=mesh,
                                          batch=args_cli.batch,
                                          int8=args_cli.int8)
            break
        except Exception as e:  # noqa: BLE001 - OOM fallback
            log(f'config ({layers},{single}) failed: {type(e).__name__}: '
                f'{str(e)[:200]}')
    else:
        print(json.dumps(dict(metric='images/sec/chip 1024px 2-NFE',
                              value=0.0, unit='img/s', vs_baseline=0.0)))
        return

    try:
        vae_decode_s = bench_vae_decode()
        log(f'VAE decode (1024px): {vae_decode_s * 1000:.1f} ms')
    except Exception as e:   # noqa: BLE001
        log(f'VAE decode bench failed ({type(e).__name__}); excluding')
        vae_decode_s = 0.0

    e2e = per_img + vae_decode_s
    imgs_per_sec = 1.0 / e2e
    # FLOP-scale the transformer part to the full 12B geometry
    full_cost_ratio = (19 * 36 + 38 * 15) / (layers * 36 + single * 15)
    e2e_12b = per_img * full_cost_ratio + vae_decode_s
    target = 0.125  # north star: <1 s e2e on v5p-8 => 0.125 img/s/chip
    result = dict(
        metric='images/sec/chip, 1024px 2-NFE e2e (ArcFlux transformer '
               f'{layers}j+{single}s blocks {n_params / 1e9:.2f}B params '
               f'+ VAE decode {vae_decode_s * 1000:.0f}ms; 12B-geometry '
               f'extrapolation {1.0 / e2e_12b:.3f} img/s)',
        value=round(imgs_per_sec, 4),
        unit='img/s/chip',
        vs_baseline=round((1.0 / e2e_12b) / target, 3))
    log(f'transformer per-image: {per_img * 1000:.1f} ms; '
        f'e2e: {e2e * 1000:.1f} ms')
    print(json.dumps(result))


if __name__ == '__main__':
    main()
