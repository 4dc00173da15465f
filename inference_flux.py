#!/usr/bin/env python
"""2-NFE ArcFlow-FLUX inference CLI (reference ``inference_flux.py``).

Offline usage (local model folders):
  python inference_flux.py --model-dir <flux_dir> --adapter <adapter.safetensors> \
      --prompt "a photo of a cat" --out out.png
"""

import argparse

from arcflow_tpu.utils import setup_jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--model-dir', required=True,
                   help='local diffusers-style FLUX transformer folder')
    p.add_argument('--adapter', default=None,
                   help='exported ArcFlow adapter safetensors')
    p.add_argument('--vae-dir', default=None)
    p.add_argument('--prompt', default='a photo of an astronaut riding a '
                                       'horse on the moon')
    p.add_argument('--prompt-embeds', default=None,
                   help='.npz with cached prompt embeddings '
                        '(encoder_hidden_states, pooled_projections) — '
                        'skips the text towers, the cached-embedding '
                        'serving path')
    p.add_argument('--height', type=int, default=1024)
    p.add_argument('--width', type=int, default=1024)
    p.add_argument('--nfe', type=int, default=2)
    p.add_argument('--temperature', type=float, default=1.0)
    p.add_argument('--guidance', type=float, default=3.5)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--int8', action='store_true',
                   help='weight-only int8 transformer (12B fits one 16GB '
                        'chip); adapter surface stays high-precision')
    p.add_argument('--w8a8', action='store_true',
                   help='int8 weights + dynamic int8 activations (MXU int8 '
                        'rate); implies --int8')
    p.add_argument('--int4', action='store_true',
                   help='weight-only int4 (group-128 scales): quarter '
                        'transformer HBM')
    p.add_argument('--w4a8', action='store_true',
                   help='int4 weights + dynamic int8 activations (Pallas '
                        'grouped matmul); implies --int4')
    p.add_argument('--mesh', default=None,
                   help="multi-chip serving mesh, e.g. 'sp=4,tensor=2' "
                        '(single-image latency) or '
                        "'fsdp=4,tensor=2' (weight sharding); axes: "
                        'data/fsdp/tensor/sp/pipe/expert')
    p.add_argument('--sp-mode', choices=('ulysses', 'ring'),
                   default='ulysses',
                   help="sequence-parallel layout under an sp>1 mesh")
    p.add_argument('--out', default='output.png')
    args = p.parse_args()

    setup_jax()
    import os
    import jax
    from arcflow_tpu.pipelines import ArcFluxPipeline

    if os.path.exists(os.path.join(args.model_dir, 'model_index.json')):
        # full diffusers pipeline folder: transformer + VAE + text towers +
        # scheduler assemble from model_index.json in one call (the
        # reference's serving entry, reference inference_flux.py:5-7) —
        # no --vae-dir or other component flags needed
        pipe = ArcFluxPipeline.from_pretrained(
            args.model_dir, nfe=args.nfe, temperature=args.temperature,
            guidance_scale=args.guidance)
    else:
        from arcflow_tpu.models import (PretrainedFluxTextEncoder,
                                        PretrainedVAEDecoder)
        vae = vae_params = None
        if args.vae_dir:
            vae = PretrainedVAEDecoder(latent_channels=16, dtype='bfloat16',
                                       from_pretrained=args.vae_dir)
            vae_params = vae.init_params(jax.random.PRNGKey(0))
        text_encoder = None if args.prompt_embeds \
            else PretrainedFluxTextEncoder()
        pipe = ArcFluxPipeline.from_pretrained(
            args.model_dir, text_encoder=text_encoder,
            vae=vae, vae_params=vae_params,
            nfe=args.nfe, temperature=args.temperature,
            guidance_scale=args.guidance)
    if args.adapter:
        pipe.load_arcflow_adapter(args.adapter)
    if args.int4 or args.w4a8:
        pipe.quantize_int4(act_quant=args.w4a8)
    elif args.int8 or args.w8a8:
        pipe.quantize_int8(act_quant=args.w8a8)
    if args.mesh:
        axes = {k: int(v) for k, v in
                (kv.split('=') for kv in args.mesh.split(','))}
        print('serving mesh:', dict(pipe.shard(axes,
                                               sp_mode=args.sp_mode).shape))
    prompt_embeds = None
    if args.prompt_embeds:
        import numpy as np
        prompt_embeds = dict(np.load(args.prompt_embeds))
    has_vae = pipe.vae is not None
    out = pipe(prompt=None if prompt_embeds else [args.prompt],
               prompt_embeds=prompt_embeds,
               height=args.height, width=args.width,
               seed=args.seed, output_type='pil' if has_vae else 'latent')
    if has_vae:
        out['images'][0].save(args.out)
    else:
        import numpy as np
        np.save(args.out if args.out.endswith('.npy') else args.out + '.npy',
                np.asarray(out['latents']))
    print(f'saved {args.out}')


if __name__ == '__main__':
    main()
