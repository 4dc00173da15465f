#!/usr/bin/env python
"""Strip a training checkpoint to inference-only weights (reference
``tools/save_inference_weights.py``): EMA (or live) trainable tree only, no
optimizer state, optional fp16/bf16 downcast, saved as safetensors."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('checkpoint_dir')
    p.add_argument('out', help='output .safetensors path')
    p.add_argument('--step', type=int, default=None)
    p.add_argument('--no-ema', action='store_true')
    p.add_argument('--dtype', choices=['float32', 'bfloat16', 'float16'],
                   default='bfloat16')
    args = p.parse_args()

    import jax
    jax.config.update('jax_platforms', 'cpu')
    from safetensors.numpy import save_file
    from arcflow_tpu.runner.checkpoint import load_raw_checkpoint
    from arcflow_tpu.utils.pytree import flatten

    raw = load_raw_checkpoint(args.checkpoint_dir, step=args.step)
    src = raw['trainable'] if args.no_ema or not raw.get('ema') \
        else raw['ema']
    flat = flatten(src)
    dtype = dict(float32=np.float32, bfloat16=np.dtype('bfloat16')
                 if hasattr(np, 'bfloat16') else np.float32,
                 float16=np.float16)[args.dtype]
    try:
        import ml_dtypes
        if args.dtype == 'bfloat16':
            dtype = ml_dtypes.bfloat16
    except ImportError:
        pass
    state = {k: np.ascontiguousarray(np.asarray(v).astype(dtype))
             for k, v in flat.items()}
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    save_file(state, args.out)
    n = sum(v.size for v in state.values())
    print(f'saved {len(state)} tensors ({n:,} params) to {args.out}')


if __name__ == '__main__':
    main()
