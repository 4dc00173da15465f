#!/usr/bin/env python
"""Export a trained ArcFlow adapter to a portable safetensors folder.

Equivalent capability to the reference ``export_arcflow_to_diffusers.py``:
rebuilds the denoising config, extracts the EMA adapter (heads + norm_out +
LoRA), writes diffusers-compatible safetensors with the ``policy_config``
JSON in the metadata header, plus a config.json naming the Arc class.

Usage: python export_arcflow_to_diffusers.py <config> <checkpoint_dir> <out_dir>
"""

import argparse
import json
import os

from arcflow_tpu import Config
from arcflow_tpu.pipelines.loader import save_adapter_state
from arcflow_tpu.runner.checkpoint import load_raw_checkpoint


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('checkpoint_dir', help='orbax checkpoint dir of the run')
    p.add_argument('out_dir')
    p.add_argument('--step', type=int, default=None)
    p.add_argument('--no-ema', action='store_true')
    p.add_argument('--platform', default=None, choices=['cpu', 'tpu'],
                   help='pin the jax platform; export is pure checkpoint '
                        'IO, so --platform cpu avoids waiting on a TPU '
                        'grant entirely (the env var route is overridden '
                        'by site configs — this flag sets jax.config)')
    args = p.parse_args()

    if args.platform:
        from arcflow_tpu.utils.env import setup_jax
        setup_jax(force_platform=args.platform)
    cfg = Config.fromfile(args.config)
    raw = load_raw_checkpoint(args.checkpoint_dir, step=args.step)
    src = raw['trainable'] if args.no_ema or not raw.get('ema') else raw['ema']
    adapter = src['diffusion']

    den_cfg = dict(cfg.model.diffusion.denoising)
    arc_class = den_cfg.pop('type')
    # the exported folder is self-contained: drop training-time load paths
    # (the reference disables lora/pretrained on export, export script :74-80)
    den_cfg.pop('pretrained', None)
    den_cfg.pop('pretrained_adapter', None)
    test_cfg = dict(cfg.get('test_cfg', {}) or {})
    policy_config = dict(
        policy_type=cfg.model.diffusion.get('policy_type', 'ArcFlow'),
        nfe=test_cfg.get('nfe', 2),
        timestep_ratio=test_cfg.get('timestep_ratio', 1.0),
        total_substeps=test_cfg.get('total_substeps', 128),
        num_gaussians=den_cfg.get('num_gaussians', 16))

    os.makedirs(args.out_dir, exist_ok=True)
    family = 'qwen' if 'Qwen' in arc_class else 'flux'
    save_adapter_state(
        os.path.join(args.out_dir, 'diffusion_pytorch_model.safetensors'),
        adapter, policy_config=policy_config, family=family)
    with open(os.path.join(args.out_dir, 'config.json'), 'w') as f:
        json.dump(dict(_class_name=arc_class, **den_cfg), f, indent=2)
    print(f'exported adapter ({arc_class}) to {args.out_dir}')


if __name__ == '__main__':
    main()
