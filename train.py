#!/usr/bin/env python
"""Training CLI (reference ``train.py``): python train.py <config> [options]."""

import argparse

from arcflow_tpu import Config
from arcflow_tpu.apis import train_model
from arcflow_tpu.utils import setup_jax


def parse_args():
    p = argparse.ArgumentParser(description='Train a model from a config file')
    p.add_argument('config', help='config file path')
    p.add_argument('--work-dir', default=None)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--no-resume', action='store_true',
                   help='do not auto-resume from the latest checkpoint')
    p.add_argument('--cfg-options', nargs='+', default=[],
                   help='dot-keyed config overrides, e.g. total_iters=100')
    p.add_argument('--platform', default=None, choices=['cpu', 'tpu'],
                   help='pin the jax platform (the launcher-side analogue '
                        'of the reference init_dist backend choice); '
                        'default: environment-selected')
    return p.parse_args()


def main():
    args = parse_args()
    setup_jax(force_platform=args.platform)
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        overrides = {}
        for opt in args.cfg_options:
            k, _, v = opt.partition('=')
            overrides[k] = v
        cfg.merge_from_dict(overrides)
    # multihost bring-up before any other jax API (reference init_dist,
    # train.py:182-185); no-op for single-process runs
    from arcflow_tpu.parallel import setup_distributed
    setup_distributed(cfg.get('dist_params'))
    train_model(cfg, work_dir=args.work_dir, resume=not args.no_resume,
                seed=args.seed)


if __name__ == '__main__':
    main()
