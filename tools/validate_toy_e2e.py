#!/usr/bin/env python
"""End-to-end quality validation on real hardware: flow pretrain -> 2-NFE
ArcFlow distillation -> in-support fraction of samples on the checkerboard.

The hardware twin of ``tests/test_e2e_checkerboard.py`` at full config
budgets (the CPU suite runs reduced budgets). Reference analogue: none —
the reference ships no automated quality check; this formalizes its
checkerboard smoke fixture into a pass/fail gate.

Usage:
    python tools/validate_toy_e2e.py [--work-dir /tmp/toy_validate]
        [--flow-iters N] [--distill-iters N] [--bar 0.7]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--work-dir', default='/tmp/toy_validate')
    p.add_argument('--flow-iters', type=int, default=None,
                   help='override flow pretrain budget (default: config)')
    p.add_argument('--distill-iters', type=int, default=None)
    p.add_argument('--num-samples', type=int, default=4096)
    p.add_argument('--bar', type=float, default=0.7,
                   help='required 2-NFE in-support fraction')
    args = p.parse_args()

    from arcflow_tpu.utils import setup_jax
    setup_jax()
    import jax
    import numpy as np
    from arcflow_tpu.apis import train_model
    from arcflow_tpu.config import Config
    from arcflow_tpu.data.checkerboard import CheckerboardData

    print('devices:', jax.devices(), flush=True)

    cfg = Config.fromfile('configs/toy/checkerboard_flow.py')
    if args.flow_iters:
        cfg.merge_from_dict({'total_iters': args.flow_iters})
    cfg.work_dir = os.path.join(args.work_dir, 'flow')
    train_model(cfg, seed=0)
    print('flow pretrain done', flush=True)

    cfg2 = Config.fromfile('configs/toy/checkerboard_arcflow_2nfe.py')
    overrides = {'model.teacher_ckpt': os.path.join(
        cfg.work_dir, 'checkpoints', 'checkerboard_flow')}
    if args.distill_iters:
        overrides['total_iters'] = args.distill_iters
    cfg2.merge_from_dict(overrides)
    cfg2.work_dir = os.path.join(args.work_dir, 'distill')
    state, model = train_model(cfg2, seed=0)
    print('distillation done', flush=True)

    samples = np.asarray(model.val_step(
        state, jax.random.PRNGKey(1), dict(num_samples=args.num_samples)))
    assert np.isfinite(samples).all()
    data = CheckerboardData()
    in_support = float(data.log_prob_support(samples).mean())
    print(f'2-NFE in-support: {in_support:.2%} (bar {args.bar:.0%})')
    if in_support < args.bar:
        sys.exit(f'FAIL: {in_support:.2%} < {args.bar:.0%}')
    print('VALIDATION OK')


if __name__ == '__main__':
    main()
