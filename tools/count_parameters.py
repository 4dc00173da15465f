#!/usr/bin/env python
"""Parameter accounting for a config's model (reference
``tools/count_parameters.py``): total / trainable / frozen, and the
trainable ratio (the reference's <5% adapter claim is checkable here)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    args = p.parse_args()

    import jax
    jax.config.update('jax_platforms', 'cpu')
    from arcflow_tpu import Config
    from arcflow_tpu.apis import build_model_from_cfg
    from arcflow_tpu.runner import count_params

    cfg = Config.fromfile(args.config)
    model = build_model_from_cfg(cfg)
    trainable, frozen = model.init_params(jax.random.PRNGKey(0))
    n_t, n_f = count_params(trainable), count_params(frozen)
    total = n_t + n_f
    print(f'trainable: {n_t:,}')
    print(f'frozen:    {n_f:,}')
    print(f'total:     {total:,}')
    print(f'trainable ratio: {100 * n_t / max(total, 1):.3f}%')
    print(f'adapter size (bf16): {n_t * 2 / 1e6:.1f} MB')


if __name__ == '__main__':
    main()
