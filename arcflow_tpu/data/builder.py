"""Host-side batch iterators feeding the device.

Equivalent capability to the reference dataloader builder
(``lakonlab/datasets/builder.py``): seeded workers, deterministic mid-run
resume (the bucketized sampler's ``set_iter`` fast-forward,
``samplers/distributed_sampler.py:96-98``) — achieved here by keying each
batch's RNG on ``(seed, iteration)``, so resume at iter N reproduces the
exact stream without replaying N batches.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np

from ..registry import DATASETS, build_module


def build_dataset(cfg):
    return DATASETS.build(cfg)


def collate(samples) -> dict:
    out = {}
    for k in samples[0]:
        vals = [s[k] for s in samples]
        if isinstance(vals[0], dict):
            out[k] = collate(vals)
        elif isinstance(vals[0], np.ndarray) or np.isscalar(vals[0]):
            out[k] = np.stack(vals)
        else:
            out[k] = vals
    return out


def build_dataloader(dataset, samples_per_gpu: int, seed: int = 0,
                     start_iter: int = 0, shuffle: bool = True,
                     num_replicas: int = 1, rank: int = 0) -> Iterator[dict]:
    """Infinite iterator of dict batches (numpy, host memory).

    Synthetic datasets exposing ``batch(rng, n)`` get the fast path; map-style
    datasets are sampled by index. Every batch's randomness derives from
    ``(seed, iteration, rank)`` — deterministic and resumable.
    """
    if isinstance(dataset, dict):
        dataset = build_dataset(dataset)

    def gen():
        it = start_iter
        n = len(dataset)
        while True:
            rng = np.random.default_rng([seed, it, rank])
            if hasattr(dataset, 'batch'):
                yield dataset.batch(rng, samples_per_gpu)
            else:
                if shuffle:
                    idx = rng.integers(0, n, size=samples_per_gpu)
                else:
                    base = (it * num_replicas + rank) * samples_per_gpu
                    idx = (base + np.arange(samples_per_gpu)) % n
                yield collate([dataset[int(i)] for i in idx])
            it += 1

    return gen()
