"""Datasets and host-side data pipeline."""

from .checkerboard import CheckerboardData
from .builder import build_dataset, build_dataloader, collate
from .image_prompts import ImagePrompt, load_datalist
from .imagenet import ImageNet, adm_center_crop
from .samplers import BucketizedBatchSampler, build_bucketized_loader
from .prefetch import Prefetcher, batched_index_loader

__all__ = ['CheckerboardData', 'build_dataset', 'build_dataloader', 'collate',
           'ImagePrompt', 'load_datalist', 'ImageNet', 'adm_center_crop',
           'BucketizedBatchSampler', 'build_bucketized_loader',
           'Prefetcher', 'batched_index_loader']
