"""Utilities."""

from .env import setup_jax
from .pytree import (partition_params, merge_params, drop_params, flatten,
                     unflatten, tree_size_bytes)
from .io_utils import (retry, get_file_backend, save_image, load_image,
                       save_image_grid, is_node_local_rank_zero)

__all__ = ['setup_jax', 'partition_params', 'merge_params', 'drop_params',
           'flatten', 'unflatten', 'tree_size_bytes', 'retry',
           'get_file_backend', 'save_image', 'load_image', 'save_image_grid',
           'is_node_local_rank_zero']
