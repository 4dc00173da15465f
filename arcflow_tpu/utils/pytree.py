"""Param-tree partitioning and overlay-merging.

This is the TPU-native replacement for the reference's ``flex_freeze``
(``lakonlab/models/architecture/utils.py:9-81``: freeze-all then un-freeze by
key substring) and ``tie_untrained_submodules`` (``utils/misc.py:116-132``):
instead of mutating ``requires_grad`` flags and tying nn.Module attributes,
we *split* a parameter pytree into (trainable, frozen) by path substring and
*overlay* adapter params onto a shared frozen base at apply time. Sharing is
structural — the same jax.Array leaves appear in the teacher's tree and in
the student's merged tree with zero copies.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Sequence, Tuple

import jax
from flax import traverse_util


def flatten(tree: Dict) -> Dict[str, Any]:
    """Nested dict -> {'a.b.c': leaf}."""
    return {'.'.join(k): v for k, v in
            traverse_util.flatten_dict(tree).items()}


def unflatten(flat: Dict[str, Any]) -> Dict:
    return traverse_util.unflatten_dict(
        {tuple(k.split('.')): v for k, v in flat.items()})


def partition_params(tree: Dict, exclude_keys: Sequence[str],
                     exact_prefix: bool = False) -> Tuple[Dict, Dict]:
    """Split params by path substring: (matching=trainable, rest=frozen).

    Matches the reference's freeze_exclude semantics: a param whose dotted
    path contains any of ``exclude_keys`` as a substring is trainable
    (e.g. 'lora' matches every LoRA leaf; 'proj_out_means' matches the head).
    ``exact_prefix`` instead matches whole leading path segments
    (disambiguates the top-level 'proj_out' head from
    'single_blocks.proj_out').
    """
    flat = flatten(tree)
    if exact_prefix:
        def match(path):
            return any(path == key or path.startswith(key + '.')
                       for key in exclude_keys)
    else:
        def match(path):
            return any(key in path for key in exclude_keys)
    trainable = {k: v for k, v in flat.items() if match(k)}
    frozen = {k: v for k, v in flat.items() if k not in trainable}
    return unflatten(trainable) if trainable else {}, \
        unflatten(frozen) if frozen else {}


def merge_params(*trees: Dict) -> Dict:
    """Overlay-merge param trees (later trees win on key conflicts).

    Used to assemble the student's full tree from (shared frozen base,
    trainable adapter) at apply time — a dict merge of array references,
    free under jit.
    """
    flat: Dict[str, Any] = {}
    for t in trees:
        if t:
            flat.update(flatten(t))
    return unflatten(flat)


def drop_params(tree: Dict, keys: Sequence[str],
                exact_prefix: bool = False) -> Dict:
    """Remove params whose dotted path contains any of ``keys`` (substring),
    or — with ``exact_prefix`` — whose path starts with ``key + '.'`` or
    equals ``key``. Prefix mode disambiguates e.g. the teacher's top-level
    ``proj_out`` head from ``single_blocks.proj_out`` layers (the reference
    deletes the exact state-dict keys, arcflux.py:328-341).
    """
    def hit(path: str) -> bool:
        if exact_prefix:
            return any(path == key or path.startswith(key + '.')
                       for key in keys)
        return any(key in path for key in keys)

    flat = {k: v for k, v in flatten(tree).items() if not hit(k)}
    return unflatten(flat) if flat else {}


def tree_size_bytes(tree) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree)
               if hasattr(x, 'size'))
