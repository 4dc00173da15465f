"""Compile-time SPMD program audits.

The reference has no analogue (torch FSDP's collectives are opaque); for an
XLA program the optimized HLO states every collective and its shape, so the
framework can *assert* communication efficiency instead of hoping for it:

  * ``collective_stats``     — bytes/op counts per collective kind from HLO;
  * ``audit_train_step``     — AOT-compile a step function and return stats
                               (+ per-device memory analysis when available).

Used by tests/test_hlo_audit.py (bounds all-gather bytes in the tiny train
step and fails on involuntary-rematerialization warnings) and by
``bench.py --train --aot-12b`` (12B-scale FSDP fit evidence without 12B
hardware).
"""

from __future__ import annotations

import re
from typing import Any, Dict

_DTYPE_BYTES = {
    'pred': 1, 's4': 1, 'u4': 1,
    's8': 1, 'u8': 1, 'f8e4m3fn': 1, 'f8e5m2': 1,
    's16': 2, 'u16': 2, 'bf16': 2, 'f16': 2,
    's32': 4, 'u32': 4, 'f32': 4,
    's64': 8, 'u64': 8, 'f64': 8, 'c64': 8,
    'c128': 16,
}

_COLLECTIVES = ('all-gather', 'all-reduce', 'reduce-scatter', 'all-to-all',
                'collective-permute')

# result shapes on the lhs of `= ... <collective>(`; tuples keep every
# element shape, e.g. `(f32[8,4]{1,0}, f32[16]{0}) all-reduce(...)`
_SHAPE_RE = re.compile(r'(\w+)\[([\d,]*)\]')


def _shape_bytes(dtype: str, dims: str) -> int:
    n = 1
    if dims:
        for d in dims.split(','):
            n *= int(d)
    return n * _DTYPE_BYTES.get(dtype, 4)


def collective_stats(hlo_text: str) -> Dict[str, Dict[str, int]]:
    """Per-collective op counts and result bytes from optimized HLO text."""
    stats = {k: {'count': 0, 'bytes': 0} for k in _COLLECTIVES}
    for line in hlo_text.splitlines():
        for kind in _COLLECTIVES:
            marker = f' {kind}('
            idx = line.find(marker)
            if idx < 0 or '=' not in line[:idx]:
                continue
            lhs = line[line.index('=') + 1:idx]
            total = sum(_shape_bytes(d, s) for d, s in _SHAPE_RE.findall(lhs))
            stats[kind]['count'] += 1
            stats[kind]['bytes'] += total
            break
    return stats


def audit_compiled(compiled) -> Dict[str, Any]:
    """Collective + memory stats for a jax ``Compiled`` object."""
    out: Dict[str, Any] = {
        'collectives': collective_stats(compiled.as_text())}
    try:
        mem = compiled.memory_analysis()
        out['memory'] = dict(
            argument_bytes=int(mem.argument_size_in_bytes),
            output_bytes=int(mem.output_size_in_bytes),
            temp_bytes=int(mem.temp_size_in_bytes),
            generated_code_bytes=int(mem.generated_code_size_in_bytes),
        )
    except Exception:   # backend without memory analysis
        out['memory'] = None
    return out


def tree_bytes(tree) -> int:
    import jax
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree)
               if hasattr(x, 'size'))
