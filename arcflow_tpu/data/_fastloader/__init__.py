"""Lazy JIT build of the native loader extension.

Mirrors the reference's two-tier native design (CUDA op JIT-built via
torch.utils.cpp_extension, with a pure-python fallback; reference
``ops/gmflow_ops/backend.py:32-39``): first import compiles
``fastloader.cpp`` with g++ into a user cache dir; if the toolchain is
unavailable the caller falls back to python-zstd.
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sysconfig
import threading

_LOCK = threading.Lock()
_MODULE = None
_TRIED = False


def _build_and_load():
    src = os.path.join(os.path.dirname(__file__), 'fastloader.cpp')
    cache = os.path.expanduser('~/.cache/arcflow_tpu_native')
    os.makedirs(cache, exist_ok=True)
    suffix = sysconfig.get_config_var('EXT_SUFFIX') or '.so'
    out = os.path.join(cache, '_arcflow_fastloader' + suffix)
    if (not os.path.exists(out)
            or os.path.getmtime(out) < os.path.getmtime(src)):
        include = sysconfig.get_paths()['include']
        cmd = ['g++', '-O3', '-std=c++17', '-shared', '-fPIC',
               f'-I{include}', src, '-lzstd', '-lpthread', '-o', out]
        subprocess.run(cmd, check=True, capture_output=True)
    spec = importlib.util.spec_from_file_location('_arcflow_fastloader', out)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def get_fastloader():
    """The native module, or None when the toolchain/zstd is unavailable."""
    global _MODULE, _TRIED
    with _LOCK:
        if not _TRIED:
            _TRIED = True
            try:
                _MODULE = _build_and_load()
            except Exception:
                _MODULE = None
        return _MODULE
