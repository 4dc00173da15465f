"""File I/O: retrying transfers, pluggable URI backends, media helpers.

Equivalent capability to the reference ``lakonlab/utils/io_utils.py``: a
``@retry`` decorator for flaky remote I/O, file backends keyed by URI scheme
(local always; s3/http gated on their deps), node-local-rank-gated downloads,
and image save/load helpers.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Callable, Dict, Optional

import numpy as np


def retry(tries: int = 5, delay: float = 3.0, backoff: float = 1.0,
          exceptions=(Exception,)):
    """Retry decorator (reference io_utils.py:40-54)."""
    def deco(fn: Callable):
        @functools.wraps(fn)
        def wrapped(*args, **kwargs):
            _delay = delay
            for attempt in range(tries):
                try:
                    return fn(*args, **kwargs)
                except exceptions:
                    if attempt == tries - 1:
                        raise
                    time.sleep(_delay)
                    _delay *= backoff
        return wrapped
    return deco


class LocalBackend:
    def get(self, path: str) -> bytes:
        with open(path, 'rb') as f:
            return f.read()

    def put(self, data: bytes, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, 'wb') as f:
            f.write(data)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def join_path(self, *parts) -> str:
        return os.path.join(*parts)


class HTTPBackend:
    @retry(tries=5, delay=3)
    def get(self, url: str) -> bytes:
        import urllib.request
        with urllib.request.urlopen(url) as r:
            return r.read()

    def exists(self, url: str) -> bool:
        import urllib.request
        try:
            urllib.request.urlopen(url)
            return True
        except Exception:
            return False

    def join_path(self, *parts) -> str:
        return '/'.join(p.strip('/') for p in parts)


class S3Backend:
    """S3 via boto3 when available (reference S3Backend, io_utils.py:~57+)."""

    def __init__(self):
        try:
            import boto3
            self.client = boto3.client('s3')
        except ImportError as e:
            raise RuntimeError('boto3 not available in this environment; '
                               's3:// paths are unsupported here') from e

    @staticmethod
    def _split(path: str):
        path = path[len('s3://'):]
        bucket, _, key = path.partition('/')
        return bucket, key

    @retry(tries=5, delay=3)
    def get(self, path: str) -> bytes:
        bucket, key = self._split(path)
        return self.client.get_object(Bucket=bucket, Key=key)['Body'].read()

    @retry(tries=5, delay=3)
    def put(self, data: bytes, path: str):
        bucket, key = self._split(path)
        self.client.put_object(Bucket=bucket, Key=key, Body=data)

    def exists(self, path: str) -> bool:
        bucket, key = self._split(path)
        try:
            self.client.head_object(Bucket=bucket, Key=key)
            return True
        except Exception:
            return False

    def join_path(self, *parts) -> str:
        return '/'.join(p.rstrip('/') for p in parts)


class HuggingFaceBackend:
    """huggingface:// scheme (reference checkpoint.py:241-278): resolves
    ``huggingface://org/repo/path/in/repo`` through huggingface_hub's cache.
    Zero-egress environments can pre-seed HF_HOME and still resolve."""

    def __init__(self):
        try:
            from huggingface_hub import hf_hub_download
            self._download = hf_hub_download
        except ImportError as e:
            raise RuntimeError('huggingface_hub unavailable; pre-download '
                               'and use a local path instead') from e

    @staticmethod
    def parse(path: str):
        rest = path[len('huggingface://'):]
        parts = rest.split('/')
        repo_id = '/'.join(parts[:2])
        return repo_id, '/'.join(parts[2:])

    def local_path(self, path: str) -> str:
        repo_id, filename = self.parse(path)
        return self._download(repo_id=repo_id, filename=filename)

    @retry(tries=5, delay=3)
    def get(self, path: str) -> bytes:
        with open(self.local_path(path), 'rb') as f:
            return f.read()

    def exists(self, path: str) -> bool:
        try:
            self.local_path(path)
            return True
        except Exception:
            return False

    def join_path(self, *parts) -> str:
        return '/'.join(p.rstrip('/') for p in parts)


_BACKENDS: Dict[str, Callable] = {}


def register_backend(scheme: str, backend) -> None:
    """Override/extend the URI-scheme table (also used by tests to fake
    remote storage on the local filesystem)."""
    _BACKENDS[scheme] = backend


def uri_scheme(path: str) -> str:
    if path.startswith('s3://'):
        return 's3'
    if path.startswith('huggingface://'):
        return 'huggingface'
    if path.startswith(('http://', 'https://')):
        return 'http'
    return 'local'


def get_file_backend(path: str):
    """Backend for a URI: s3:// | huggingface:// | http(s):// | local."""
    scheme = uri_scheme(path)
    if scheme not in _BACKENDS:
        ctor = {'s3': S3Backend, 'http': HTTPBackend,
                'huggingface': HuggingFaceBackend,
                'local': LocalBackend}[scheme]
        _BACKENDS[scheme] = ctor()
    return _BACKENDS[scheme]


def is_node_local_rank_zero() -> bool:
    """Download gating (reference io_utils.py:79-93): only one process per
    host fetches remote artifacts. jax.process_index() == 0 per host in
    single-host; multihost setups gate on local process."""
    return int(os.environ.get('LOCAL_RANK', 0)) == 0


def save_image(img: np.ndarray, path: str):
    """(H, W, 3) float [0,1] or uint8 -> file."""
    from PIL import Image
    if img.dtype != np.uint8:
        img = np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray(img).save(path)


def load_image(path: str, backend=None) -> np.ndarray:
    from io import BytesIO
    from PIL import Image
    backend = backend or get_file_backend(path)
    img = Image.open(BytesIO(backend.get(path))).convert('RGB')
    return np.asarray(img)


def save_image_grid(images: np.ndarray, path: str, ncols: Optional[int] = None):
    """(N, H, W, 3) -> one tiled grid image."""
    n, h, w, c = images.shape
    ncols = ncols or int(np.ceil(np.sqrt(n)))
    nrows = int(np.ceil(n / ncols))
    grid = np.zeros((nrows * h, ncols * w, c), images.dtype)
    for i in range(n):
        r, cc = divmod(i, ncols)
        grid[r * h:(r + 1) * h, cc * w:(cc + 1) * w] = images[i]
    save_image(grid, path)
