"""Native C++ loader: build, correctness vs python-zstd, and throughput."""

import os
import pickle
import time

import numpy as np
import pytest

from arcflow_tpu.data._fastloader import get_fastloader


@pytest.fixture(scope='module')
def fast():
    mod = get_fastloader()
    if mod is None:
        pytest.skip('native toolchain unavailable')
    return mod


def write_records(tmp_path, n=32, size=20000):
    import zstandard as zstd
    paths, blobs = [], []
    for i in range(n):
        payload = pickle.dumps(dict(
            idx=i, arr=np.random.default_rng(i).standard_normal(size)
            .astype(np.float32)))
        blobs.append(payload)
        p = str(tmp_path / f'r{i:04d}.zst')
        with open(p, 'wb') as f:
            with zstd.ZstdCompressor().stream_writer(f) as z:
                z.write(payload)
        paths.append(p)
    return paths, blobs


def test_native_matches_python_zstd(fast, tmp_path):
    paths, blobs = write_records(tmp_path)
    out = fast.load_batch(paths, num_threads=4)
    assert len(out) == len(paths)
    for got, want in zip(out, blobs):
        assert got == want


def test_native_no_decompress(fast, tmp_path):
    paths, _ = write_records(tmp_path, n=2)
    raw = fast.load_batch(paths, decompress=False)
    assert raw[0] == open(paths[0], 'rb').read()


def test_native_missing_file_raises(fast, tmp_path):
    with pytest.raises(IOError):
        fast.load_batch([str(tmp_path / 'nope.zst')])


def test_native_faster_or_equal(fast, tmp_path):
    """Thread-pooled native decode should not lose to serial python-zstd."""
    import zstandard as zstd
    paths, _ = write_records(tmp_path, n=128, size=60000)

    t0 = time.perf_counter()
    for p in paths:
        with open(p, 'rb') as f:
            zstd.ZstdDecompressor().decompress(
                f.read(), max_output_size=1 << 24)
    t_py = time.perf_counter() - t0

    t0 = time.perf_counter()
    fast.load_batch(paths, num_threads=0)
    t_native = time.perf_counter() - t0
    # the native path wins through GIL-released threads; on a single-core box
    # it can only tie, and under CI contention wall-clock ratios are noise —
    # enforce the bound only where the pool can actually parallelize
    if (os.cpu_count() or 1) > 1:
        assert t_native < t_py * 1.5, (t_native, t_py)


def test_imageprompt_getitems_uses_native(tmp_path):
    from tests.test_data import write_cache
    from arcflow_tpu.data import ImagePrompt
    cache, dl = write_cache(tmp_path)
    ds = ImagePrompt(cache_dir=cache, datalist_path=dl, pad_seq_len=8)
    items = ds.getitems([0, 3, 5])
    singles = [ds[0], ds[3], ds[5]]
    for a, b in zip(items, singles):
        np.testing.assert_array_equal(a['latents'], b['latents'])
        np.testing.assert_array_equal(
            a['prompt_embed_kwargs']['encoder_hidden_states'],
            b['prompt_embed_kwargs']['encoder_hidden_states'])


def test_prefetcher_order_and_errors():
    from arcflow_tpu.data import Prefetcher

    def gen():
        for i in range(10):
            yield i
    assert list(Prefetcher(gen(), depth=3)) == list(range(10))

    def bad():
        yield 1
        raise ValueError('boom')
    it = iter(Prefetcher(bad()))
    assert next(it) == 1
    with pytest.raises(ValueError):
        next(it)


def test_native_truncated_record_raises(fast, tmp_path):
    """A truncated zstd frame must raise, not return partial bytes."""
    paths, _ = write_records(tmp_path, n=1, size=200000)
    data = open(paths[0], 'rb').read()
    bad = str(tmp_path / 'truncated.zst')
    with open(bad, 'wb') as f:
        f.write(data[:len(data) // 2])
    with pytest.raises(IOError):
        fast.load_batch([bad])
