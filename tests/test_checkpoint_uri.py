"""Checkpoint URI schemes (s3 mirror, tmp:, fp16_ema) — reference
checkpoint.py:144-278,491-534 capability, tested with a filesystem-faked
remote backend (no network)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from arcflow_tpu.runner import CheckpointManager, TrainState
from arcflow_tpu.runner.checkpoint import resolve_checkpoint_dir
from arcflow_tpu.utils.io_utils import register_backend


class FakeS3Backend:
    """Filesystem-backed stand-in for S3Backend (same interface)."""

    def __init__(self, root):
        self.root = str(root)

    def _local(self, uri):
        return os.path.join(self.root, uri[len('s3://'):])

    def get(self, uri):
        with open(self._local(uri), 'rb') as f:
            return f.read()

    def put(self, data, uri):
        p = self._local(uri)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, 'wb') as f:
            f.write(data)

    def exists(self, uri):
        return os.path.exists(self._local(uri))

    def join_path(self, *parts):
        return '/'.join(p.rstrip('/') for p in parts)


def _tiny_state(seed=0):
    trainable = {'m': {'w': jax.random.normal(jax.random.PRNGKey(seed),
                                              (4, 4))}}
    opt = {'m': optax.adam(1e-3)}
    return TrainState.create(jax.random.PRNGKey(seed + 1), trainable,
                             {'base': {}}, opt, ema_keys=('m',)), opt


def test_resolve_checkpoint_dir_schemes(tmp_path):
    local, remote = resolve_checkpoint_dir(str(tmp_path / 'ck'))
    assert remote is None and local == str(tmp_path / 'ck')
    local, remote = resolve_checkpoint_dir('tmp:myjob')
    assert remote is None and 'arcflow_ckpt' in local and \
        local.endswith('myjob')
    local, remote = resolve_checkpoint_dir('s3://bucket/prefix/')
    assert remote == 's3://bucket/prefix' and os.path.isabs(local)


def test_s3_mirror_save_and_fresh_restore(tmp_path, monkeypatch):
    register_backend('s3', FakeS3Backend(tmp_path / 'bucket'))
    uri = 's3://ckpts/job1'
    # stage into a per-test dir (not the shared /dev/shm hash)
    monkeypatch.setattr(
        'arcflow_tpu.runner.checkpoint.resolve_checkpoint_dir',
        lambda u: (str(tmp_path / 'stage1'), uri) if u == uri
        else resolve_checkpoint_dir(u))

    state, opt = _tiny_state()
    state = state.replace(step=jnp.asarray(10, jnp.int32))
    mgr = CheckpointManager(uri, interval=10)
    assert mgr.save(state)
    mgr.close()
    # files landed in the fake bucket
    assert (tmp_path / 'bucket' / 'ckpts' / 'job1' / 'latest.txt').exists()
    assert (tmp_path / 'bucket' / 'ckpts' / 'job1' /
            'manifest-10.txt').exists()

    # a FRESH process/machine (empty staging) restores from the remote
    monkeypatch.setattr(
        'arcflow_tpu.runner.checkpoint.resolve_checkpoint_dir',
        lambda u: (str(tmp_path / 'stage2'), uri) if u == uri
        else resolve_checkpoint_dir(u))
    state2, _ = _tiny_state(seed=7)
    mgr2 = CheckpointManager(uri, interval=10)
    assert mgr2.latest_step() == 10
    restored = mgr2.restore(state2)
    mgr2.close()
    np.testing.assert_allclose(np.asarray(restored.trainable['m']['w']),
                               np.asarray(state.trainable['m']['w']),
                               rtol=1e-6)
    assert int(restored.step) == 10


def test_tmp_scheme_roundtrip(tmp_path, monkeypatch):
    import tempfile
    monkeypatch.setattr(tempfile, 'gettempdir', lambda: str(tmp_path))
    monkeypatch.setattr(os.path, 'isdir',
                        lambda p: False if p == '/dev/shm'
                        else os.path.exists(p))
    state, _ = _tiny_state()
    state = state.replace(step=jnp.asarray(5, jnp.int32))
    mgr = CheckpointManager('tmp:jobx', interval=5)
    assert mgr.save(state)
    mgr.close()
    assert mgr.directory.startswith(str(tmp_path))

    mgr2 = CheckpointManager('tmp:jobx', interval=5)
    s2, _ = _tiny_state(seed=3)
    restored = mgr2.restore(s2)
    mgr2.close()
    np.testing.assert_allclose(np.asarray(restored.trainable['m']['w']),
                               np.asarray(state.trainable['m']['w']))


def test_fp16_ema_downcast(tmp_path):
    state, _ = _tiny_state()
    state = state.replace(step=jnp.asarray(2, jnp.int32))
    mgr = CheckpointManager(str(tmp_path / 'ck'), interval=2,
                            ckpt_fp16_ema=True)
    tree = mgr._to_saveable(state)
    assert tree['ema']['m']['w'].dtype == jnp.float16          # downcast
    assert tree['trainable']['m']['w'].dtype == jnp.float32    # untouched
    assert mgr.save(state)
    mgr.close()
    # restore re-up-casts the EMA to the live dtype; int leaves untouched
    s2, _ = _tiny_state(seed=9)
    mgr2 = CheckpointManager(str(tmp_path / 'ck'), interval=2,
                             ckpt_fp16_ema=True)
    restored = mgr2.restore(s2)
    mgr2.close()
    assert restored.ema['m']['w'].dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(restored.ema['m']['w']),
        np.asarray(state.ema['m']['w']).astype(np.float16), rtol=1e-3)
    counts = [x for x in jax.tree.leaves(restored.opt_states)
              if hasattr(x, 'dtype') and jnp.issubdtype(x.dtype, jnp.integer)]
    assert counts, 'adam count leaf should remain integer'


def test_load_safetensors_state_remote_sharded_index(tmp_path):
    """huggingface://-style sharded-index loading resolves every shard
    through the backend (reference checkpoint.py:241-278); verified with a
    cache-faking backend."""
    import json as _json
    from safetensors.numpy import save_file
    from arcflow_tpu.pipelines.convert import load_safetensors_state

    # fabricate a 2-shard checkpoint in a fake hub cache
    a = np.arange(6, dtype=np.float32).reshape(2, 3)
    b = np.ones((4,), np.float32)
    save_file({'w.a': a}, str(tmp_path / 'm-00001.safetensors'))
    save_file({'w.b': b}, str(tmp_path / 'm-00002.safetensors'))
    with open(tmp_path / 'model.safetensors.index.json', 'w') as f:
        _json.dump({'weight_map': {'w.a': 'm-00001.safetensors',
                                   'w.b': 'm-00002.safetensors'}}, f)

    class FakeHub:
        def local_path(self, uri):
            assert uri.startswith('huggingface://org/repo/')
            return str(tmp_path / uri.rsplit('/', 1)[1])

    register_backend('huggingface', FakeHub())
    state = load_safetensors_state(
        'huggingface://org/repo/model.safetensors.index.json')
    np.testing.assert_array_equal(state['w.a'], a)
    np.testing.assert_array_equal(state['w.b'], b)
    # single remote file too
    one = load_safetensors_state('huggingface://org/repo/m-00002.safetensors')
    np.testing.assert_array_equal(one['w.b'], b)
