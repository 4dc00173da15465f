import os
import textwrap

import pytest

from arcflow_tpu.config import Config
from arcflow_tpu.registry import Registry


def _write(tmp_path, name, content):
    p = tmp_path / name
    p.write_text(textwrap.dedent(content))
    return str(p)


def test_fromfile_basic(tmp_path):
    f = _write(tmp_path, 'a.py', '''
        model = dict(type='Foo', depth=3, head=dict(type='Bar', k=16))
        lr = 1e-4
        names = ['x', 'y']
    ''')
    cfg = Config.fromfile(f)
    assert cfg.model.type == 'Foo'
    assert cfg.model.head.k == 16
    assert cfg.lr == 1e-4
    assert cfg.names == ['x', 'y']
    assert cfg.filename == f


def test_base_inheritance_and_merge(tmp_path):
    _write(tmp_path, 'base.py', '''
        model = dict(type='Foo', depth=3, head=dict(type='Bar', k=16))
        data = dict(batch_size=4)
    ''')
    f = _write(tmp_path, 'child.py', '''
        _base_ = ['base.py']
        model = dict(depth=7, head=dict(k=32))
        extra = True
    ''')
    cfg = Config.fromfile(f)
    assert cfg.model.type == 'Foo'        # inherited
    assert cfg.model.depth == 7           # overridden
    assert cfg.model.head.k == 32         # nested override keeps type
    assert cfg.model.head.type == 'Bar'
    assert cfg.data.batch_size == 4
    assert cfg.extra is True


def test_delete_key(tmp_path):
    _write(tmp_path, 'base.py', "opt = dict(type='AdamW', lr=1e-4, wd=0.01)\n")
    f = _write(tmp_path, 'child.py', '''
        _base_ = 'base.py'
        opt = dict(_delete_=True, type='SGD', lr=0.1)
    ''')
    cfg = Config.fromfile(f)
    assert cfg.opt.type == 'SGD'
    assert 'wd' not in cfg.opt


def test_merge_from_dict_cli_options(tmp_path):
    f = _write(tmp_path, 'a.py', "model = dict(depth=3, act='gelu')\nlr = 1e-4\n")
    cfg = Config.fromfile(f)
    cfg.merge_from_dict({'model.depth': '9', 'lr': '3e-5', 'model.act': 'silu',
                         'flag': 'true'})
    assert cfg.model.depth == 9
    assert cfg.lr == 3e-5
    assert cfg.model.act == 'silu'
    assert cfg.flag is True


def test_dump_roundtrip(tmp_path):
    f = _write(tmp_path, 'a.py', "model = dict(type='Foo', k=2)\n")
    cfg = Config.fromfile(f)
    out = str(tmp_path / 'dump.py')
    cfg.dump(out)
    assert os.path.exists(out)
    assert 'Foo' in open(out).read()


def test_registry_build():
    REG = Registry('test')

    @REG.register_module()
    class Thing:
        def __init__(self, a, b=2):
            self.a, self.b = a, b

    t = REG.build(dict(type='Thing', a=1))
    assert (t.a, t.b) == (1, 2)
    t2 = REG.build(dict(type='Thing', a=5), default_args=dict(b=9))
    assert (t2.a, t2.b) == (5, 9)
    # passthrough of prebuilt objects
    assert REG.build(t2) is t2
    assert REG.build(None) is None
    with pytest.raises(KeyError):
        REG.build(dict(type='Missing'))
