"""Pipeline parallelism (GPipe over the 'pipe' mesh axis) — a capability
beyond the reference (SURVEY.md §2.4: PP ABSENT).

Covers: the schedule itself (pipeline_scan == lax.scan, forward and grads),
the stacked-param placement spec, microbatch selection, full-model ArcFlux
forward/grad parity on pipe meshes (incl. composed with data/tensor axes),
and Qwen's masked joint blocks under the pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from arcflow_tpu.parallel import (activation_sharding, make_mesh,
                                  param_spec_for, pipe_partition,
                                  pipeline_active, pipeline_scan,
                                  shard_batch, stacked_param_spec)


def _toy_layer(lvars, c, bc, li):
    del li
    return jnp.tanh(c @ lvars['params']['w']) + c + bc


def _toy_stack(l=8, d=16, seed=0):
    w = jax.random.normal(jax.random.PRNGKey(seed), (l, d, d)) * 0.2
    return {'params': {'w': w}}


def _toy_ref(sv, x, bc):
    def step(c, w):
        return _toy_layer({'params': {'w': w}}, c, bc, 0), None
    out, _ = jax.lax.scan(step, x, sv['params']['w'])
    return out


def test_pipeline_scan_matches_scan_fwd_and_grad():
    mesh = make_mesh({'pipe': 4, 'data': 2})
    sv = _toy_stack()
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 16))
    bc = jnp.float32(0.1)
    ref = _toy_ref(sv, x, bc)

    with activation_sharding(mesh, batch_axes=('data',)):
        got = jax.jit(lambda s, c: pipeline_scan(
            _toy_layer, s, c, bc, mesh, 'pipe'))(sv, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    def loss_ref(s):
        return jnp.sum(_toy_ref(s, x, bc) ** 2)

    def loss_pipe(s):
        return jnp.sum(pipeline_scan(_toy_layer, s, x, bc, mesh,
                                     'pipe') ** 2)

    g_ref = jax.grad(loss_ref)(sv)
    with activation_sharding(mesh, batch_axes=('data',)):
        g_pipe = jax.jit(jax.grad(loss_pipe))(sv)
    np.testing.assert_allclose(np.asarray(g_pipe['params']['w']),
                               np.asarray(g_ref['params']['w']),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize('v', [2, 4])
def test_interleaved_schedule_matches_scan(v):
    """Circular schedule (V virtual stages per device): forward and grads
    match the plain scan; requires M == S (forced) and L % (S*V) == 0."""
    mesh = make_mesh({'pipe': 2, 'data': 4})
    sv = _toy_stack(l=8)
    x = jax.random.normal(jax.random.PRNGKey(7), (4, 16))  # M = S = 2
    bc = jnp.float32(0.05)
    ref = _toy_ref(sv, x, bc)

    def run(s, c):
        return pipeline_scan(_toy_layer, s, c, bc, mesh, 'pipe',
                             microbatches=2, interleave=v)

    with activation_sharding(mesh, batch_axes=('data',)):
        got = jax.jit(run)(sv, x)
        g_pipe = jax.jit(jax.grad(
            lambda s: jnp.sum(run(s, x) ** 2)))(sv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    g_ref = jax.grad(lambda s: jnp.sum(_toy_ref(s, x, bc) ** 2))(sv)
    np.testing.assert_allclose(np.asarray(g_pipe['params']['w']),
                               np.asarray(g_ref['params']['w']),
                               rtol=1e-4, atol=1e-4)


def test_flux_pipeline_interleaved_forward_matches_unsharded():
    """Full-model circular schedule: ArcFlux with V=2 on a pipe=2 mesh
    (single blocks 4 = 2 stages x 2 chunks) matches unsharded."""
    model = _tiny_flux(checkpointing=False)
    inputs, k = _flux_inputs(seed=13)
    params = model.init(k, **inputs)['params']
    ref = model.apply({'params': params}, **inputs)

    mesh = make_mesh({'pipe': 2, 'data': 4})
    p_sh = _place_pipelined(params, mesh)
    sh_inputs = shard_batch(inputs, mesh)
    with activation_sharding(mesh, pipe_interleave=2):
        got = jax.jit(lambda p, kw: model.apply({'params': p}, **kw))(
            p_sh, sh_inputs)
    for key in ('means', 'logweights', 'loggammas'):
        np.testing.assert_allclose(np.asarray(got[key]),
                                   np.asarray(ref[key]), rtol=2e-3,
                                   atol=2e-4, err_msg=key)


def test_pipeline_scan_tuple_carry_and_microbatch_fallback():
    """(img, txt)-style tuple carry; batch 3 with 4 stages falls back to
    M=3 (then M must divide B)."""
    mesh = make_mesh({'pipe': 4, 'data': 2})

    def layer(lvars, c, bc, li):
        a, b = c
        w = lvars['params']['w']
        return (jnp.tanh(a @ w) + b, b + 0.5 * jnp.tanh(b @ w))

    sv = _toy_stack(l=4)
    a = jax.random.normal(jax.random.PRNGKey(2), (3, 16))
    b = jax.random.normal(jax.random.PRNGKey(3), (3, 16))

    def ref(s):
        def step(c, w):
            return layer({'params': {'w': w}}, c, None, 0), None
        out, _ = jax.lax.scan(step, (a, b), s['params']['w'])
        return out

    ra, rb = ref(sv)
    with activation_sharding(mesh, batch_axes=('data',)):
        ga, gb = jax.jit(lambda s: pipeline_scan(
            layer, s, (a, b), None, mesh, 'pipe'))(sv)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ra), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), rtol=1e-5,
                               atol=1e-5)


def test_stacked_param_spec_and_partition_guards():
    x = jnp.zeros((8, 256, 512))
    assert stacked_param_spec(x, 'pipe', 4, 'fsdp', 2, 'tensor', 2,
                              min_size=1024) == P('pipe', 'fsdp', 'tensor')
    # layer dim not divisible by stages -> plain spec
    assert stacked_param_spec(jnp.zeros((3, 256, 512)), 'pipe', 4, 'fsdp',
                              2, min_size=1024) == \
        param_spec_for(jnp.zeros((3, 256, 512)), 'fsdp', 2, min_size=1024)
    # small stacked leaves still pin the layer dim (scan slices them)
    assert stacked_param_spec(jnp.zeros((8, 4)), 'pipe', 4,
                              min_size=1024) == P('pipe', None)

    assert pipe_partition(8) is None          # no mesh active
    mesh = make_mesh({'pipe': 4, 'data': 2})
    with activation_sharding(mesh):
        assert pipeline_active()
        m, axis, micro, inter = pipe_partition(8)
        assert axis == 'pipe' and micro is None and inter == 1
        assert pipe_partition(6) is None      # 6 layers % 4 stages != 0
    with activation_sharding(mesh, pipe_interleave=2):
        assert pipe_partition(8)[3] == 2      # 8 % (4*2) == 0
        assert pipe_partition(12)[3] == 1     # 12 % 8 != 0 -> degrade
    mesh2 = make_mesh({'data': 4, 'fsdp': 2})
    with activation_sharding(mesh2):
        assert not pipeline_active()
        assert pipe_partition(8) is None


def test_pipeline_disables_manual_attention_partitions():
    """Inside the pipe-manual region a nested manual shard_map cannot
    open: the Ulysses heads partition and the ring partition must both
    stand down (attention then runs on the GSPMD-partitionable XLA path)."""
    from arcflow_tpu.parallel.mesh import heads_partition
    from arcflow_tpu.parallel.ring_attention import ring_partition

    mesh = make_mesh({'pipe': 2, 'sp': 2, 'tensor': 2})
    with activation_sharding(mesh):
        assert heads_partition((2, 24, 4, 16)) is None
    with activation_sharding(mesh, sp_mode='ring'):
        assert ring_partition((2, 24, 4, 16)) is None


def _tiny_flux(checkpointing):
    from arcflow_tpu.models import ArcFluxTransformer2DModel
    net = dict(in_channels=16, num_layers=2, num_single_layers=4,
               attention_head_dim=16, num_attention_heads=4,
               joint_attention_dim=32, pooled_projection_dim=16,
               axes_dims_rope=(4, 6, 6), guidance_embeds=False,
               checkpointing=checkpointing)
    return ArcFluxTransformer2DModel(patch_size=2, num_gaussians=4, **net)


def _flux_inputs(batch=4, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    return dict(
        hidden_states=jax.random.normal(ks[0], (batch, 8, 8, 4)),
        t=jnp.full((batch,), 0.7),
        encoder_hidden_states=jax.random.normal(ks[1], (batch, 8, 32)),
        pooled_projections=jax.random.normal(ks[2], (batch, 16))), ks[3]


def _place_pipelined(params, mesh):
    axes = dict(mesh.shape)

    def place(path, x):
        ps = '/'.join(str(getattr(k, 'key', k)) for k in path)
        if 'blocks' in ps:
            spec = stacked_param_spec(
                x, 'pipe', axes.get('pipe', 1), 'fsdp', axes.get('fsdp', 1),
                'tensor', axes.get('tensor', 1), min_size=256)
        else:
            spec = param_spec_for(x, 'fsdp', axes.get('fsdp', 1), 'tensor',
                                  axes.get('tensor', 1), min_size=256)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


@pytest.mark.parametrize('axes', [{'pipe': 2, 'data': 2, 'tensor': 2},
                                  {'pipe': 4, 'data': 2},
                                  {'pipe': 2, 'sp': 2, 'data': 2}])
def test_flux_pipeline_forward_matches_unsharded(axes):
    model = _tiny_flux(checkpointing=False)
    inputs, k = _flux_inputs()
    params = model.init(k, **inputs)['params']
    ref = model.apply({'params': params}, **inputs)

    mesh = make_mesh(axes)
    p_sh = _place_pipelined(params, mesh)
    sh_inputs = shard_batch(inputs, mesh)
    with activation_sharding(mesh):
        got = jax.jit(lambda p, kw: model.apply({'params': p}, **kw))(
            p_sh, sh_inputs)
    for key in ('means', 'logweights', 'loggammas'):
        np.testing.assert_allclose(np.asarray(got[key]),
                                   np.asarray(ref[key]), rtol=2e-3,
                                   atol=2e-4, err_msg=key)


def test_flux_pipeline_grads_match_unsharded():
    """Remat-wrapped blocks, grads through the pipeline == plain scan."""
    model = _tiny_flux(checkpointing=True)
    inputs, k = _flux_inputs(seed=5)
    params = model.init(k, **inputs)['params']

    def loss(p):
        out = model.apply({'params': p}, **inputs)
        return (jnp.mean(out['means'] ** 2)
                + jnp.mean(out['loggammas'] ** 2))

    g_ref = jax.grad(loss)(params)
    mesh = make_mesh({'pipe': 2, 'data': 2, 'fsdp': 2})
    p_sh = _place_pipelined(params, mesh)
    with activation_sharding(mesh):
        g_pipe = jax.device_get(jax.jit(jax.grad(loss))(p_sh))
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_got = dict(jax.tree_util.tree_leaves_with_path(g_pipe))
    for path, leaf in flat_ref:
        got = flat_got[path]
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(leaf, np.float32),
            rtol=5e-3, atol=5e-4,
            err_msg=jax.tree_util.keystr(path))


def test_pipeline_program_keeps_weights_put():
    """The compiled pipelined forward moves activations with neighbour
    collective-permutes; the only gather-like traffic is reassembling the
    trunk output (never the stacked block weights — the point of PP over
    FSDP: parameters do not travel)."""
    from arcflow_tpu.parallel import audit_compiled, tree_bytes

    model = _tiny_flux(checkpointing=False)
    inputs, k = _flux_inputs(seed=9)
    params = model.init(k, **inputs)['params']
    mesh = make_mesh({'pipe': 4, 'data': 2})
    p_sh = _place_pipelined(params, mesh)
    sh_inputs = shard_batch(inputs, mesh)
    with activation_sharding(mesh):
        compiled = jax.jit(
            lambda p, kw: model.apply({'params': p}, **kw)).lower(
            p_sh, sh_inputs).compile()
    stats = audit_compiled(compiled)['collectives']
    assert stats['collective-permute']['count'] > 0, \
        f'pipeline must ppermute stage outputs: {stats}'
    block_bytes = tree_bytes({k_: v for k_, v in params.items()
                              if 'blocks' in k_})
    # output reassembly: both trunks gather their (M, B/M, N, D) f32 views
    # across 4 stages — bounded well below one traversal of the block
    # weights (which a replicate-weights fallback would exceed)
    assert stats['all-gather']['bytes'] < block_bytes, (
        stats, block_bytes)


def test_pipeline_with_int8_quantized_weights():
    """Serving path: the 'quant' collection (per-layer int8 scales) rides
    the pipeline with the stacked params — pipelined int8 forward matches
    the unsharded int8 forward."""
    from arcflow_tpu.utils.quantize import quantize_weights_int8

    model = _tiny_flux(checkpointing=False)
    inputs, k = _flux_inputs(seed=11)
    params = model.init(k, **inputs)['params']
    qparams, quant = quantize_weights_int8(params, min_size=1024)
    variables = {'params': qparams, 'quant': quant}
    ref = model.apply(variables, **inputs)

    mesh = make_mesh({'pipe': 4, 'data': 2})
    v_sh = _place_pipelined(variables, mesh)
    sh_inputs = shard_batch(inputs, mesh)
    with activation_sharding(mesh):
        got = jax.jit(lambda v, kw: model.apply(v, **kw))(v_sh, sh_inputs)
    for key in ('means', 'logweights', 'loggammas'):
        np.testing.assert_allclose(np.asarray(got[key]),
                                   np.asarray(ref[key]), rtol=2e-3,
                                   atol=2e-4, err_msg=key)


def test_qwen_pipeline_forward_matches_unsharded():
    """Qwen's 60-block family (here 4 blocks) with its text key mask under
    the pipeline schedule."""
    from arcflow_tpu.models import ArcQwenImageTransformer2DModel
    model = ArcQwenImageTransformer2DModel(
        in_channels=16, num_layers=4, attention_head_dim=16,
        num_attention_heads=4, joint_attention_dim=32,
        axes_dims_rope=(4, 6, 6), patch_size=2, num_gaussians=4,
        checkpointing=False)
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    mask = jnp.array([[1] * 6 + [0] * 2] * 4, jnp.int32)
    inputs = dict(
        hidden_states=jax.random.normal(ks[0], (4, 8, 8, 4)),
        t=jnp.full((4,), 0.5),
        encoder_hidden_states=jax.random.normal(ks[1], (4, 8, 32)),
        encoder_hidden_states_mask=mask)
    params = model.init(ks[2], **inputs)['params']
    ref = model.apply({'params': params}, **inputs)

    mesh = make_mesh({'pipe': 4, 'data': 2})
    p_sh = _place_pipelined(params, mesh)
    sh_inputs = shard_batch(inputs, mesh)
    with activation_sharding(mesh):
        got = jax.jit(lambda p, kw: model.apply({'params': p}, **kw))(
            p_sh, sh_inputs)
    for key in ('means', 'logweights', 'loggammas'):
        np.testing.assert_allclose(np.asarray(got[key]),
                                   np.asarray(ref[key]), rtol=2e-3,
                                   atol=2e-4, err_msg=key)
