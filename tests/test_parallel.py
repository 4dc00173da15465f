"""Mesh sharding: FSDP/TP param specs + the full multichip dry run on the
simulated 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from arcflow_tpu.parallel import (make_mesh, param_spec_for, shard_batch,
                                  shard_state)


def test_make_mesh_shapes():
    mesh = make_mesh({'data': 2, 'fsdp': 4})
    assert dict(mesh.shape) == {'data': 2, 'fsdp': 4}
    mesh2 = make_mesh({'data': 2, 'fsdp': -1})
    assert mesh2.shape['fsdp'] == 4


def test_param_spec_rules():
    x = jnp.zeros((1024, 512))
    # fsdp only: largest dim sharded
    assert param_spec_for(x, 'fsdp', 4, min_size=1024) == P('fsdp', None)
    # tp+fsdp: feature dim on tensor, largest remaining on fsdp
    assert param_spec_for(x, 'fsdp', 4, 'tensor', 2, min_size=1024) == \
        P('fsdp', 'tensor')
    # small arrays replicate
    assert param_spec_for(jnp.zeros((4,)), 'fsdp', 4, min_size=1024) == P()
    # stacked scan layers (L, in, out)
    y = jnp.zeros((8, 256, 512))
    spec = param_spec_for(y, 'fsdp', 4, 'tensor', 2, min_size=1024)
    assert spec == P(None, 'fsdp', 'tensor') or spec == P('fsdp', None, 'tensor')


def test_dryrun_multichip_8dev():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_sharded_matches_single_device():
    """The same train step gives the same loss sharded vs unsharded."""
    import optax
    from arcflow_tpu.runner import TrainState, build_train_step

    class M:
        def loss(self, tr, fr, rng, batch, running_status=None):
            w = tr['net']['w']
            pred = batch['x'] @ w
            return jnp.square(pred - batch['y']).mean(), {}

    w0 = jax.random.normal(jax.random.PRNGKey(0), (64, 64))
    batch = {'x': jax.random.normal(jax.random.PRNGKey(1), (16, 64)),
             'y': jax.random.normal(jax.random.PRNGKey(2), (16, 64))}
    opt = {'net': optax.sgd(0.1)}

    def run(shard):
        state = TrainState.create(jax.random.PRNGKey(3),
                                  {'net': {'w': w0}}, {}, opt)
        step = build_train_step(M(), opt, donate=False)
        b = batch
        if shard:
            mesh = make_mesh({'data': 2, 'fsdp': 4})
            state, _ = shard_state(state, mesh, min_size=1024)
            b = shard_batch(batch, mesh)
        state, logs = step(state, b)
        return float(logs['loss']), np.asarray(state.trainable['net']['w'])

    loss_1, w_1 = run(False)
    loss_n, w_n = run(True)
    np.testing.assert_allclose(loss_1, loss_n, rtol=1e-5)
    np.testing.assert_allclose(w_1, w_n, rtol=1e-5, atol=1e-6)


def test_shard_activation_constraint_applies():
    """The constraint must actually pin activations to the tensor axis
    (GSPMD propagates it to the jit output when nothing re-shards after)."""
    from arcflow_tpu.parallel import activation_sharding, make_mesh, \
        shard_activation
    mesh = make_mesh({'data': 2, 'fsdp': 2, 'tensor': 2})
    with activation_sharding(mesh):
        heads = jax.jit(lambda x: shard_activation(x, 'heads') * 2)(
            jnp.zeros((4, 16, 4, 8)))
        hidden = jax.jit(lambda x: shard_activation(x, 'hidden') * 2)(
            jnp.zeros((4, 16, 32)))
    assert heads.sharding.spec[2] == 'tensor', heads.sharding
    assert hidden.sharding.spec[2] == 'tensor', hidden.sharding
    assert heads.sharding.spec[0] == ('data', 'fsdp')
    # no-op outside the context
    out = jax.jit(lambda x: shard_activation(x, 'heads') * 2)(
        jnp.zeros((4, 16, 4, 8)))
    assert out.sharding.is_fully_replicated


def test_tensor_parallel_forward_matches_unsharded():
    """ArcFlux forward with TP activation constraints on a (data,fsdp,tensor)
    mesh == the unsharded single-device forward."""
    from arcflow_tpu.models import ArcFluxTransformer2DModel
    from arcflow_tpu.parallel import (activation_sharding, make_mesh,
                                      param_spec_for, shard_batch)
    from jax.sharding import NamedSharding

    net = dict(in_channels=16, num_layers=2, num_single_layers=2,
               attention_head_dim=16, num_attention_heads=4,
               joint_attention_dim=32, pooled_projection_dim=16,
               axes_dims_rope=(4, 6, 6), guidance_embeds=False,
               checkpointing=False)
    model = ArcFluxTransformer2DModel(patch_size=2, num_gaussians=4, **net)
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    inputs = dict(
        hidden_states=jax.random.normal(ks[0], (4, 8, 8, 4)),
        t=jnp.full((4,), 0.7),
        encoder_hidden_states=jax.random.normal(ks[1], (4, 8, 32)),
        pooled_projections=jax.random.normal(ks[2], (4, 16)))
    params = model.init(ks[3], **inputs)['params']
    ref = model.apply({'params': params}, **inputs)

    mesh = make_mesh({'data': 2, 'fsdp': 2, 'tensor': 2})
    sharded_params = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, param_spec_for(
            x, 'fsdp', 2, 'tensor', 2, min_size=256))), params)
    sh_inputs = shard_batch(inputs, mesh)
    with activation_sharding(mesh):
        fn = jax.jit(lambda p, kw: model.apply({'params': p}, **kw))
        got = fn(sharded_params, sh_inputs)
    for key in ('means', 'logweights', 'loggammas'):
        np.testing.assert_allclose(np.asarray(got[key]),
                                   np.asarray(ref[key]), rtol=2e-3,
                                   atol=2e-4, err_msg=key)


def test_sequence_parallel_forward_matches_unsharded():
    """Ulysses-style SP: token activations shard over 'sp' between blocks,
    re-shard to heads inside attention; outputs match the unsharded run."""
    from arcflow_tpu.models import ArcFluxTransformer2DModel
    from arcflow_tpu.parallel import (activation_sharding, make_mesh,
                                      param_spec_for, shard_batch,
                                      shard_activation)
    from jax.sharding import NamedSharding

    net = dict(in_channels=16, num_layers=2, num_single_layers=2,
               attention_head_dim=16, num_attention_heads=4,
               joint_attention_dim=32, pooled_projection_dim=16,
               axes_dims_rope=(4, 6, 6), guidance_embeds=False,
               checkpointing=False)
    model = ArcFluxTransformer2DModel(patch_size=2, num_gaussians=4, **net)
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    inputs = dict(
        hidden_states=jax.random.normal(ks[0], (2, 8, 8, 4)),
        t=jnp.full((2,), 0.7),
        encoder_hidden_states=jax.random.normal(ks[1], (2, 8, 32)),
        pooled_projections=jax.random.normal(ks[2], (2, 16)))
    params = model.init(ks[3], **inputs)['params']
    ref = model.apply({'params': params}, **inputs)

    mesh = make_mesh({'data': 2, 'sp': 2, 'tensor': 2})
    sharded_params = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, param_spec_for(
            x, None, 1, 'tensor', 2, min_size=256))), params)
    sh_inputs = shard_batch(inputs, mesh)
    with activation_sharding(mesh):
        # the residual constraint puts tokens on the sp axis
        tok = jax.jit(lambda x: shard_activation(x, 'residual') * 1.0)(
            jnp.zeros((2, 16, 32)))
        assert tok.sharding.spec[1] == 'sp', tok.sharding
        fn = jax.jit(lambda p, kw: model.apply({'params': p}, **kw))
        got = fn(sharded_params, sh_inputs)
    for key in ('means', 'logweights', 'loggammas'):
        np.testing.assert_allclose(np.asarray(got[key]),
                                   np.asarray(ref[key]), rtol=2e-3,
                                   atol=2e-4, err_msg=key)


def test_hybrid_mesh_dcn_axes_fallback():
    """dcn_axes produces a (dcn x ici) mesh; on simulated devices the
    topology-aware builder falls back to a plain reshape."""
    from arcflow_tpu.parallel import make_mesh
    m = make_mesh({'data': 1, 'fsdp': -1}, dcn_axes={'data': 2})
    assert dict(m.shape) == {'data': 2, 'fsdp': 4}


def test_heads_partition_guards():
    """heads_partition: returns the Ulysses spec only when the mesh shards
    sp/tensor AND heads divide the combined shard size."""
    from arcflow_tpu.parallel import activation_sharding, make_mesh
    from arcflow_tpu.parallel.mesh import heads_partition

    assert heads_partition((2, 24, 4, 16)) is None   # no mesh active

    mesh = make_mesh({'data': 2, 'sp': 2, 'tensor': 2})
    with activation_sharding(mesh):
        got = heads_partition((2, 24, 4, 16))
        assert got is not None
        _, spec = got
        assert spec == P('data', None, ('sp', 'tensor'), None)
        # heads (3) not divisible by sp*tensor (4) -> no shard_map
        assert heads_partition((2, 24, 3, 16)) is None
        # batch 1 (init trace): batch axis dropped, heads still sharded
        _, spec1 = heads_partition((1, 24, 4, 16))
        assert spec1 == P(None, None, ('sp', 'tensor'), None)

    mesh2 = make_mesh({'data': 4, 'fsdp': 2})
    with activation_sharding(mesh2):
        assert heads_partition((2, 24, 4, 16)) is None   # no sp/tensor
