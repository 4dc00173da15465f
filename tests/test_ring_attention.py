"""Ring (context-parallel) attention: parity with full attention on the
simulated 8-device CPU mesh, autodiff, routing, and the full-model forward
under ``sp_mode='ring'``. Capability beyond the reference (it has no
sequence parallelism at all; SURVEY.md §2.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from arcflow_tpu.parallel import (activation_sharding, make_mesh,
                                  ring_attention, ring_partition)


def _qkv(key, b=2, s=32, h=4, d=16):
    ks = jax.random.split(key, 3)
    return tuple(jax.random.normal(k, (b, s, h, d), jnp.float32) for k in ks)


def test_ring_matches_full_attention():
    q, k, v = _qkv(jax.random.PRNGKey(0))
    ref = jax.nn.dot_product_attention(q, k, v)
    mesh = make_mesh({'data': 2, 'sp': 4})
    got = ring_attention(q, k, v, mesh, 'sp', batch='data')
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_ring_matches_with_key_padding_mask():
    q, k, v = _qkv(jax.random.PRNGKey(1))
    kv_valid = jnp.arange(32)[None, :] < jnp.asarray([20, 29])[:, None]
    ref = jax.nn.dot_product_attention(
        q, k, v, mask=kv_valid[:, None, None, :])
    mesh = make_mesh({'data': 2, 'sp': 4})
    got = ring_attention(q, k, v, mesh, 'sp', kv_valid=kv_valid,
                         batch='data')
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_ring_composes_with_tensor_axis():
    """Heads split over 'tensor' inside the same shard_map — attention is
    per-head, so TP composes with the ring without any extra collective."""
    q, k, v = _qkv(jax.random.PRNGKey(2), h=4)
    ref = jax.nn.dot_product_attention(q, k, v)
    mesh = make_mesh({'sp': 4, 'tensor': 2})
    got = ring_attention(q, k, v, mesh, 'sp', head_axes=('tensor',))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_ring_gradients_match():
    """The scan+ppermute formulation is reverse-differentiable; grads match
    the dense softmax attention."""
    q, k, v = _qkv(jax.random.PRNGKey(3), b=1, s=16, h=2, d=8)
    mesh = make_mesh({'sp': 8})

    def loss_ring(q, k, v):
        return jnp.sum(jnp.square(ring_attention(q, k, v, mesh, 'sp')))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.square(jax.nn.dot_product_attention(q, k, v)))

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_ring_partition_guards():
    """ring_partition fires only under sp_mode='ring' with divisible seq;
    it does NOT require heads % sp == 0 (ring's advantage over Ulysses)."""
    assert ring_partition((2, 24, 4, 16)) is None   # no mesh

    mesh = make_mesh({'data': 2, 'sp': 4})
    with activation_sharding(mesh):                  # ulysses (default)
        assert ring_partition((2, 24, 4, 16)) is None
    with activation_sharding(mesh, sp_mode='ring'):
        got = ring_partition((2, 24, 4, 16))
        assert got is not None
        _, sp, batch, head_axes = got
        assert sp == 'sp' and batch == ('data',) and head_axes == ()
        # 3 heads do not divide sp=4 — ring still applies (seq divides)
        assert ring_partition((2, 24, 3, 16)) is not None
        # seq must divide the ring size
        assert ring_partition((2, 23, 4, 16)) is None

    mesh2 = make_mesh({'data': 2, 'sp': 2, 'tensor': 2})
    with activation_sharding(mesh2, sp_mode='ring'):
        _, sp, batch, head_axes = ring_partition((2, 24, 4, 16))
        assert head_axes == ('tensor',)
        # heads must divide the tensor axis when one is present
        assert ring_partition((2, 24, 3, 16)) is None


def test_attention_routes_ring_and_matches():
    """models.layers.attention under sp_mode='ring': ring layout on the
    'heads' pin (no all-to-all) and output parity — including a head count
    Ulysses could not shard (3 heads, sp=4)."""
    from arcflow_tpu.models.layers import attention

    q, k, v = _qkv(jax.random.PRNGKey(4), b=2, s=32, h=3, d=16)
    ref = jax.nn.dot_product_attention(q, k, v)
    mesh = make_mesh({'data': 2, 'sp': 4})
    with activation_sharding(mesh, sp_mode='ring'):
        got = jax.jit(attention)(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)

    # key-padding mask lowers to per-shard kv validity
    kv_valid = jnp.arange(32)[None, :] < jnp.asarray([20, 29])[:, None]
    mask = kv_valid[:, None, None, :]
    ref_m = jax.nn.dot_product_attention(q, k, v, mask=mask)
    with activation_sharding(mesh, sp_mode='ring'):
        got_m = jax.jit(attention)(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(ref_m),
                               rtol=2e-5, atol=2e-6)


def test_heads_pin_keeps_seq_sharded_in_ring_mode():
    from arcflow_tpu.parallel import shard_activation
    mesh = make_mesh({'data': 2, 'sp': 2, 'tensor': 2})
    with activation_sharding(mesh, sp_mode='ring'):
        out = jax.jit(lambda x: shard_activation(x, 'heads') * 2)(
            jnp.zeros((4, 16, 4, 8)))
        assert out.sharding.spec[1] == 'sp', out.sharding
        assert out.sharding.spec[2] == 'tensor', out.sharding
    with activation_sharding(mesh):   # ulysses re-shards to heads
        out = jax.jit(lambda x: shard_activation(x, 'heads') * 2)(
            jnp.zeros((4, 16, 4, 8)))
        assert out.sharding.spec[2] == ('sp', 'tensor'), out.sharding


def test_hop_stats_pallas_matches_ref():
    """The Pallas hop kernel's (normalized o, l, m) residual contract vs
    the jnp mirror, single device in interpret mode (interpret-mode Pallas
    cannot run inside a multi-device shard_map — the ring merge itself is
    tested below through the mirror). Includes a fully-masked row block,
    whose contract is l == kv_len / m ~= DEFAULT_MASK_VALUE / o == mean(v)
    (masking is additive in the kernel)."""
    from jax.experimental.pallas import tpu as pltpu
    import importlib
    ra = importlib.import_module('arcflow_tpu.parallel.ring_attention')
    q, k, v = _qkv(jax.random.PRNGKey(6), b=2, s=256, h=2, d=128)
    qt, kt, vt = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
    scale = 1.0 / (128 ** 0.5)
    q_ids = jnp.zeros((2, 256), jnp.int32)
    # row 0 entirely padded (l == 0 everywhere), row 1 partially padded
    kv_valid = jnp.arange(256)[None, :] < jnp.asarray([0, 200])[:, None]
    kv_ids = jnp.where(kv_valid, 0, 1).astype(jnp.int32)
    for ids in (None, kv_ids):
        qi = None if ids is None else q_ids
        with pltpu.force_tpu_interpret_mode():
            o_p, l_p, m_p = ra._hop_stats_pallas(qt, kt, vt, qi, ids, scale)
        o_r, l_r, m_r = ra._hop_stats_ref(qt, kt, vt, qi, ids, scale)
        np.testing.assert_allclose(np.asarray(l_p), np.asarray(l_r),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(m_p), np.asarray(m_r),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(o_p), np.asarray(o_r),
                                   rtol=2e-3, atol=2e-3)


@pytest.fixture
def ref_hop(monkeypatch):
    """Route the flash tier's hops through the jnp mirror of the Pallas
    residual contract (kernel-vs-mirror parity is asserted above)."""
    import importlib
    ra = importlib.import_module('arcflow_tpu.parallel.ring_attention')
    monkeypatch.setattr(ra, '_hop_stats', ra._hop_stats_ref)


def test_ring_flash_hops_match_full_attention(ref_hop):
    """The flash-per-hop tier: per-hop (o, l, m) stats merge across the
    ring to the exact softmax."""
    q, k, v = _qkv(jax.random.PRNGKey(6), b=2, s=512, h=2, d=128)
    ref = jax.nn.dot_product_attention(q, k, v)
    mesh = make_mesh({'sp': 4, 'data': 2})
    got = ring_attention(q, k, v, mesh, 'sp', batch='data', use_flash=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_ring_flash_hops_match_with_mask(ref_hop):
    """Key-padding ids travel the ring; a hop whose visiting block is
    entirely padded must contribute zero weight (l_i == 0 guard)."""
    q, k, v = _qkv(jax.random.PRNGKey(7), b=2, s=512, h=2, d=128)
    # rows valid up to 200/383: the last shard (384:512) is fully padded
    # for row 0 — exercises the fully-masked-hop guard
    kv_valid = jnp.arange(512)[None, :] < jnp.asarray([200, 383])[:, None]
    ref = jax.nn.dot_product_attention(q, k, v,
                                       mask=kv_valid[:, None, None, :])
    mesh = make_mesh({'sp': 4, 'data': 2})
    got = ring_attention(q, k, v, mesh, 'sp', kv_valid=kv_valid,
                         batch='data', use_flash=True)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_ring_flash_grad_remats_through_jnp_tier(ref_hop):
    """custom_vjp on the flash tier: gradients flow (rematerialized through
    the jnp tier) and match dense attention's."""
    q, k, v = _qkv(jax.random.PRNGKey(8), b=1, s=256, h=1, d=128)
    mesh = make_mesh({'sp': 2, 'data': 4})

    def loss_ring(q, k, v):
        out = ring_attention(q, k, v, mesh, 'sp', use_flash=True)
        return jnp.sum(jnp.square(out))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.square(jax.nn.dot_product_attention(q, k, v)))

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_arcflux_forward_ring_matches_unsharded():
    """Full ArcFlux forward under ring sequence parallelism (+TP) == the
    unsharded single-device forward."""
    from arcflow_tpu.models import ArcFluxTransformer2DModel
    from arcflow_tpu.parallel import param_spec_for, shard_batch
    from jax.sharding import NamedSharding

    net = dict(in_channels=16, num_layers=2, num_single_layers=2,
               attention_head_dim=16, num_attention_heads=4,
               joint_attention_dim=32, pooled_projection_dim=16,
               axes_dims_rope=(4, 6, 6), guidance_embeds=False,
               checkpointing=False)
    model = ArcFluxTransformer2DModel(patch_size=2, num_gaussians=4, **net)
    ks = jax.random.split(jax.random.PRNGKey(5), 4)
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
    with activation_sharding(mesh, sp_mode='ring'):
        fn = jax.jit(lambda p, kw: model.apply({'params': p}, **kw))
        got = fn(sharded_params, sh_inputs)
    for key in ('means', 'logweights', 'loggammas'):
        np.testing.assert_allclose(np.asarray(got[key]),
                                   np.asarray(ref[key]), rtol=2e-3,
                                   atol=2e-4, err_msg=key)
