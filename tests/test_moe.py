"""Mixture-of-experts FFN (expert-choice routing) + expert parallelism —
capability beyond the reference (SURVEY.md §2.4: EP/MoE ABSENT).

Covers: the routing math (single-expert degenerate case == dense FFN,
capacity bounds, unchosen tokens contribute zero), EP placement specs,
sharded == unsharded on an expert mesh (forward and grads), and the tiny
ArcFlux model with MoE joint-block MLPs end to end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from arcflow_tpu.models.layers import MoEFeedForward
from arcflow_tpu.parallel import (activation_sharding, make_mesh,
                                  moe_param_spec, param_spec_for,
                                  shard_batch, shard_state)


def _make(e, cf=1.0, d=16, mult=2):
    return MoEFeedForward(dim=d, num_experts=e, capacity_factor=cf,
                          mult=mult, dtype=jnp.float32)


def test_single_expert_full_capacity_equals_dense_ffn():
    """E=1 with capacity covering every token routes everything through
    the one expert at gate 1.0 — identical to the plain gelu FFN with the
    same weights."""
    moe = _make(1, cf=1.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 16))
    params = moe.init(jax.random.PRNGKey(1), x)['params']
    got = moe.apply({'params': params}, x)

    w_in, b_in = params['w_in'][0], params['b_in'][0]
    w_out, b_out = params['w_out'][0], params['b_out'][0]
    ref = jax.nn.gelu(x @ w_in + b_in, approximate=True) @ w_out + b_out
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_expert_choice_capacity_and_passthrough():
    """Each expert takes exactly C = S·cf/E tokens; a token chosen by no
    expert contributes zero to the MoE output (its residual path carries
    it)."""
    moe = _make(4, cf=0.5, d=8)   # C = 8*0.5/4 = 1 token per expert
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8))
    params = moe.init(jax.random.PRNGKey(3), x)['params']
    y = moe.apply({'params': params}, x)
    assert y.shape == x.shape
    # at most E*C = 4 tokens can receive any output
    row_norm = jnp.linalg.norm(y[0], axis=-1)
    assert int(jnp.sum(row_norm > 1e-7)) <= 4
    assert bool(jnp.all(jnp.isfinite(y)))


def test_moe_param_spec_rules():
    w = jnp.zeros((8, 256, 512))
    assert moe_param_spec(w, 'expert', 8, fsdp_axis='fsdp', fsdp_size=2,
                          tensor_axis='tensor', tensor_size=2,
                          min_size=1024) == P('expert', 'fsdp', 'tensor')
    # scan-stacked (L, E, D, F): layer dim -> pipe, expert dim 1
    w4 = jnp.zeros((4, 8, 256, 512))
    assert moe_param_spec(w4, 'expert', 8, stacked=True, pipe_axis='pipe',
                          pipe_size=2, fsdp_axis='fsdp', fsdp_size=2,
                          tensor_axis='tensor', tensor_size=2,
                          min_size=1024) == \
        P('pipe', 'expert', 'fsdp', 'tensor')
    # expert dim not divisible -> stays unsharded on that dim
    assert moe_param_spec(jnp.zeros((3, 64, 64)), 'expert', 2,
                          min_size=1024)[0] is None


def test_expert_parallel_matches_unsharded():
    """EP forward + grads on an (expert, data) mesh == single device."""
    moe = _make(4, cf=1.0, d=32, mult=2)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 16, 32))
    params = moe.init(jax.random.PRNGKey(5), x)['params']
    ref = moe.apply({'params': params}, x)

    def loss(p, xx):
        return jnp.sum(moe.apply({'params': p}, xx) ** 2)

    g_ref = jax.grad(loss)(params, x)

    mesh = make_mesh({'expert': 4, 'data': 2})
    p_sh = jax.tree.map(
        lambda w: jax.device_put(w, NamedSharding(mesh, moe_param_spec(
            w, 'expert', 4, min_size=256))), params)
    x_sh = shard_batch({'x': x}, mesh)['x']
    with activation_sharding(mesh):
        got = jax.jit(lambda p, xx: moe.apply({'params': p}, xx))(p_sh, x_sh)
        g_sh = jax.device_get(jax.jit(jax.grad(loss))(p_sh, x_sh))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4,
                               atol=2e-5)
    for k in g_ref:
        np.testing.assert_allclose(np.asarray(g_sh[k]),
                                   np.asarray(g_ref[k]), rtol=2e-3,
                                   atol=2e-4, err_msg=k)


def test_moe_composes_with_pipeline():
    """pipe x expert: MoE joint blocks run inside the GPipe stage body
    (expert axis stays GSPMD-auto there); stacked expert weights place as
    P('pipe', 'expert', ...). Output matches unsharded."""
    from arcflow_tpu.models import ArcFluxTransformer2DModel
    from arcflow_tpu.parallel import param_spec_for_path
    from jax.sharding import PartitionSpec as P

    net = dict(in_channels=16, num_layers=2, num_single_layers=2,
               attention_head_dim=16, num_attention_heads=4,
               joint_attention_dim=32, pooled_projection_dim=16,
               axes_dims_rope=(4, 6, 6), guidance_embeds=False,
               moe_experts=2, moe_capacity_factor=1.0,
               checkpointing=False)
    model = ArcFluxTransformer2DModel(patch_size=2, num_gaussians=4, **net)
    ks = jax.random.split(jax.random.PRNGKey(10), 4)
    inputs = dict(
        hidden_states=jax.random.normal(ks[0], (4, 8, 8, 4)),
        t=jnp.full((4,), 0.7),
        encoder_hidden_states=jax.random.normal(ks[1], (4, 8, 32)),
        pooled_projections=jax.random.normal(ks[2], (4, 16)))
    params = model.init(ks[3], **inputs)['params']
    ref = model.apply({'params': params}, **inputs)

    mesh = make_mesh({'pipe': 2, 'expert': 2, 'data': 2})
    w = params['joint_blocks']['ff_img']['moe']['w_in']
    assert param_spec_for_path('joint_blocks/ff_img/moe/w_in', w, mesh,
                               min_size=256) == \
        P('pipe', 'expert', None, None)

    def place(path, x):
        ps = '/'.join(str(getattr(k, 'key', k)) for k in path)
        return jax.device_put(x, NamedSharding(
            mesh, param_spec_for_path(ps, x, mesh, min_size=256)))

    p_sh = jax.tree_util.tree_map_with_path(place, params)
    sh_inputs = shard_batch(inputs, mesh)
    with activation_sharding(mesh):
        got = jax.jit(lambda p, kw: model.apply({'params': p}, **kw))(
            p_sh, sh_inputs)
    for key in ('means', 'logweights', 'loggammas'):
        np.testing.assert_allclose(np.asarray(got[key]),
                                   np.asarray(ref[key]), rtol=2e-3,
                                   atol=2e-4, err_msg=key)


def test_qwen_moe_model_runs():
    """The Qwen family exposes the same MoE surface: tiny ArcQwen with
    moe_experts=2 initializes MoE params under the blocks and produces a
    finite mixture output."""
    from arcflow_tpu.models import ArcQwenImageTransformer2DModel
    model = ArcQwenImageTransformer2DModel(
        in_channels=16, num_layers=2, attention_head_dim=16,
        num_attention_heads=4, joint_attention_dim=32,
        axes_dims_rope=(4, 6, 6), patch_size=2, num_gaussians=4,
        moe_experts=2, checkpointing=False)
    ks = jax.random.split(jax.random.PRNGKey(8), 3)
    mask = jnp.array([[1] * 6 + [0] * 2] * 2, jnp.int32)
    inputs = dict(
        hidden_states=jax.random.normal(ks[0], (2, 8, 8, 4)),
        t=jnp.full((2,), 0.5),
        encoder_hidden_states=jax.random.normal(ks[1], (2, 8, 32)),
        encoder_hidden_states_mask=mask)
    params = model.init(ks[2], **inputs)['params']
    assert 'moe' in params['transformer_blocks']['ff_txt']
    out = model.apply({'params': params}, **inputs)
    assert bool(jnp.all(jnp.isfinite(out['means'])))


def test_flux_moe_model_forward_and_ep_mesh():
    """Tiny ArcFlux with MoE joint-block MLPs: params land under
    ff_*/moe/*, the model runs, and the EP-sharded forward matches the
    unsharded one."""
    from arcflow_tpu.models import ArcFluxTransformer2DModel
    net = dict(in_channels=16, num_layers=2, num_single_layers=2,
               attention_head_dim=16, num_attention_heads=4,
               joint_attention_dim=32, pooled_projection_dim=16,
               axes_dims_rope=(4, 6, 6), guidance_embeds=False,
               moe_experts=2, moe_capacity_factor=1.0,
               checkpointing=False)
    model = ArcFluxTransformer2DModel(patch_size=2, num_gaussians=4, **net)
    ks = jax.random.split(jax.random.PRNGKey(6), 4)
    inputs = dict(
        hidden_states=jax.random.normal(ks[0], (2, 8, 8, 4)),
        t=jnp.full((2,), 0.7),
        encoder_hidden_states=jax.random.normal(ks[1], (2, 8, 32)),
        pooled_projections=jax.random.normal(ks[2], (2, 16)))
    params = model.init(ks[3], **inputs)['params']
    moe_leaves = params['joint_blocks']['ff_img']['moe']
    assert moe_leaves['w_in'].shape == (2, 2, 64, 256)   # (L, E, D, 4D)
    ref = model.apply({'params': params}, **inputs)

    mesh = make_mesh({'expert': 2, 'data': 2, 'tensor': 2})

    def place(path, w):
        ps = '/'.join(str(getattr(k, 'key', k)) for k in path)
        if 'moe' in ps:
            spec = moe_param_spec(w, 'expert', 2, stacked='blocks' in ps,
                                  tensor_axis='tensor', tensor_size=2,
                                  min_size=256)
        else:
            spec = param_spec_for(w, None, 1, 'tensor', 2, min_size=256)
        return jax.device_put(w, NamedSharding(mesh, spec))

    p_sh = jax.tree_util.tree_map_with_path(place, params)
    sh_inputs = shard_batch(inputs, mesh)
    with activation_sharding(mesh):
        got = jax.jit(lambda p, kw: model.apply({'params': p}, **kw))(
            p_sh, sh_inputs)
    for key in ('means', 'logweights', 'loggammas'):
        np.testing.assert_allclose(np.asarray(got[key]),
                                   np.asarray(ref[key]), rtol=2e-3,
                                   atol=2e-4, err_msg=key)
