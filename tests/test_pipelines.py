"""Weight conversion roundtrips, adapter export/load, end-user pipeline."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arcflow_tpu.models import (ARCFLUX_ADAPTER_KEYS,
                                ArcFluxTransformer2DModel,
                                FluxTransformer2DModel)
from arcflow_tpu.pipelines import (ArcFluxPipeline, flax_to_torch_flux,
                                   graft_pretrained, load_adapter_state,
                                   retrieve_raw_timesteps, save_adapter_state,
                                   torch_flux_to_flax,
                                   expand_proj_out_to_arc_heads)
from arcflow_tpu.utils.pytree import flatten, partition_params

TINY = dict(in_channels=16, num_layers=2, num_single_layers=3,
            attention_head_dim=32, num_attention_heads=4,
            joint_attention_dim=64, pooled_projection_dim=32,
            axes_dims_rope=(8, 12, 12), guidance_embeds=True,
            checkpointing=False)


def tiny_teacher_params():
    teacher = FluxTransformer2DModel(patch_size=2, **TINY)
    inputs = dict(hidden_states=jnp.zeros((1, 8, 8, 4)),
                  t=jnp.zeros((1,)),
                  encoder_hidden_states=jnp.zeros((1, 6, 64)),
                  pooled_projections=jnp.zeros((1, 32)),
                  guidance=jnp.zeros((1,)))
    return teacher, teacher.init(jax.random.PRNGKey(0), **inputs)['params'], \
        inputs


def test_convert_roundtrip_identity():
    """flax -> torch naming -> flax must be the identity (mapping coverage)."""
    teacher, params, _ = tiny_teacher_params()
    torch_state = flax_to_torch_flux(params)
    # every torch key is per-block (no stacked leaks)
    assert all(not k.startswith(('joint_blocks', 'single_blocks'))
               for k in torch_state)
    tree, unused = torch_flux_to_flax(torch_state, num_layers=2,
                                      num_single_layers=3)
    assert not unused, f'unconverted keys: {list(unused)[:5]}'
    merged, missing, unexpected = graft_pretrained(params, tree)
    assert not missing, missing[:5]
    assert not unexpected, unexpected[:5]
    for k, v in flatten(params).items():
        np.testing.assert_allclose(np.asarray(v),
                                   np.asarray(flatten(merged)[k]),
                                   rtol=1e-6, err_msg=k)


def test_converted_teacher_runs_identically():
    teacher, params, inputs = tiny_teacher_params()
    out_ref = teacher.apply({'params': params}, **inputs)
    tree, _ = torch_flux_to_flax(flax_to_torch_flux(params), 2, 3)
    out_conv = teacher.apply({'params': tree}, **inputs)
    np.testing.assert_allclose(np.asarray(out_ref), np.asarray(out_conv),
                               atol=1e-5)


def test_expand_proj_out():
    teacher, params, _ = tiny_teacher_params()
    k = 4
    expanded = expand_proj_out_to_arc_heads(params, num_gaussians=k,
                                            patch_size=2,
                                            rng=jax.random.PRNGKey(1))
    flat = flatten(expanded)
    assert 'proj_out.kernel' not in flat
    kern = np.asarray(flat['proj_out_means.kernel'])
    base = np.asarray(flatten(params)['proj_out.kernel'])   # (D, p2*C)
    d, out = base.shape
    assert kern.shape == (d, k * out)
    # each component's kernel block equals the teacher's
    kern_k = kern.reshape(d, k, out)
    for i in range(k):
        np.testing.assert_allclose(kern_k[:, i], base, rtol=1e-6)
    # bias noise shared across patch cells, distinct across components
    bias = np.asarray(flat['proj_out_means.bias']).reshape(k, 4, out // 4)
    np.testing.assert_allclose(bias[:, 0], bias[:, 1], rtol=1e-6)
    assert np.abs(bias[0] - bias[1]).max() > 1e-4


def test_adapter_export_load_roundtrip(tmp_path):
    student = ArcFluxTransformer2DModel(num_gaussians=4, patch_size=2,
                                        lora_rank=4, **TINY)
    inputs = dict(hidden_states=jnp.zeros((1, 8, 8, 4)), t=jnp.zeros((1,)),
                  encoder_hidden_states=jnp.zeros((1, 6, 64)),
                  pooled_projections=jnp.zeros((1, 32)),
                  guidance=jnp.zeros((1,)))
    params = student.init(jax.random.PRNGKey(2), **inputs)['params']
    adapter, _ = partition_params(params, ARCFLUX_ADAPTER_KEYS)

    path = str(tmp_path / 'adapter.safetensors')
    policy = dict(policy_type='ArcFlow', nfe=2, timestep_ratio=1.0,
                  num_gaussians=4)
    save_adapter_state(path, adapter, policy_config=policy)

    tree, policy_loaded = load_adapter_state(path)
    assert policy_loaded == policy
    a_flat, t_flat = flatten(adapter), flatten(tree)
    assert set(a_flat) == set(t_flat), (
        set(a_flat) ^ set(t_flat))
    for k in a_flat:
        np.testing.assert_allclose(np.asarray(a_flat[k]),
                                   np.asarray(t_flat[k]), rtol=1e-6,
                                   err_msg=k)


def _pack_ref_torch(lat):
    """diffusers/reference packing: (B,C,H,W) -> (B, N, C*p*p) with feature
    layout (c, p, p) (diffusers _pack_latents; reference arcflux.py patchify
    permute(0,1,3,5,2,4))."""
    import torch
    b, c, h, w = lat.shape
    x = lat.view(b, c, h // 2, 2, w // 2, 2)
    x = x.permute(0, 2, 4, 1, 3, 5)
    return x.reshape(b, (h // 2) * (w // 2), c * 4)


def test_packed_layout_x_embedder_matches_reference_torch():
    """Converted x_embedder weights must give the same outputs on identical
    latents as a reference-style (c,p,p)-packed torch forward."""
    import torch
    from arcflow_tpu.models.flux import patchify
    torch.manual_seed(0)
    b, c, h, w, d = 2, 4, 8, 8, 6
    lat = torch.randn(b, c, h, w)
    weight = torch.randn(d, c * 4)
    bias = torch.randn(d)
    out_ref = _pack_ref_torch(lat) @ weight.T + bias          # (B, N, D)

    tree, _ = torch_flux_to_flax(
        {'x_embedder.weight': weight.numpy(), 'x_embedder.bias': bias.numpy()},
        num_layers=0, num_single_layers=0)
    lat_ours = jnp.asarray(lat.permute(0, 2, 3, 1).numpy())   # NHWC
    tokens = patchify(lat_ours, 2)                            # (B, N, p*p*C)
    out_ours = tokens @ jnp.asarray(tree['x_embedder']['kernel']) \
        + jnp.asarray(tree['x_embedder']['bias'])
    np.testing.assert_allclose(np.asarray(out_ours), out_ref.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_packed_layout_proj_out_matches_reference_torch():
    """Teacher head: converted proj_out must produce the same *image-space*
    output as the reference path (torch head -> reference unpack)."""
    import torch
    from arcflow_tpu.models.flux import unpatchify
    torch.manual_seed(1)
    b, c, h, w, d, n = 2, 4, 8, 8, 6, 16
    hidden = torch.randn(b, n, d)
    weight = torch.randn(c * 4, d)
    bias = torch.randn(c * 4)
    out_tok = hidden @ weight.T + bias                        # (B, N, C*4)
    # reference unpack: inverse of _pack_latents
    img_ref = out_tok.view(b, h // 2, w // 2, c, 2, 2) \
        .permute(0, 3, 1, 4, 2, 5).reshape(b, c, h, w)

    tree, _ = torch_flux_to_flax(
        {'proj_out.weight': weight.numpy(), 'proj_out.bias': bias.numpy()},
        num_layers=0, num_single_layers=0)
    out_ours = jnp.asarray(hidden.numpy()) @ jnp.asarray(
        tree['proj_out']['kernel']) + jnp.asarray(tree['proj_out']['bias'])
    img_ours = unpatchify(out_ours, h, w, 2)                  # (B, H, W, C)
    np.testing.assert_allclose(np.asarray(img_ours.transpose(0, 3, 1, 2)),
                               img_ref.numpy(), rtol=1e-4, atol=1e-5)


def test_packed_layout_means_head_roundtrip_and_structure():
    """proj_out_means columns are (K, c, p2) on the torch side and
    (K, p2, c) on ours; conversion must permute and roundtrip exactly."""
    k, c, p2, d = 3, 4, 4, 5
    # fabricate a torch means weight whose value encodes its (k, c, p) index
    w_t = np.arange(k * c * p2 * d, dtype=np.float32).reshape(k * c * p2, d)
    b_t = np.arange(k * c * p2, dtype=np.float32)
    lw_b = np.zeros(k * p2, np.float32)  # lets the converter infer K
    state = {'proj_out_means.weight': w_t, 'proj_out_means.bias': b_t,
             'proj_out_logweights.bias': lw_b}
    tree, unused = torch_flux_to_flax(state, num_layers=0,
                                      num_single_layers=0)
    assert not unused
    kern = np.asarray(tree['proj_out_means']['kernel'])       # (d, k*p2*c)
    bias = np.asarray(tree['proj_out_means']['bias'])
    # ours layout (k, p2, c): entry (ki, pi, ci) == torch row ki*c*p2+ci*p2+pi
    got = bias.reshape(k, p2, c)
    want = b_t.reshape(k, c, p2).transpose(0, 2, 1)
    np.testing.assert_array_equal(got, want)
    got_k = kern.T.reshape(k, p2, c, d)
    want_k = w_t.reshape(k, c, p2, d).transpose(0, 2, 1, 3)
    np.testing.assert_array_equal(got_k, want_k)
    # export roundtrips to the original torch layout
    back = flax_to_torch_flux(tree)
    np.testing.assert_array_equal(back['proj_out_means.weight'], w_t)
    np.testing.assert_array_equal(back['proj_out_means.bias'], b_t)


def test_reference_format_adapter_import(tmp_path):
    """A reference-style adapter (per-block peft keys, lora_A.default.weight
    names, policy_config metadata) must load into working stacked params
    (reference arcflow_loader.py:45-275)."""
    from safetensors import safe_open
    from safetensors.numpy import save_file

    student = ArcFluxTransformer2DModel(num_gaussians=4, patch_size=2,
                                        lora_rank=4, **TINY)
    inputs = dict(hidden_states=jnp.zeros((1, 8, 8, 4)), t=jnp.zeros((1,)),
                  encoder_hidden_states=jnp.zeros((1, 6, 64)),
                  pooled_projections=jnp.zeros((1, 32)),
                  guidance=jnp.zeros((1,)))
    params = student.init(jax.random.PRNGKey(7), **inputs)['params']
    adapter, _ = partition_params(params, ARCFLUX_ADAPTER_KEYS)

    # export, then rewrite key names to the *raw* peft form the reference's
    # training checkpoints use (lora_A.default.weight)
    path = str(tmp_path / 'exported.safetensors')
    save_adapter_state(path, adapter,
                       policy_config=dict(policy_type='ArcFlow', nfe=2))
    state, meta = {}, None
    with safe_open(path, framework='np') as f:
        meta = f.metadata()
        for kk in f.keys():
            state[kk] = f.get_tensor(kk)
    assert any('.lora_A.weight' in kk for kk in state), \
        'export must write peft-style per-block lora keys'
    assert any(kk.startswith('transformer_blocks.0.') for kk in state)
    raw = {kk.replace('.lora_A.weight', '.lora_A.default.weight')
             .replace('.lora_B.weight', '.lora_B.default.weight'): v
           for kk, v in state.items()}
    raw_path = str(tmp_path / 'reference_style.safetensors')
    save_file(raw, raw_path, metadata=meta)

    tree, policy = load_adapter_state(raw_path)
    assert policy == dict(policy_type='ArcFlow', nfe=2)
    a_flat, t_flat = flatten(adapter), flatten(tree)
    assert set(a_flat) == set(t_flat), set(a_flat) ^ set(t_flat)
    for kk in a_flat:
        np.testing.assert_allclose(np.asarray(a_flat[kk]),
                                   np.asarray(t_flat[kk]), rtol=1e-6,
                                   err_msg=kk)
    # loaded adapter produces finite 2-NFE samples
    from arcflow_tpu.utils.pytree import merge_params
    merged = merge_params(params, tree)
    pipe = ArcFluxPipeline(student, merged, nfe=2, guidance_scale=3.5)
    embeds = dict(
        encoder_hidden_states=jax.random.normal(jax.random.PRNGKey(8),
                                                (1, 6, 64)),
        pooled_projections=jax.random.normal(jax.random.PRNGKey(9), (1, 32)))
    out = pipe(prompt_embeds=embeds, height=64, width=64, seed=0)
    assert np.isfinite(np.asarray(out['latents'])).all()


def test_retrieve_raw_timesteps():
    raw, substeps = retrieve_raw_timesteps(2, 128, 1.0)
    np.testing.assert_allclose(raw, [1.0, 0.5, 0.0], atol=1e-6)
    assert substeps == [64, 64]
    raw2, sub2 = retrieve_raw_timesteps(2, 128, 0.5)
    np.testing.assert_allclose(raw2, [1.0, 1 - 1 / 1.5, 0.0], atol=1e-5)


def test_pipeline_end_to_end_latents():
    student = ArcFluxTransformer2DModel(num_gaussians=4, patch_size=2, **TINY)
    inputs = dict(hidden_states=jnp.zeros((1, 8, 8, 4)), t=jnp.zeros((1,)),
                  encoder_hidden_states=jnp.zeros((1, 6, 64)),
                  pooled_projections=jnp.zeros((1, 32)),
                  guidance=jnp.zeros((1,)))
    params = student.init(jax.random.PRNGKey(3), **inputs)['params']
    pipe = ArcFluxPipeline(student, params, nfe=2, temperature=0.8,
                           guidance_scale=3.5)
    embeds = dict(
        encoder_hidden_states=jax.random.normal(jax.random.PRNGKey(4),
                                                (2, 6, 64)),
        pooled_projections=jax.random.normal(jax.random.PRNGKey(5), (2, 32)))
    out = pipe(prompt_embeds=embeds, height=64, width=64, seed=1)
    lat = np.asarray(out['latents'])
    assert lat.shape == (2, 8, 8, 4)
    assert np.isfinite(lat).all()
    # nfe override recompiles cleanly
    out3 = pipe(prompt_embeds=embeds, height=64, width=64,
                num_inference_steps=3, seed=1)
    assert np.isfinite(np.asarray(out3['latents'])).all()


def test_pipeline_shard_multichip_serving():
    """pipe.shard(mesh): the multi-chip serving surface (the reference's
    unshipped 'Multi-GPU Inference' To-Do) — sharded __call__ output
    matches the single-device pipeline, params actually land sharded."""
    from arcflow_tpu.parallel import clear_activation_sharding

    student = ArcFluxTransformer2DModel(num_gaussians=4, patch_size=2, **TINY)
    inputs = dict(hidden_states=jnp.zeros((1, 8, 8, 4)), t=jnp.zeros((1,)),
                  encoder_hidden_states=jnp.zeros((1, 6, 64)),
                  pooled_projections=jnp.zeros((1, 32)),
                  guidance=jnp.zeros((1,)))
    params = student.init(jax.random.PRNGKey(3), **inputs)['params']
    embeds = dict(
        encoder_hidden_states=jax.random.normal(jax.random.PRNGKey(4),
                                                (2, 6, 64)),
        pooled_projections=jax.random.normal(jax.random.PRNGKey(5), (2, 32)))

    pipe = ArcFluxPipeline(student, params, nfe=2, guidance_scale=3.5)
    ref = np.asarray(pipe(prompt_embeds=embeds, height=64, width=64,
                          seed=1)['latents'])

    pipe_s = ArcFluxPipeline(student, params, nfe=2, guidance_scale=3.5)
    try:
        mesh = pipe_s.shard({'data': 2, 'fsdp': 2, 'tensor': 2},
                            min_size=1024)
        assert dict(mesh.shape) == {'data': 2, 'fsdp': 2, 'tensor': 2}
        leaf = pipe_s.transformer_params['joint_blocks']['attn'][
            'img_q']['kernel']
        assert not leaf.sharding.is_fully_replicated
        got = np.asarray(pipe_s(prompt_embeds=embeds, height=64, width=64,
                                seed=1)['latents'])
    finally:
        clear_activation_sharding()
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-4)


def test_pipeline_int8_quantized_sampling():
    """pipe.quantize_int8(): the 'quant' collection flows through
    forward_test; w8-only output stays close to bf16, w8a8 stays finite."""
    student = ArcFluxTransformer2DModel(num_gaussians=4, patch_size=2, **TINY)
    inputs = dict(hidden_states=jnp.zeros((1, 8, 8, 4)), t=jnp.zeros((1,)),
                  encoder_hidden_states=jnp.zeros((1, 6, 64)),
                  pooled_projections=jnp.zeros((1, 32)),
                  guidance=jnp.zeros((1,)))
    params = student.init(jax.random.PRNGKey(3), **inputs)['params']
    embeds = dict(
        encoder_hidden_states=jax.random.normal(jax.random.PRNGKey(4),
                                                (1, 6, 64)),
        pooled_projections=jax.random.normal(jax.random.PRNGKey(5), (1, 32)))

    pipe = ArcFluxPipeline(student, params, nfe=2, guidance_scale=3.5)
    ref = np.asarray(pipe(prompt_embeds=embeds, height=64, width=64,
                          seed=1)['latents'])

    pipe_q = ArcFluxPipeline(student, params, nfe=2, guidance_scale=3.5)
    pipe_q.quantize_int8(min_size=1024)
    got = np.asarray(pipe_q(prompt_embeds=embeds, height=64, width=64,
                            seed=1)['latents'])
    assert np.isfinite(got).all()
    cos = (got * ref).sum() / (np.linalg.norm(got) * np.linalg.norm(ref)
                               + 1e-9)
    assert cos > 0.99, cos

    from arcflow_tpu.utils.quantize import set_act_quant
    pipe_a = ArcFluxPipeline(student, params, nfe=2, guidance_scale=3.5)
    pipe_a.quantize_int8(act_quant=True, min_size=1024)
    try:
        got_a = np.asarray(pipe_a(prompt_embeds=embeds, height=64, width=64,
                                  seed=1)['latents'])
    finally:
        set_act_quant(False)
    assert np.isfinite(got_a).all()
