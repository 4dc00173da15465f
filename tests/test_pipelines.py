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
