"""ArcFlux/Flux architecture: shapes, head inits, adapter partition, sharing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arcflow_tpu.models.flux import (ARCFLUX_ADAPTER_KEYS,
                                     ArcFluxTransformer2DModel,
                                     FluxTransformer2DModel, make_img_ids,
                                     patchify, unpatchify)
from arcflow_tpu.utils.pytree import (drop_params, flatten, merge_params,
                                      partition_params)

TINY = dict(in_channels=16, num_layers=2, num_single_layers=2,
            attention_head_dim=32, num_attention_heads=4,
            joint_attention_dim=64, pooled_projection_dim=32,
            axes_dims_rope=(8, 12, 12), checkpointing=False)


def tiny_inputs(b=2, h=8, w=8, c=4, s_txt=6):
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 4)
    return dict(
        hidden_states=jax.random.normal(ks[0], (b, h, w, c)),
        t=jnp.full((b,), 0.7),
        encoder_hidden_states=jax.random.normal(ks[1], (b, s_txt, 64)),
        pooled_projections=jax.random.normal(ks[2], (b, 32)))


def test_patchify_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 6, 5))
    tokens = patchify(x, 2)
    assert tokens.shape == (2, 4 * 3, 4 * 5)
    x2 = unpatchify(tokens, 8, 6, 2)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x2))


def test_img_ids():
    ids = make_img_ids(3, 4)
    assert ids.shape == (12, 3)
    assert (np.asarray(ids[:, 0]) == 0).all()
    assert np.asarray(ids[4]) .tolist() == [0, 1, 0]
    assert np.asarray(ids[-1]).tolist() == [0, 2, 3]


@pytest.fixture(scope='module')
def arcflux():
    model = ArcFluxTransformer2DModel(num_gaussians=4, patch_size=2, **TINY)
    inputs = tiny_inputs()
    params = model.init(jax.random.PRNGKey(1), **inputs)['params']
    return model, params, inputs


def test_arcflux_output_shapes(arcflux):
    model, params, inputs = arcflux
    out = model.apply({'params': params}, **inputs)
    b, h, w, c = inputs['hidden_states'].shape
    k = 4
    assert out['means'].shape == (b, k, h, w, c)
    assert out['logweights'].shape == (b, k, h, w, 1)
    assert out['loggammas'].shape == (b, k - 1, h, w, 1)
    # logweights normalized over K
    w_sum = np.exp(np.asarray(out['logweights'])).sum(axis=1)
    np.testing.assert_allclose(w_sum, 1.0, rtol=1e-4)


def test_arcflux_head_init_semantics(arcflux):
    model, params, inputs = arcflux
    out = model.apply({'params': params}, **inputs)
    # zero-kernel heads at init: loggammas spatially constant and log-spaced
    logg = np.asarray(out['loggammas'])
    target = np.log(np.logspace(np.log10(0.2), np.log10(4.0), 3))
    np.testing.assert_allclose(logg[0, :, 0, 0, 0], target, rtol=1e-4)
    assert np.abs(logg - logg[:, :, :1, :1]).max() < 1e-4
    # logweights uniform at init
    np.testing.assert_allclose(np.exp(np.asarray(out['logweights'])), 0.25,
                               rtol=1e-3)
    # means bias: shared across patch cells -> spatially periodic with p=2
    m = np.asarray(out['means'])
    np.testing.assert_allclose(m[0, :, 0, 0], m[0, :, 2, 2], atol=1e-5)
    assert np.abs(m).max() > 0   # nonzero bias noise


def test_adapter_partition_and_sharing(arcflux):
    model, params, inputs = arcflux
    adapter, base = partition_params(params, ARCFLUX_ADAPTER_KEYS)
    flat_a = flatten(adapter)
    assert any('proj_out_means' in k for k in flat_a)
    assert any('norm_out' in k for k in flat_a)
    assert all(not any(key in k for key in ARCFLUX_ADAPTER_KEYS)
               for k in flatten(base))
    # merge reassembles the exact same structure
    merged = merge_params(base, adapter)
    assert set(flatten(merged)) == set(flatten(params))
    # merged leaves are the same arrays (no copies)
    assert merged['proj_out_means']['kernel'] is adapter['proj_out_means']['kernel']


def test_teacher_student_base_compatibility():
    """Teacher tree (minus proj_out) must be a subset of the student tree, so
    one frozen base can serve both (the reference's tie_untrained_submodules)."""
    teacher = FluxTransformer2DModel(patch_size=2, **TINY)
    student = ArcFluxTransformer2DModel(num_gaussians=4, patch_size=2,
                                        lora_rank=4, **TINY)
    inputs = tiny_inputs()
    t_params = teacher.init(jax.random.PRNGKey(2), **inputs)['params']
    s_params = student.init(jax.random.PRNGKey(3), **inputs)['params']

    t_flat = flatten(drop_params(t_params, ['proj_out'], exact_prefix=True))
    s_flat = flatten(s_params)
    missing = [k for k in t_flat if k not in s_flat]
    assert not missing, f'teacher keys missing from student: {missing[:5]}'
    for k in t_flat:
        assert t_flat[k].shape == s_flat[k].shape, k

    # grafting teacher base into the student must produce identical teacher
    # behavior when heads are ignored: run student on merged params
    adapter, _ = partition_params(s_params, ARCFLUX_ADAPTER_KEYS)
    merged = merge_params(drop_params(t_params, ['proj_out'], exact_prefix=True), adapter)
    out = student.apply({'params': merged}, **inputs)
    assert np.isfinite(np.asarray(out['means'])).all()


def test_lora_only_on_reference_targets():
    student = ArcFluxTransformer2DModel(num_gaussians=4, patch_size=2,
                                        lora_rank=4, **TINY)
    inputs = tiny_inputs()
    params = student.init(jax.random.PRNGKey(4), **inputs)['params']
    lora_keys = [k for k in flatten(params) if 'lora' in k]
    assert lora_keys, 'expected lora params'
    # reference targets: ff/mlp + single-block projections + timestep embedder
    # (configs/flux/arcflux_2nfe_k16.py:40-48) — NOT attention qkv
    for k in lora_keys:
        assert ('ff_' in k or 'proj_mlp' in k or 'proj_out' in k
                or 'timestep_embedder' in k), f'unexpected lora target: {k}'
    assert not any('attn' in k for k in lora_keys)


def test_lora_zero_at_init_grads_flow():
    student = ArcFluxTransformer2DModel(num_gaussians=4, patch_size=2,
                                        lora_rank=4, **TINY)
    inputs = tiny_inputs()
    params = student.init(jax.random.PRNGKey(5), **inputs)['params']
    base_out = student.apply({'params': params}, **inputs)

    # lora_b zeros at init -> removing lora changes nothing
    no_lora = ArcFluxTransformer2DModel(num_gaussians=4, patch_size=2,
                                        lora_rank=0, **TINY)
    params_no = drop_params(params, ['lora'])
    out_no = no_lora.apply({'params': params_no}, **inputs)
    np.testing.assert_allclose(np.asarray(base_out['means']),
                               np.asarray(out_no['means']), atol=1e-5)

    # grads flow into adapter params only when loss differentiates adapter
    adapter, base = partition_params(params, ARCFLUX_ADAPTER_KEYS)

    def loss_fn(adapter):
        merged = merge_params(base, adapter)
        out = student.apply({'params': merged}, **inputs)
        return jnp.square(out['means']).mean() + \
            jnp.square(out['loggammas']).mean()

    grads = jax.grad(loss_fn)(adapter)
    gmax = max(float(jnp.abs(g).max()) for g in jax.tree.leaves(grads))
    assert np.isfinite(gmax) and gmax > 0


def test_teacher_forward_shape():
    teacher = FluxTransformer2DModel(patch_size=2, **TINY)
    inputs = tiny_inputs()
    params = teacher.init(jax.random.PRNGKey(6), **inputs)['params']
    u = teacher.apply({'params': params}, **inputs)
    assert u.shape == inputs['hidden_states'].shape
    assert u.dtype == jnp.float32


def test_controlnet_residuals_change_output():
    """ControlNet residual hooks (reference arcflux.py:200-239): per-block
    samples shift the output; interval and repeat mappings both work."""
    from tests.test_pipelines import TINY, tiny_teacher_params
    teacher, params, inputs = tiny_teacher_params()
    ks = jax.random.split(jax.random.PRNGKey(11), 4)
    inputs = dict(hidden_states=jax.random.normal(ks[0], (1, 8, 8, 4)),
                  t=jnp.full((1,), 0.5),
                  encoder_hidden_states=jax.random.normal(ks[1], (1, 6, 64)),
                  pooled_projections=jax.random.normal(ks[2], (1, 32)),
                  guidance=jnp.full((1,), 2.0))
    base = teacher.apply({'params': params}, **inputs)
    b, n, d = 1, 16, teacher.inner_dim    # 8x8 latents, p=2 -> 16 tokens
    cn = [0.1 * jnp.ones((b, n, d))]      # 1 sample over 2 joint blocks
    out = teacher.apply({'params': params}, **inputs,
                        controlnet_block_samples=cn)
    assert np.abs(np.asarray(out) - np.asarray(base)).max() > 1e-4
    out_rep = teacher.apply({'params': params}, **inputs,
                            controlnet_block_samples=cn,
                            controlnet_blocks_repeat=True)
    assert np.isfinite(np.asarray(out_rep)).all()
    cn_s = [0.1 * jnp.ones((b, n, d)), 0.2 * jnp.ones((b, n, d))]
    out_s = teacher.apply({'params': params}, **inputs,
                          controlnet_single_block_samples=cn_s)
    assert np.abs(np.asarray(out_s) - np.asarray(base)).max() > 1e-4


def test_flux_fill_mask_concat():
    """Flux-fill: mask + masked-image latents concat onto the packed token
    features (reference arcflux.py:431-435); in_channels grows to
    c*p^2 * 2 + p^2 for the fill variant."""
    from arcflow_tpu.models import FluxTransformer2DModel
    from tests.test_pipelines import TINY
    kw = dict(TINY)
    kw['in_channels'] = 4 * 4 + 4 * 4 + 4   # latents + masked + mask, p=2
    model = FluxTransformer2DModel(patch_size=2, **kw)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    mask = jnp.ones((1, 8, 8, 1))
    masked = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    inputs = dict(t=jnp.full((1,), 0.5),
                  encoder_hidden_states=jnp.zeros((1, 6, 64)),
                  pooled_projections=jnp.zeros((1, 32)),
                  guidance=jnp.zeros((1,)),
                  mask=mask, masked_image_latents=masked)
    params = model.init(jax.random.PRNGKey(2), x, **inputs)['params']
    out = model.apply({'params': params}, x, **inputs)
    assert out.shape == (1, 8, 8, 4)
    # the mask genuinely conditions the output
    out2 = model.apply({'params': params}, x,
                       **{**inputs, 'mask': jnp.zeros((1, 8, 8, 1))})
    assert np.abs(np.asarray(out) - np.asarray(out2)).max() > 1e-4


def test_lora_dropout_train_only():
    """LoRA-branch dropout (reference lora_dropout=0.05) is active only when
    a 'dropout' rng is provided; eval/apply without it is deterministic and
    identical to the rate-0 module."""
    from arcflow_tpu.models.layers import LoRADense
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16))
    layer = LoRADense(8, lora_rank=4, lora_dropout=0.5, dtype=jnp.float32)
    params = layer.init(jax.random.PRNGKey(1), x)['params']
    # make the LoRA branch non-zero so dropout has an observable effect
    params = dict(params, lora_b=jnp.ones_like(params['lora_b']))

    y_det1 = layer.apply({'params': params}, x)
    y_det2 = layer.apply({'params': params}, x)
    np.testing.assert_array_equal(np.asarray(y_det1), np.asarray(y_det2))

    plain = LoRADense(8, lora_rank=4, lora_dropout=0.0, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(plain.apply({'params': params}, x)), np.asarray(y_det1))

    y_a = layer.apply({'params': params}, x,
                      rngs={'dropout': jax.random.PRNGKey(2)})
    y_b = layer.apply({'params': params}, x,
                      rngs={'dropout': jax.random.PRNGKey(3)})
    assert not np.allclose(np.asarray(y_a), np.asarray(y_det1))
    assert not np.allclose(np.asarray(y_a), np.asarray(y_b))


def test_lora_dropout_through_model_and_scan():
    """dropout rng threads through nn.scan blocks (split per layer) and the
    GaussianFlow.pred plumbing."""
    # teacher class: its proj_out has a normal (non-zero) init, so trunk
    # perturbations reach the output (the ArcFlux heads are zero-init by
    # design and would mask the effect at init)
    model = FluxTransformer2DModel(patch_size=2, lora_rank=2,
                                   lora_dropout=0.5, **TINY)
    inputs = tiny_inputs()
    params = model.init(jax.random.PRNGKey(1), **inputs)['params']

    # non-zero lora_b leaves so the dropout branch is observable, and
    # non-zero AdaLN modulation kernels so the zero-init gates don't mask
    # the LoRA'd FF/proj outputs at init
    def bump(path, leaf):
        if 'lora_b' in path:
            return jnp.ones_like(leaf)
        if 'modulation' in path and 'kernel' in path:
            return jnp.full_like(leaf, 0.05)
        return leaf
    params = jax.tree_util.tree_map_with_path(
        lambda p, v: bump(jax.tree_util.keystr(p), v), params)

    out_det = model.apply({'params': params}, **inputs)
    out_det2 = model.apply({'params': params}, **inputs)
    np.testing.assert_array_equal(np.asarray(out_det), np.asarray(out_det2))
    out_a = model.apply({'params': params}, **inputs,
                        rngs={'dropout': jax.random.PRNGKey(7)})
    assert not np.allclose(np.asarray(out_det), np.asarray(out_a))
