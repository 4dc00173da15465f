"""ArcQwen/Qwen architecture: shapes, mask handling, teacher/student sharing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arcflow_tpu.models import (ARCQWEN_ADAPTER_KEYS,
                                ArcQwenImageTransformer2DModel,
                                QwenImageTransformer2DModel)
from arcflow_tpu.utils.pytree import drop_params, flatten, merge_params, \
    partition_params

TINY = dict(in_channels=16, num_layers=2, attention_head_dim=32,
            num_attention_heads=4, joint_attention_dim=48,
            axes_dims_rope=(8, 12, 12), checkpointing=False,
            max_text_len=8)


def tiny_inputs(b=2, h=8, w=8, c=4, s_txt=6):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    mask = jnp.ones((b, s_txt), jnp.int32).at[:, 4:].set(0)
    return dict(
        hidden_states=jax.random.normal(ks[0], (b, h, w, c)),
        t=jnp.full((b,), 0.7),
        encoder_hidden_states=jax.random.normal(ks[1], (b, s_txt, 48)),
        encoder_hidden_states_mask=mask)


@pytest.fixture(scope='module')
def arcqwen():
    model = ArcQwenImageTransformer2DModel(num_gaussians=4, patch_size=2,
                                           **TINY)
    inputs = tiny_inputs()
    params = model.init(jax.random.PRNGKey(1), **inputs)['params']
    return model, params, inputs


def test_arcqwen_output_shapes(arcqwen):
    model, params, inputs = arcqwen
    out = model.apply({'params': params}, **inputs)
    b, h, w, c = inputs['hidden_states'].shape
    assert out['means'].shape == (b, 4, h, w, c)
    assert out['logweights'].shape == (b, 4, h, w, 1)
    assert out['loggammas'].shape == (b, 3, h, w, 1)
    w_sum = np.exp(np.asarray(out['logweights'])).sum(axis=1)
    np.testing.assert_allclose(w_sum, 1.0, rtol=1e-4)


def test_text_mask_changes_nothing_for_padded_tokens():
    """Padded text token *values* must not affect the output when masked.

    Uses the teacher (its proj_out has a non-zero kernel; the ArcFlow heads
    are zero-kernel at init, which would make this check vacuous).
    """
    model = QwenImageTransformer2DModel(patch_size=2, **TINY)
    inputs = tiny_inputs()
    params = model.init(jax.random.PRNGKey(7), **inputs)['params']
    # AdaLN-zero gates make blocks identity at init (txt can't influence img
    # yet) — jitter all params so information actually flows
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(8), len(leaves))
    params = jax.tree.unflatten(treedef, [
        l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, keys)])
    out1 = model.apply({'params': params}, **inputs)
    ehs = inputs['encoder_hidden_states']
    perturbed = dict(inputs)
    perturbed['encoder_hidden_states'] = ehs.at[:, 4:].set(
        ehs[:, 4:] + 100.0)   # only padded positions change
    out2 = model.apply({'params': params}, **perturbed)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-4)
    # sanity: changing a *visible* token does change the output
    perturbed2 = dict(inputs)
    perturbed2['encoder_hidden_states'] = ehs.at[:, 0].set(ehs[:, 0] + 10.0)
    out3 = model.apply({'params': params}, **perturbed2)
    assert np.abs(np.asarray(out1 - out3)).max() > 1e-4


def test_text_truncation():
    model = ArcQwenImageTransformer2DModel(num_gaussians=4, patch_size=2,
                                           **TINY)
    inputs = tiny_inputs(s_txt=12)   # > max_text_len=8 -> truncated
    params = model.init(jax.random.PRNGKey(2), **inputs)['params']
    out = model.apply({'params': params}, **inputs)
    assert np.isfinite(np.asarray(out['means'])).all()


def test_teacher_student_base_compatibility():
    teacher = QwenImageTransformer2DModel(patch_size=2, **TINY)
    student = ArcQwenImageTransformer2DModel(num_gaussians=4, patch_size=2,
                                             lora_rank=4, **TINY)
    inputs = tiny_inputs()
    t_params = teacher.init(jax.random.PRNGKey(3), **inputs)['params']
    s_params = student.init(jax.random.PRNGKey(4), **inputs)['params']
    t_flat = flatten(drop_params(t_params, ['proj_out', 'norm_out'],
                                 exact_prefix=True))
    s_flat = flatten(s_params)
    missing = [k for k in t_flat if k not in s_flat]
    assert not missing, missing[:5]
    adapter, base = partition_params(s_params, ARCQWEN_ADAPTER_KEYS)
    merged = merge_params(drop_params(t_params, ['proj_out', 'norm_out'],
                                      exact_prefix=True), adapter)
    out = student.apply({'params': merged}, **inputs)
    assert np.isfinite(np.asarray(out['means'])).all()
