"""VAE weight conversion: diffusers AutoencoderKL + Qwen/Wan 3D-causal VAE.

Synthetic diffusers-format state dicts (zero egress — CLAUDE.md) exercise
key-name coverage and shapes; torch cross-checks verify kernel orientation
and the image-mode causal-conv reduction numerically.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arcflow_tpu.models import PretrainedVAE, PretrainedVAEQwenImage
from arcflow_tpu.pipelines.convert import (graft_pretrained,
                                           torch_qwen_vae_to_flax,
                                           torch_vae_to_flax)
from arcflow_tpu.utils.pytree import flatten


# ---------------------------------------------------------------------------
# synthetic diffusers-format state dict generators
# ---------------------------------------------------------------------------

def _conv(rng, o, i, k=3):
    return rng.standard_normal((o, i, k, k)).astype(np.float32) * 0.05


def _conv3d(rng, o, i, kt=3, k=3):
    return rng.standard_normal((o, i, kt, k, k)).astype(np.float32) * 0.05


def synth_autoencoder_kl_state(block_out=(32, 64), layers=1, z=4,
                               quant=True, seed=0):
    """diffusers AutoencoderKL key/shape layout (DownEncoderBlock2D /
    UpDecoderBlock2D naming)."""
    rng = np.random.default_rng(seed)
    s = {}

    def norm(prefix, c):
        s[f'{prefix}.weight'] = rng.standard_normal(c).astype(np.float32)
        s[f'{prefix}.bias'] = rng.standard_normal(c).astype(np.float32)

    def res(prefix, ci, co):
        norm(f'{prefix}.norm1', ci)
        s[f'{prefix}.conv1.weight'] = _conv(rng, co, ci)
        s[f'{prefix}.conv1.bias'] = np.zeros(co, np.float32)
        norm(f'{prefix}.norm2', co)
        s[f'{prefix}.conv2.weight'] = _conv(rng, co, co)
        s[f'{prefix}.conv2.bias'] = np.zeros(co, np.float32)
        if ci != co:
            s[f'{prefix}.conv_shortcut.weight'] = _conv(rng, co, ci, 1)
            s[f'{prefix}.conv_shortcut.bias'] = np.zeros(co, np.float32)

    def attn(prefix, c):
        norm(f'{prefix}.group_norm', c)
        for nm in ('to_q', 'to_k', 'to_v', 'to_out.0'):
            s[f'{prefix}.{nm}.weight'] = \
                rng.standard_normal((c, c)).astype(np.float32) * 0.05
            s[f'{prefix}.{nm}.bias'] = np.zeros(c, np.float32)

    # encoder
    s['encoder.conv_in.weight'] = _conv(rng, block_out[0], 3)
    s['encoder.conv_in.bias'] = np.zeros(block_out[0], np.float32)
    ci = block_out[0]
    for i, co in enumerate(block_out):
        for j in range(layers):
            res(f'encoder.down_blocks.{i}.resnets.{j}', ci, co)
            ci = co
        if i < len(block_out) - 1:
            s[f'encoder.down_blocks.{i}.downsamplers.0.conv.weight'] = \
                _conv(rng, co, co)
            s[f'encoder.down_blocks.{i}.downsamplers.0.conv.bias'] = \
                np.zeros(co, np.float32)
    c = block_out[-1]
    res('encoder.mid_block.resnets.0', c, c)
    attn('encoder.mid_block.attentions.0', c)
    res('encoder.mid_block.resnets.1', c, c)
    norm('encoder.conv_norm_out', c)
    s['encoder.conv_out.weight'] = _conv(rng, 2 * z, c)
    s['encoder.conv_out.bias'] = np.zeros(2 * z, np.float32)

    # decoder
    rev = list(reversed(block_out))
    s['decoder.conv_in.weight'] = _conv(rng, rev[0], z)
    s['decoder.conv_in.bias'] = np.zeros(rev[0], np.float32)
    c = rev[0]
    res('decoder.mid_block.resnets.0', c, c)
    attn('decoder.mid_block.attentions.0', c)
    res('decoder.mid_block.resnets.1', c, c)
    ci = rev[0]
    for i, co in enumerate(rev):
        for j in range(layers + 1):
            res(f'decoder.up_blocks.{i}.resnets.{j}', ci, co)
            ci = co
        if i < len(rev) - 1:
            s[f'decoder.up_blocks.{i}.upsamplers.0.conv.weight'] = \
                _conv(rng, co, co)
            s[f'decoder.up_blocks.{i}.upsamplers.0.conv.bias'] = \
                np.zeros(co, np.float32)
    norm('decoder.conv_norm_out', rev[-1])
    s['decoder.conv_out.weight'] = _conv(rng, 3, rev[-1])
    s['decoder.conv_out.bias'] = np.zeros(3, np.float32)

    if quant:
        s['quant_conv.weight'] = _conv(rng, 2 * z, 2 * z, 1)
        s['quant_conv.bias'] = np.zeros(2 * z, np.float32)
        s['post_quant_conv.weight'] = _conv(rng, z, z, 1)
        s['post_quant_conv.bias'] = np.zeros(z, np.float32)
    return s


def synth_qwen_vae_state(base=32, mult=(1, 2), nres=1, z=4, seed=0):
    """diffusers AutoencoderKLQwenImage (Wan) key/shape layout, incl. the
    time_conv weights the image mode skips."""
    rng = np.random.default_rng(seed)
    s = {}

    def rms(prefix, c, images=False):
        shape = (c, 1, 1) if images else (c, 1, 1, 1)
        s[f'{prefix}.gamma'] = \
            rng.standard_normal(shape).astype(np.float32) * 0.1 + 1.0

    def res(prefix, ci, co):
        rms(f'{prefix}.norm1', ci)
        s[f'{prefix}.conv1.weight'] = _conv3d(rng, co, ci)
        s[f'{prefix}.conv1.bias'] = np.zeros(co, np.float32)
        rms(f'{prefix}.norm2', co)
        s[f'{prefix}.conv2.weight'] = _conv3d(rng, co, co)
        s[f'{prefix}.conv2.bias'] = np.zeros(co, np.float32)
        if ci != co:
            s[f'{prefix}.conv_shortcut.weight'] = _conv3d(rng, co, ci, 1, 1)
            s[f'{prefix}.conv_shortcut.bias'] = np.zeros(co, np.float32)

    def attn(prefix, c):
        rms(f'{prefix}.norm', c, images=True)
        s[f'{prefix}.to_qkv.weight'] = _conv(rng, 3 * c, c, 1)
        s[f'{prefix}.to_qkv.bias'] = np.zeros(3 * c, np.float32)
        s[f'{prefix}.proj.weight'] = _conv(rng, c, c, 1)
        s[f'{prefix}.proj.bias'] = np.zeros(c, np.float32)

    def mid(prefix, c):
        res(f'{prefix}.resnets.0', c, c)
        attn(f'{prefix}.attentions.0', c)
        res(f'{prefix}.resnets.1', c, c)

    dims = [base * u for u in (1,) + tuple(mult)]
    s['encoder.conv_in.weight'] = _conv3d(rng, dims[0], 3)
    s['encoder.conv_in.bias'] = np.zeros(dims[0], np.float32)
    idx = 0
    for i, (ci, co) in enumerate(zip(dims[:-1], dims[1:])):
        for _ in range(nres):
            res(f'encoder.down_blocks.{idx}', ci, co)
            ci = co
            idx += 1
        if i != len(mult) - 1:
            s[f'encoder.down_blocks.{idx}.resample.1.weight'] = \
                _conv(rng, co, co)
            s[f'encoder.down_blocks.{idx}.resample.1.bias'] = \
                np.zeros(co, np.float32)
            # Wan's temporal path (skipped on frame 0 / image mode)
            s[f'encoder.down_blocks.{idx}.time_conv.weight'] = \
                _conv3d(rng, co, co, 3, 1)
            s[f'encoder.down_blocks.{idx}.time_conv.bias'] = \
                np.zeros(co, np.float32)
            idx += 1
    mid('encoder.mid_block', dims[-1])
    rms('encoder.norm_out', dims[-1])
    s['encoder.conv_out.weight'] = _conv3d(rng, 2 * z, dims[-1])
    s['encoder.conv_out.bias'] = np.zeros(2 * z, np.float32)

    ddims = [base * u for u in (mult[-1],) + tuple(mult)[::-1]]
    s['decoder.conv_in.weight'] = _conv3d(rng, ddims[0], z)
    s['decoder.conv_in.bias'] = np.zeros(ddims[0], np.float32)
    mid('decoder.mid_block', ddims[0])
    ci = ddims[0]
    for i, co in enumerate(ddims[1:]):
        for j in range(nres + 1):
            res(f'decoder.up_blocks.{i}.resnets.{j}', ci, co)
            ci = co
        if i != len(mult) - 1:
            pre = f'decoder.up_blocks.{i}.upsamplers.0'
            s[f'{pre}.resample.1.weight'] = _conv(rng, co // 2, co)
            s[f'{pre}.resample.1.bias'] = np.zeros(co // 2, np.float32)
            s[f'{pre}.time_conv.weight'] = _conv3d(rng, co * 2, co, 3, 1)
            s[f'{pre}.time_conv.bias'] = np.zeros(co * 2, np.float32)
            ci = co // 2
    rms('decoder.norm_out', ddims[-1])
    s['decoder.conv_out.weight'] = _conv3d(rng, 3, ddims[-1])
    s['decoder.conv_out.bias'] = np.zeros(3, np.float32)

    s['quant_conv.weight'] = _conv3d(rng, 2 * z, 2 * z, 1, 1)
    s['quant_conv.bias'] = np.zeros(2 * z, np.float32)
    s['post_quant_conv.weight'] = _conv3d(rng, z, z, 1, 1)
    s['post_quant_conv.bias'] = np.zeros(z, np.float32)
    return s


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_autoencoder_kl_conversion_covers_tree():
    state = synth_autoencoder_kl_state()
    tree, unused = torch_vae_to_flax(state)
    assert not unused, sorted(unused)[:5]
    vae = PretrainedVAE(latent_channels=4, block_out_channels=(32, 64),
                        layers_per_block=1, use_quant_conv=True,
                        use_post_quant_conv=True, dtype='float32')
    init = vae.init_params(jax.random.PRNGKey(0), image_size=16)
    merged, missing, unexpected = graft_pretrained(init, tree)
    assert not missing, missing[:8]
    assert not unexpected, unexpected[:8]
    # loaded weights run encode/decode finitely (orientation sanity below)
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 3))
    lat = vae.encode(merged, img)
    rec = vae.decode(merged, lat)
    assert lat.shape == (1, 8, 8, 4) and np.isfinite(np.asarray(rec)).all()


def test_vae_resnet_block_matches_torch():
    """Conversion orientation check: one converted ResnetBlock reproduces a
    torch GroupNorm+SiLU+Conv2d resblock exactly."""
    import torch
    import torch.nn.functional as F
    torch.manual_seed(0)
    c = 32
    state = {}
    rng = np.random.default_rng(3)
    state['norm1.weight'] = rng.standard_normal(c).astype(np.float32)
    state['norm1.bias'] = rng.standard_normal(c).astype(np.float32)
    state['conv1.weight'] = _conv(rng, c, c)
    state['conv1.bias'] = rng.standard_normal(c).astype(np.float32)
    state['norm2.weight'] = rng.standard_normal(c).astype(np.float32)
    state['norm2.bias'] = rng.standard_normal(c).astype(np.float32)
    state['conv2.weight'] = _conv(rng, c, c)
    state['conv2.bias'] = rng.standard_normal(c).astype(np.float32)

    x = torch.randn(1, c, 8, 8)

    def gn(t, w, b):
        return F.group_norm(t, 32, torch.from_numpy(w), torch.from_numpy(b),
                            eps=1e-6)

    h = F.conv2d(F.silu(gn(x, state['norm1.weight'], state['norm1.bias'])),
                 torch.from_numpy(state['conv1.weight']),
                 torch.from_numpy(state['conv1.bias']), padding=1)
    h = F.conv2d(F.silu(gn(h, state['norm2.weight'], state['norm2.bias'])),
                 torch.from_numpy(state['conv2.weight']),
                 torch.from_numpy(state['conv2.bias']), padding=1)
    want = (x + h).permute(0, 2, 3, 1).numpy()

    from arcflow_tpu.models.vae import ResnetBlock
    tree, _ = torch_vae_to_flax(state)
    block = ResnetBlock(c, dtype=jnp.float32)
    got = block.apply({'params': tree},
                      jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_qwen_vae_conversion_covers_tree():
    state = synth_qwen_vae_state()
    tree, unused = torch_qwen_vae_to_flax(state)
    assert not unused, sorted(unused)[:5]
    vae = PretrainedVAEQwenImage(base_dim=32, z_dim=4, dim_mult=(1, 2),
                                 num_res_blocks=1, dtype='float32')
    init = vae.init_params(jax.random.PRNGKey(0), image_size=8)
    merged, missing, unexpected = graft_pretrained(init, tree)
    assert not missing, missing[:8]
    assert not unexpected, unexpected[:8]
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 3))
    lat = vae.encode(merged, img)
    rec = vae.decode(merged, lat)
    assert lat.shape == (1, 4, 4, 4)
    assert rec.shape == (1, 8, 8, 3)
    assert np.isfinite(np.asarray(rec)).all()


def test_qwen_causal_conv_image_mode_matches_torch():
    """The image-mode reduction is exact: a torch causal conv3d on a
    zero-front-padded single frame equals our 2-D conv with the last
    temporal kernel slice."""
    import torch
    import torch.nn.functional as F
    rng = np.random.default_rng(5)
    ci, co = 8, 12
    w = _conv3d(rng, co, ci)                     # (co, ci, 3, 3, 3)
    b = rng.standard_normal(co).astype(np.float32)
    x = torch.randn(1, ci, 1, 6, 6)              # single frame
    # WanCausalConv3d: front-pad time by kt-1=2 zeros, spatial pad 1
    xp = F.pad(x, (1, 1, 1, 1, 2, 0))
    want = F.conv3d(xp, torch.from_numpy(w), torch.from_numpy(b)) \
        .squeeze(2).permute(0, 2, 3, 1).numpy()

    kern = jnp.asarray(w[:, :, -1].transpose(2, 3, 1, 0))   # converter rule
    got = jax.lax.conv_general_dilated(
        jnp.asarray(x.squeeze(2).permute(0, 2, 3, 1).numpy()), kern,
        window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + jnp.asarray(b)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_qwen_rms_norm_matches_torch():
    import torch
    import torch.nn.functional as F
    from arcflow_tpu.models.qwen_vae import WanRMSNorm
    c = 16
    rng = np.random.default_rng(6)
    gamma = rng.standard_normal((c, 1, 1, 1)).astype(np.float32)
    x = torch.randn(2, c, 1, 4, 4)
    want = (F.normalize(x, dim=1) * (c ** 0.5) *
            torch.from_numpy(gamma)).squeeze(2).permute(0, 2, 3, 1).numpy()
    got = WanRMSNorm(c).apply(
        {'params': {'gamma': jnp.asarray(gamma.reshape(-1))}},
        jnp.asarray(x.squeeze(2).permute(0, 2, 3, 1).numpy()))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
