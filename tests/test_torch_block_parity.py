"""Independent torch mirror of the DiT block math (VERDICT r03 missing #2).

The reference's block semantics are *defined by* diffusers'
``FluxTransformerBlock`` / ``FluxSingleTransformerBlock`` /
``QwenImageTransformerBlock`` (imported at
``lakonlab/models/architecture/arcflow/arcflux.py:42-90`` and
``arcqwen.py:37-71``).  The converter cross-checks elsewhere prove layout
self-consistency of this repo's own export/import pair, but a wrong op
ORDER (RoPE application point, qk-RMSNorm placement, AdaLN-zero chunk
order) would roundtrip cleanly and only fail on real released weights.

This file pins the op ordering against a torch implementation written
independently from the documented diffusers semantics:

  * AdaLN-zero: ``linear(silu(temb))`` chunked as (shift_msa, scale_msa,
    gate_msa, shift_mlp, scale_mlp, gate_mlp); ``LN_noaffine(x)*(1+scale)
    + shift``; gates multiply the residual branches.
  * Joint attention: per-stream qkv; per-head RMSNorm on q/k BEFORE the
    [txt, img] sequence concat; RoPE on the concatenated q/k AFTER the
    norms; SDPA; split back; per-stream output projections.
  * Single block: parallel attn (no out proj) + tanh-gelu MLP, fused
    through one ``proj_out`` on the concat, gated residual.
  * Final AdaLN-continuous chunks (scale, shift) — note the reversed
    order vs AdaLN-zero.
  * Packed-latent layout: the torch side consumes diffusers'
    ``_pack_latents`` (c, p, p) feature order on (B, C, H, W) input, the
    flax side its own (p, p, c) on (B, H, W, C) — exercised through the
    exported checkpoint, so a layout drift in ``_permute_packed`` fails
    here too.

Weights flow through the real converter (``flax_to_torch_flux``) and load
with ``strict=True`` — naming, shapes, layout, and math all checked in one
forward.  Deliberate-swap tests prove the comparison has teeth: flipping
the RoPE/norm order or the AdaLN chunk order must break parity.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn as tnn

import jax
import jax.numpy as jnp

from arcflow_tpu.models import (FluxTransformer2DModel,
                                QwenImageTransformer2DModel)
from arcflow_tpu.pipelines import flax_to_torch_flux

# ---------------------------------------------------------------------------
# torch mirror — written fresh from the documented diffusers semantics
# ---------------------------------------------------------------------------


def t_sinusoidal(t, dim=256):
    half = dim // 2
    freqs = torch.exp(-math.log(10000.0)
                      * torch.arange(half, dtype=torch.float32) / half)
    args = t.float()[:, None] * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


def t_rope(ids, axes_dim, theta=10000.0):
    """Multi-axis rotary cos/sin, each frequency repeat-interleaved twice."""
    coss, sins = [], []
    for i, d in enumerate(axes_dim):
        half = d // 2
        freqs = 1.0 / theta ** (torch.arange(half, dtype=torch.float32)
                                * 2 / d)
        ang = ids[:, i:i + 1].float() * freqs[None]
        coss.append(torch.repeat_interleave(torch.cos(ang), 2, dim=-1))
        sins.append(torch.repeat_interleave(torch.sin(ang), 2, dim=-1))
    return torch.cat(coss, -1), torch.cat(sins, -1)


def t_apply_rope(x, cos, sin):
    """(B, H, S, D) pairwise rotation, interleaved layout, fp32."""
    xf = x.float()
    x2 = xf.reshape(*xf.shape[:-1], -1, 2)
    xr = torch.stack([-x2[..., 1], x2[..., 0]], dim=-1).reshape(xf.shape)
    return xf * cos + xr * sin


class TMLP(tnn.Module):
    """diffusers TimestepEmbedding / PixArtAlphaTextProjection shape:
    linear_1 -> silu -> linear_2."""

    def __init__(self, din, dim):
        super().__init__()
        self.linear_1 = tnn.Linear(din, dim)
        self.linear_2 = tnn.Linear(dim, dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class TTimeTextEmbed(tnn.Module):
    def __init__(self, dim, pooled_dim, guidance):
        super().__init__()
        self.timestep_embedder = TMLP(256, dim)
        if guidance:
            self.guidance_embedder = TMLP(256, dim)
        self.text_embedder = TMLP(pooled_dim, dim)

    def forward(self, t, pooled, guidance=None):
        temb = self.timestep_embedder(t_sinusoidal(t.float() * 1000.0))
        if guidance is not None:
            temb = temb + self.guidance_embedder(
                t_sinusoidal(guidance.float() * 1000.0))
        return temb + self.text_embedder(pooled)


def _ln(x, dim):
    return F.layer_norm(x, (dim,), eps=1e-6)


class TAdaLNZero(tnn.Module):
    """6-chunk AdaLN-zero.  ``swap_chunks=True`` deliberately flips the
    (shift, scale) order — used by the negative test only."""

    def __init__(self, dim, n=6, swap_chunks=False):
        super().__init__()
        self.linear = tnn.Linear(dim, n * dim)
        self.dim, self.n, self.swap = dim, n, swap_chunks

    def forward(self, x, temb):
        chunks = list(self.linear(F.silu(temb)).chunk(self.n, dim=-1))
        if self.swap:
            chunks[0], chunks[1] = chunks[1], chunks[0]
        shift, scale = chunks[0], chunks[1]
        h = _ln(x, self.dim) * (1 + scale[:, None]) + shift[:, None]
        return (h, *chunks[2:])


class TAdaLNContinuous(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.linear = tnn.Linear(dim, 2 * dim)
        self.dim = dim

    def forward(self, x, temb):
        scale, shift = self.linear(F.silu(temb)).chunk(2, dim=-1)
        return _ln(x, self.dim) * (1 + scale[:, None]) + shift[:, None]


class _GELUProj(tnn.Module):
    def __init__(self, din, dout):
        super().__init__()
        self.proj = tnn.Linear(din, dout)

    def forward(self, x):
        return F.gelu(self.proj(x), approximate='tanh')


class TFF(tnn.Module):
    """diffusers FeedForward: net = [GELU(proj), Dropout, Linear]."""

    def __init__(self, dim, mult=4):
        super().__init__()
        self.net = tnn.ModuleList([_GELUProj(dim, dim * mult),
                                   tnn.Identity(), tnn.Linear(dim * mult, dim)])

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


class TJointAttention(tnn.Module):
    """FLUX/Qwen dual-stream attention.  ``rope_before_norm=True``
    deliberately applies RoPE before the qk-RMSNorms (negative test)."""

    def __init__(self, dim, heads, head_dim, rope_before_norm=False):
        super().__init__()
        inner = heads * head_dim
        self.heads, self.head_dim = heads, head_dim
        self.to_q = tnn.Linear(dim, inner)
        self.to_k = tnn.Linear(dim, inner)
        self.to_v = tnn.Linear(dim, inner)
        self.add_q_proj = tnn.Linear(dim, inner)
        self.add_k_proj = tnn.Linear(dim, inner)
        self.add_v_proj = tnn.Linear(dim, inner)
        self.norm_q = tnn.RMSNorm(head_dim, eps=1e-6)
        self.norm_k = tnn.RMSNorm(head_dim, eps=1e-6)
        self.norm_added_q = tnn.RMSNorm(head_dim, eps=1e-6)
        self.norm_added_k = tnn.RMSNorm(head_dim, eps=1e-6)
        self.to_out = tnn.ModuleList([tnn.Linear(inner, dim)])
        self.to_add_out = tnn.Linear(inner, dim)
        self.rope_before_norm = rope_before_norm

    def _heads(self, x):
        b, s, _ = x.shape
        return x.view(b, s, self.heads, self.head_dim).transpose(1, 2)

    def forward(self, h_img, h_txt, cos, sin, attn_mask=None):
        s_txt = h_txt.shape[1]
        q = self._heads(self.to_q(h_img))
        k = self._heads(self.to_k(h_img))
        v = self._heads(self.to_v(h_img))
        tq = self._heads(self.add_q_proj(h_txt))
        tk = self._heads(self.add_k_proj(h_txt))
        tv = self._heads(self.add_v_proj(h_txt))
        if self.rope_before_norm:
            # WRONG order on purpose: rotate per stream first, then norm
            q = t_apply_rope(q, cos[s_txt:], sin[s_txt:])
            k = t_apply_rope(k, cos[s_txt:], sin[s_txt:])
            tq = t_apply_rope(tq, cos[:s_txt], sin[:s_txt])
            tk = t_apply_rope(tk, cos[:s_txt], sin[:s_txt])
        q, k = self.norm_q(q.float()), self.norm_k(k.float())
        tq, tk = self.norm_added_q(tq.float()), self.norm_added_k(tk.float())
        q = torch.cat([tq, q], dim=2)
        k = torch.cat([tk, k], dim=2)
        v = torch.cat([tv, v], dim=2)
        if not self.rope_before_norm:
            q = t_apply_rope(q, cos, sin)
            k = t_apply_rope(k, cos, sin)
        out = F.scaled_dot_product_attention(q.float(), k.float(), v.float(),
                                             attn_mask=attn_mask)
        b, _, s, _ = out.shape
        out = out.transpose(1, 2).reshape(b, s, -1)
        txt_o, img_o = out[:, :s_txt], out[:, s_txt:]
        return self.to_out[0](img_o), self.to_add_out(txt_o)


class TSingleAttention(tnn.Module):
    def __init__(self, dim, heads, head_dim):
        super().__init__()
        inner = heads * head_dim
        self.heads, self.head_dim = heads, head_dim
        self.to_q = tnn.Linear(dim, inner)
        self.to_k = tnn.Linear(dim, inner)
        self.to_v = tnn.Linear(dim, inner)
        self.norm_q = tnn.RMSNorm(head_dim, eps=1e-6)
        self.norm_k = tnn.RMSNorm(head_dim, eps=1e-6)

    def forward(self, x, cos, sin):
        b, s, _ = x.shape
        sh = (b, s, self.heads, self.head_dim)
        q = self.to_q(x).view(sh).transpose(1, 2)
        k = self.to_k(x).view(sh).transpose(1, 2)
        v = self.to_v(x).view(sh).transpose(1, 2)
        q, k = self.norm_q(q.float()), self.norm_k(k.float())
        q, k = t_apply_rope(q, cos, sin), t_apply_rope(k, cos, sin)
        out = F.scaled_dot_product_attention(q, k, v.float())
        return out.transpose(1, 2).reshape(b, s, -1)


class TFluxJointBlock(tnn.Module):
    def __init__(self, dim, heads, head_dim, swap_adaln=False,
                 rope_before_norm=False):
        super().__init__()
        self.dim = dim
        self.norm1 = TAdaLNZero(dim, swap_chunks=swap_adaln)
        self.norm1_context = TAdaLNZero(dim, swap_chunks=swap_adaln)
        self.attn = TJointAttention(dim, heads, head_dim,
                                    rope_before_norm=rope_before_norm)
        self.ff = TFF(dim)
        self.ff_context = TFF(dim)

    def forward(self, img, txt, temb, cos, sin, attn_mask=None):
        h_i, gate_i, sh_mlp_i, sc_mlp_i, gate_mlp_i = self.norm1(img, temb)
        h_t, gate_t, sh_mlp_t, sc_mlp_t, gate_mlp_t = self.norm1_context(
            txt, temb)
        a_i, a_t = self.attn(h_i, h_t, cos, sin, attn_mask)
        img = img + gate_i[:, None] * a_i
        txt = txt + gate_t[:, None] * a_t
        img = img + gate_mlp_i[:, None] * self.ff(
            _ln(img, self.dim) * (1 + sc_mlp_i[:, None]) + sh_mlp_i[:, None])
        txt = txt + gate_mlp_t[:, None] * self.ff_context(
            _ln(txt, self.dim) * (1 + sc_mlp_t[:, None]) + sh_mlp_t[:, None])
        return img, txt


class TFluxSingleBlock(tnn.Module):
    def __init__(self, dim, heads, head_dim, mlp_ratio=4.0):
        super().__init__()
        self.norm = TAdaLNZero(dim, n=3)
        self.attn = TSingleAttention(dim, heads, head_dim)
        self.proj_mlp = tnn.Linear(dim, int(dim * mlp_ratio))
        self.proj_out = tnn.Linear(heads * head_dim + int(dim * mlp_ratio),
                                   dim)

    def forward(self, x, temb, cos, sin):
        h, gate = self.norm(x, temb)
        attn = self.attn(h, cos, sin)
        mlp = F.gelu(self.proj_mlp(h), approximate='tanh')
        return x + gate[:, None] * self.proj_out(
            torch.cat([attn, mlp], dim=-1))


class TQwenBlock(tnn.Module):
    """Qwen MMDiT block: modulation through Sequential(SiLU, Linear) —
    state key ``img_mod.1`` — six chunks in the same flattened order as
    AdaLN-zero; mask-aware joint attention."""

    def __init__(self, dim, heads, head_dim):
        super().__init__()
        self.dim = dim
        self.img_mod = tnn.Sequential(tnn.SiLU(), tnn.Linear(dim, 6 * dim))
        self.txt_mod = tnn.Sequential(tnn.SiLU(), tnn.Linear(dim, 6 * dim))
        self.attn = TJointAttention(dim, heads, head_dim)
        self.img_mlp = TFF(dim)
        self.txt_mlp = TFF(dim)

    def forward(self, img, txt, temb, cos, sin, attn_mask=None):
        im = self.img_mod(temb).chunk(6, dim=-1)
        tm = self.txt_mod(temb).chunk(6, dim=-1)
        h_i = _ln(img, self.dim) * (1 + im[1][:, None]) + im[0][:, None]
        h_t = _ln(txt, self.dim) * (1 + tm[1][:, None]) + tm[0][:, None]
        a_i, a_t = self.attn(h_i, h_t, cos, sin, attn_mask)
        img = img + im[2][:, None] * a_i
        txt = txt + tm[2][:, None] * a_t
        img = img + im[5][:, None] * self.img_mlp(
            _ln(img, self.dim) * (1 + im[4][:, None]) + im[3][:, None])
        txt = txt + tm[5][:, None] * self.txt_mlp(
            _ln(txt, self.dim) * (1 + tm[4][:, None]) + tm[3][:, None])
        return img, txt


def _pack(latents, p):
    """diffusers _pack_latents: (B, C, H, W) -> (B, N, C*p*p), (c, p, p)
    feature order."""
    b, c, h, w = latents.shape
    x = latents.view(b, c, h // p, p, w // p, p)
    return x.permute(0, 2, 4, 1, 3, 5).reshape(b, (h // p) * (w // p),
                                               c * p * p)


def _unpack(tokens, h, w, p):
    b, n, f = tokens.shape
    c = f // (p * p)
    x = tokens.reshape(b, h // p, w // p, c, p, p)
    return x.permute(0, 3, 1, 4, 2, 5).reshape(b, c, h, w)


def _img_ids(ht, wt, centered=False):
    row = torch.arange(ht)[:, None].expand(ht, wt)
    col = torch.arange(wt)[None].expand(ht, wt)
    ids = torch.stack([torch.zeros_like(row), row, col], -1).reshape(-1, 3)
    if centered:
        ids = ids - torch.tensor([0, ht // 2, wt // 2])
    return ids


class TFluxMirror(tnn.Module):
    def __init__(self, cfg, swap_adaln=False, rope_before_norm=False):
        super().__init__()
        dim = cfg['num_attention_heads'] * cfg['attention_head_dim']
        self.cfg, self.dim = cfg, dim
        self.x_embedder = tnn.Linear(cfg['in_channels'], dim)
        self.context_embedder = tnn.Linear(cfg['joint_attention_dim'], dim)
        self.time_text_embed = TTimeTextEmbed(
            dim, cfg['pooled_projection_dim'], cfg['guidance_embeds'])
        self.transformer_blocks = tnn.ModuleList([
            TFluxJointBlock(dim, cfg['num_attention_heads'],
                            cfg['attention_head_dim'], swap_adaln=swap_adaln,
                            rope_before_norm=rope_before_norm)
            for _ in range(cfg['num_layers'])])
        self.single_transformer_blocks = tnn.ModuleList([
            TFluxSingleBlock(dim, cfg['num_attention_heads'],
                             cfg['attention_head_dim'])
            for _ in range(cfg['num_single_layers'])])
        self.norm_out = TAdaLNContinuous(dim)
        p = cfg['patch_size']
        c = cfg['in_channels'] // (p * p)
        self.proj_out = tnn.Linear(dim, p * p * c)

    def forward(self, latents, t, enc, pooled, guidance=None):
        p = self.cfg['patch_size']
        b, c, h, w = latents.shape
        packed = self.x_embedder(_pack(latents, p))
        txt = self.context_embedder(enc)
        temb = self.time_text_embed(t, pooled, guidance)
        ids = torch.cat([torch.zeros(enc.shape[1], 3, dtype=torch.long),
                         _img_ids(h // p, w // p)])
        cos, sin = t_rope(ids, self.cfg['axes_dims_rope'])
        img = packed
        for blk in self.transformer_blocks:
            img, txt = blk(img, txt, temb, cos, sin)
        hidden = torch.cat([txt, img], dim=1)
        for blk in self.single_transformer_blocks:
            hidden = blk(hidden, temb, cos, sin)
        hidden = hidden[:, txt.shape[1]:]
        return _unpack(self.proj_out(self.norm_out(hidden, temb)), h, w, p)


class TQwenTimeEmbed(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.timestep_embedder = TMLP(256, dim)

    def forward(self, t):
        return self.timestep_embedder(t_sinusoidal(t.float() * 1000.0))


class TQwenMirror(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        dim = cfg['num_attention_heads'] * cfg['attention_head_dim']
        self.cfg, self.dim = cfg, dim
        self.img_in = tnn.Linear(cfg['in_channels'], dim)
        self.txt_norm = tnn.RMSNorm(cfg['joint_attention_dim'], eps=1e-6)
        self.txt_in = tnn.Linear(cfg['joint_attention_dim'], dim)
        self.time_text_embed = TQwenTimeEmbed(dim)
        self.transformer_blocks = tnn.ModuleList([
            TQwenBlock(dim, cfg['num_attention_heads'],
                       cfg['attention_head_dim'])
            for _ in range(cfg['num_layers'])])
        self.norm_out = TAdaLNContinuous(dim)
        p = cfg['patch_size']
        c = cfg['in_channels'] // (p * p)
        self.proj_out = tnn.Linear(dim, p * p * c)

    def forward(self, latents, t, enc, enc_mask=None):
        p = self.cfg['patch_size']
        b, c, h, w = latents.shape
        img = self.img_in(_pack(latents, p))
        txt = self.txt_in(self.txt_norm(enc.float()))
        temb = self.time_text_embed(t)
        s_txt = enc.shape[1]
        ids = torch.cat([torch.zeros(s_txt, 3, dtype=torch.long),
                         _img_ids(h // p, w // p, centered=True)])
        cos, sin = t_rope(ids, self.cfg['axes_dims_rope'])
        attn_mask = None
        if enc_mask is not None:
            key_mask = torch.cat(
                [enc_mask.bool(),
                 torch.ones(b, img.shape[1], dtype=torch.bool)], dim=1)
            attn_mask = key_mask[:, None, None, :]
        for blk in self.transformer_blocks:
            img, txt = blk(img, txt, temb, cos, sin, attn_mask)
        return _unpack(self.proj_out(self.norm_out(img, temb)), h, w, p)


# ---------------------------------------------------------------------------
# fixtures: tiny fp32 flax teachers + converted torch state
# ---------------------------------------------------------------------------

FLUX_CFG = dict(in_channels=16, num_layers=2, num_single_layers=2,
                attention_head_dim=16, num_attention_heads=2,
                joint_attention_dim=24, pooled_projection_dim=16,
                axes_dims_rope=(4, 6, 6), guidance_embeds=True,
                patch_size=2)
QWEN_CFG = dict(in_channels=16, num_layers=2, attention_head_dim=16,
                num_attention_heads=2, joint_attention_dim=24,
                axes_dims_rope=(4, 6, 6), patch_size=2)


def _jitter(params, seed=7):
    leaves, treedef = jax.tree.flatten(params)
    ks = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    return jax.tree.unflatten(treedef, [
        x + 0.05 * jax.random.normal(k, x.shape, x.dtype)
        for x, k in zip(leaves, ks)])


@pytest.fixture(scope='module')
def flux_pair():
    model = FluxTransformer2DModel(checkpointing=False, dtype=jnp.float32,
                                   **FLUX_CFG)
    inputs = dict(hidden_states=jnp.zeros((2, 8, 8, 4)),
                  t=jnp.full((2,), 0.4),
                  encoder_hidden_states=jnp.zeros((2, 5, 24)),
                  pooled_projections=jnp.zeros((2, 16)),
                  guidance=jnp.full((2,), 3.5))
    params = _jitter(model.init(jax.random.PRNGKey(0), **inputs)['params'])
    state = flax_to_torch_flux(jax.device_get(params), family='flux',
                               patch_size=2)
    tstate = {k: torch.from_numpy(np.ascontiguousarray(v)).float()
              for k, v in state.items()}
    return model, params, tstate


@pytest.fixture(scope='module')
def qwen_pair():
    model = QwenImageTransformer2DModel(checkpointing=False,
                                        dtype=jnp.float32, **QWEN_CFG)
    inputs = dict(hidden_states=jnp.zeros((2, 8, 8, 4)),
                  t=jnp.full((2,), 0.4),
                  encoder_hidden_states=jnp.zeros((2, 5, 24)),
                  encoder_hidden_states_mask=jnp.ones((2, 5), jnp.int32))
    params = _jitter(model.init(jax.random.PRNGKey(1), **inputs)['params'])
    state = flax_to_torch_flux(jax.device_get(params), family='qwen',
                               patch_size=2)
    tstate = {k: torch.from_numpy(np.ascontiguousarray(v)).float()
              for k, v in state.items()}
    return model, params, tstate


def _flux_inputs(seed=3):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return dict(
        hidden_states=jax.random.normal(ks[0], (2, 8, 8, 4)),
        t=jnp.array([0.25, 0.9]),
        encoder_hidden_states=jax.random.normal(ks[1], (2, 5, 24)),
        pooled_projections=jax.random.normal(ks[2], (2, 16)),
        guidance=jnp.array([3.5, 1.0]))


def _qwen_inputs(seed=4):
    ks = jax.random.split(jax.random.PRNGKey(seed), 2)
    mask = jnp.ones((2, 5), jnp.int32).at[1, 3:].set(0)
    return dict(
        hidden_states=jax.random.normal(ks[0], (2, 8, 8, 4)),
        t=jnp.array([0.25, 0.9]),
        encoder_hidden_states=jax.random.normal(ks[1], (2, 5, 24)),
        encoder_hidden_states_mask=mask)


def _to_torch_flux(inp):
    return dict(
        latents=torch.from_numpy(
            np.asarray(inp['hidden_states'])).permute(0, 3, 1, 2).float(),
        t=torch.from_numpy(np.asarray(inp['t'])),
        enc=torch.from_numpy(np.asarray(inp['encoder_hidden_states'])).float(),
        pooled=torch.from_numpy(
            np.asarray(inp['pooled_projections'])).float(),
        guidance=torch.from_numpy(np.asarray(inp['guidance'])))


# ---------------------------------------------------------------------------
# parity tests
# ---------------------------------------------------------------------------


def test_flux_forward_matches_torch_mirror(flux_pair):
    model, params, tstate = flux_pair
    inp = _flux_inputs()
    flax_out = np.asarray(model.apply({'params': params}, **inp))

    mirror = TFluxMirror(FLUX_CFG)
    mirror.load_state_dict(tstate, strict=True)
    with torch.no_grad():
        torch_out = mirror(**_to_torch_flux(inp)).numpy()

    np.testing.assert_allclose(flax_out.transpose(0, 3, 1, 2), torch_out,
                               rtol=2e-4, atol=2e-5)


def test_qwen_forward_matches_torch_mirror(qwen_pair):
    """Masked joint attention included: sample 1 pads 2 text tokens."""
    model, params, tstate = qwen_pair
    inp = _qwen_inputs()
    flax_out = np.asarray(model.apply({'params': params}, **inp))

    mirror = TQwenMirror(QWEN_CFG)
    mirror.load_state_dict(tstate, strict=True)
    with torch.no_grad():
        torch_out = mirror(
            latents=torch.from_numpy(np.asarray(
                inp['hidden_states'])).permute(0, 3, 1, 2).float(),
            t=torch.from_numpy(np.asarray(inp['t'])),
            enc=torch.from_numpy(np.asarray(
                inp['encoder_hidden_states'])).float(),
            enc_mask=torch.from_numpy(np.asarray(
                inp['encoder_hidden_states_mask']))).numpy()

    np.testing.assert_allclose(flax_out.transpose(0, 3, 1, 2), torch_out,
                               rtol=2e-4, atol=2e-5)


def test_qwen_mask_actually_masks(qwen_pair):
    """Changing a masked-out text token must not change the output (both
    implementations) — guards against a mask that is silently dropped."""
    model, params, _ = qwen_pair
    inp = _qwen_inputs()
    base = np.asarray(model.apply({'params': params}, **inp))
    enc = inp['encoder_hidden_states'].at[1, 4].add(100.0)
    out = np.asarray(model.apply({'params': params},
                                 **{**inp, 'encoder_hidden_states': enc}))
    np.testing.assert_allclose(base[1], out[1], rtol=1e-5, atol=1e-6)
    # and the unmasked sample 0 DOES change when its text changes
    enc0 = inp['encoder_hidden_states'].at[0, 4].add(100.0)
    out0 = np.asarray(model.apply({'params': params},
                                  **{**inp, 'encoder_hidden_states': enc0}))
    assert np.abs(out0[0] - base[0]).max() > 1e-3


def test_rope_norm_order_swap_breaks_parity(flux_pair):
    """Applying RoPE before the qk-RMSNorms must break parity — proves the
    comparison is sensitive to the op ordering it claims to pin."""
    model, params, tstate = flux_pair
    inp = _flux_inputs()
    flax_out = np.asarray(model.apply({'params': params}, **inp))
    mirror = TFluxMirror(FLUX_CFG, rope_before_norm=True)
    mirror.load_state_dict(tstate, strict=True)
    with torch.no_grad():
        torch_out = mirror(**_to_torch_flux(inp)).numpy()
    assert np.abs(flax_out.transpose(0, 3, 1, 2) - torch_out).max() > 1e-3


def test_adaln_chunk_order_swap_breaks_parity(flux_pair):
    model, params, tstate = flux_pair
    inp = _flux_inputs()
    flax_out = np.asarray(model.apply({'params': params}, **inp))
    mirror = TFluxMirror(FLUX_CFG, swap_adaln=True)
    mirror.load_state_dict(tstate, strict=True)
    with torch.no_grad():
        torch_out = mirror(**_to_torch_flux(inp)).numpy()
    assert np.abs(flax_out.transpose(0, 3, 1, 2) - torch_out).max() > 1e-3
