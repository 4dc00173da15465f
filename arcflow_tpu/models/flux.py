"""FLUX MM-DiT family: teacher transformer + ArcFlux student with mixture heads.

Behavioral equivalent of the reference architectures
(``lakonlab/models/architecture/arcflow/arcflux.py`` and
``.../diffusers/flux.py``): 19 dual-stream joint blocks + 38 single-stream
blocks, 3-axis RoPE (16,56,56), AdaLN-zero modulation, guidance embeds,
patchify p=2 — with the ArcFlow student adding three output heads
(means / logweights / loggammas, init semantics from ``arcflux.py:92-132``)
and rank-256 LoRA on the MLP/timestep-embedder targets
(``configs/flux/arcflux_2nfe_k16.py:40-48``).

TPU-first design:
  * channel-last latents (B, H, W, C); tokens (B, N, D) with D last (lane dim);
  * blocks run under ``nn.scan`` + ``nn.remat`` — one compiled block body
    regardless of depth (compile time and HBM: the reference re-traces 57
    torch blocks and uses torch checkpointing per block);
  * bf16 compute / fp32 params via the layer dtype policy; the three ArcFlow
    heads compute in fp32 (the reference keeps them fp32 via flex_freeze);
  * the trainable/frozen split is a path-substring partition
    (utils/pytree.partition_params) — no requires_grad mutation.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..parallel.mesh import shard_activation
from ..registry import MODULES
from .layers import (AdaLayerNormContinuous, AdaLayerNormZero,
                     AdaLayerNormZeroSingle, FeedForward, JointAttention,
                     LoRADense, SingleStreamAttention, rope_frequencies,
                     timestep_sinusoidal)

Array = jax.Array
Dtype = Any

# the student's trainable surface (reference freeze_exclude,
# configs/flux/arcflux_2nfe_k16.py:20-26)
ARCFLUX_ADAPTER_KEYS = ('proj_out_means', 'proj_out_logweights',
                        'proj_out_loggamma', 'norm_out', 'lora')


class MLPEmbedder(nn.Module):
    dim: int
    lora_rank: int = 0
    lora_dropout: float = 0.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = LoRADense(self.dim, lora_rank=self.lora_rank,
            lora_dropout=self.lora_dropout, dtype=self.dtype,
                      name='linear1')(x)
        return LoRADense(self.dim, lora_rank=self.lora_rank,
            lora_dropout=self.lora_dropout, dtype=self.dtype,
                         name='linear2')(nn.silu(h))


class TimeTextEmbed(nn.Module):
    """timestep (+ optional guidance) sinusoidal embeds + pooled-text MLP."""

    dim: int
    guidance_embeds: bool = False
    lora_rank: int = 0
    lora_dropout: float = 0.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, t: Array, pooled: Array,
                 guidance: Optional[Array] = None) -> Array:
        t_feat = timestep_sinusoidal(t, 256).astype(self.dtype)
        temb = MLPEmbedder(self.dim, lora_rank=self.lora_rank,
            lora_dropout=self.lora_dropout,
                           dtype=self.dtype, name='timestep_embedder')(t_feat)
        if self.guidance_embeds:
            assert guidance is not None, 'guidance_embeds=True needs guidance'
            g_feat = timestep_sinusoidal(guidance, 256).astype(self.dtype)
            temb = temb + MLPEmbedder(self.dim, dtype=self.dtype,
                                      name='guidance_embedder')(g_feat)
        temb = temb + MLPEmbedder(self.dim, dtype=self.dtype,
                                  name='text_embedder')(pooled.astype(self.dtype))
        return temb


class FluxJointBlock(nn.Module):
    """Dual-stream block: AdaLN-zero per stream, joint attention, gated MLP.

    ``moe_experts > 0`` swaps both stream MLPs for expert-choice MoE FFNs
    (layers.MoEFeedForward — beyond-reference; shards over the 'expert'
    mesh axis)."""

    dim: int
    num_heads: int
    head_dim: int
    lora_rank: int = 0
    lora_dropout: float = 0.0
    moe_experts: int = 0
    moe_capacity_factor: float = 1.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, carry, rope_temb, cn=None):
        img, txt = carry
        rope, temb = rope_temb
        h_img, gate_i, shift_mlp_i, scale_mlp_i, gate_mlp_i = AdaLayerNormZero(
            self.dim, dtype=self.dtype, name='img_norm1')(img, temb)
        h_txt, gate_t, shift_mlp_t, scale_mlp_t, gate_mlp_t = AdaLayerNormZero(
            self.dim, dtype=self.dtype, name='txt_norm1')(txt, temb)

        attn_img, attn_txt = JointAttention(
            self.dim, self.num_heads, self.head_dim, dtype=self.dtype,
            name='attn')(h_img, h_txt, rope)
        img = img + gate_i * attn_img
        txt = txt + gate_t * attn_txt

        from .layers import layer_norm_no_affine
        h_img = layer_norm_no_affine(img) * (1 + scale_mlp_i) + shift_mlp_i
        h_txt = layer_norm_no_affine(txt) * (1 + scale_mlp_t) + shift_mlp_t
        img = img + gate_mlp_i * FeedForward(
            self.dim, lora_rank=self.lora_rank,
                lora_dropout=self.lora_dropout,
            moe_experts=self.moe_experts,
            moe_capacity_factor=self.moe_capacity_factor, dtype=self.dtype,
            name='ff_img')(h_img)
        txt = txt + gate_mlp_t * FeedForward(
            self.dim, lora_rank=self.lora_rank,
                lora_dropout=self.lora_dropout,
            moe_experts=self.moe_experts,
            moe_capacity_factor=self.moe_capacity_factor, dtype=self.dtype,
            name='ff_txt')(h_txt)
        if cn is not None:
            # controlnet residual on the image stream, applied at block end
            # (reference arcflux.py:200-210)
            img = img + cn.astype(img.dtype)
        return (img, txt), None


class FluxSingleBlock(nn.Module):
    """Single-stream block: parallel attention + MLP, fused output proj."""

    dim: int
    num_heads: int
    head_dim: int
    mlp_ratio: float = 4.0
    lora_rank: int = 0
    lora_dropout: float = 0.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, rope_temb, cn=None):
        rope, temb = rope_temb
        h, gate = AdaLayerNormZeroSingle(self.dim, dtype=self.dtype,
                                         name='norm')(x, temb)
        attn_out = SingleStreamAttention(
            self.dim, self.num_heads, self.head_dim, dtype=self.dtype,
            name='attn')(h, rope)
        mlp_h = nn.gelu(LoRADense(int(self.dim * self.mlp_ratio),
                                  lora_rank=self.lora_rank,
                                  lora_dropout=self.lora_dropout,
                                  dtype=self.dtype,
                                  name='proj_mlp')(h), approximate=True)
        fused = jnp.concatenate([attn_out, mlp_h], axis=-1)
        out = LoRADense(self.dim, lora_rank=self.lora_rank,
            lora_dropout=self.lora_dropout, dtype=self.dtype,
                        name='proj_out')(fused)
        x = x + gate * out
        if cn is not None:
            # controlnet residual on the image tokens only (the sequence is
            # [txt, img]; reference arcflux.py:232-239)
            s_txt = x.shape[1] - cn.shape[1]
            x = x + jnp.pad(cn.astype(x.dtype),
                            ((0, 0), (s_txt, 0), (0, 0)))
        return x, None


def _scan_blocks(block_cls, n_layers: int, name: str, remat: bool,
                 scan_cn: bool = False, **block_kw):
    """Stack n identical blocks under nn.scan (+ optional remat).

    ``scan_cn`` adds a second, per-layer-scanned input (the controlnet
    residual stack (L, B, N, D)); rope/temb stay layer-invariant.
    """
    cls = block_cls
    if remat:
        cls = nn.remat(cls, prevent_cse=False)
    return nn.scan(
        cls,
        variable_axes={'params': 0, 'quant': 0},
        split_rngs={'params': True, 'dropout': True},
        in_axes=(nn.broadcast, 0) if scan_cn else nn.broadcast,
        length=n_layers,
    )(name=name, **block_kw)


def _apply_stacked_blocks(parent: nn.Module, scan_mod, name: str,
                          block_cls, n_layers: int, remat: bool,
                          block_kw: dict, carry, bcast):
    """Run the stacked blocks of ``scan_mod`` (built by ``_scan_blocks``):
    the plain ``nn.scan`` normally; a microbatched GPipe pipeline over the
    'pipe' mesh axis when one is active (parallel/pipeline.py — PP is
    absent in the reference, SURVEY.md §2.4).

    The pipeline is *the same stacked parameter tree on a different
    schedule*: on the init path (or with no pipe axis) nn.scan declares/
    runs the (L, ...) params as usual; on the pipelined apply path those
    params are read back from ``parent.variables`` and each stage applies
    its layer shard via ``block.apply`` — param names, checkpoint layout
    and the weight converter stay byte-identical.
    """
    from ..parallel.pipeline import pipe_partition, pipeline_scan
    batch = jax.tree.leaves(carry)[0].shape[0]
    part = None if parent.is_initializing() \
        else pipe_partition(n_layers, batch)
    if part is None:
        out, _ = scan_mod(carry, bcast)
        return out
    mesh, axis, micro, interleave = part
    svars = {'params': parent.variables['params'][name]}
    quant = parent.variables.get('quant', {})
    if name in quant:
        svars['quant'] = quant[name]
    block = block_cls(parent=None, **block_kw)
    rng = parent.make_rng('dropout') if parent.has_rng('dropout') else None

    # split the layer-invariant inputs: per-sample leaves (leading dim ==
    # batch: temb, key masks) must microbatch and ride the pipeline with
    # the carry; only batch-free leaves (rope tables) broadcast whole
    leaves, treedef = jax.tree.flatten(bcast)
    is_per_sample = [hasattr(x, 'ndim') and x.ndim >= 1
                     and x.shape[0] == batch for x in leaves]
    ride = [x for x, p in zip(leaves, is_per_sample) if p]

    def rebuild(shared, riding):
        it_r, it_s = iter(riding), iter(shared)
        merged = [next(it_r) if p else next(it_s)
                  for p in is_per_sample]
        return jax.tree.unflatten(treedef, merged)

    shared = [x for x, p in zip(leaves, is_per_sample) if not p]

    def apply_layer(lvars, c_ride, bc_rng, li):
        c, riding = c_ride
        bc, key = bc_rng
        rngs = None if key is None else \
            {'dropout': jax.random.fold_in(key, li)}
        out, _ = block.apply(lvars, c, rebuild(bc, riding), rngs=rngs)
        return (out, riding)

    if remat:
        apply_layer = jax.checkpoint(apply_layer, prevent_cse=False)
    out, _ = pipeline_scan(apply_layer, svars, (carry, ride),
                           (shared, rng), mesh, axis, micro,
                           interleave=interleave)
    return out


def _stack_controlnet_samples(samples, n_layers: int,
                              repeat: bool) -> Array:
    """Map per-controlnet-block residuals onto the n model blocks
    (reference interval/repeat mapping, arcflux.py:200-210, 232-239):
    returns a (L, B, N, D) stack indexable by the scan."""
    n = len(samples)
    if repeat:      # XLabs controlnets cycle their blocks
        idx = np.arange(n_layers) % n
    else:
        interval = int(np.ceil(n_layers / n))
        idx = np.arange(n_layers) // interval
    return jnp.stack([samples[int(i)] for i in idx])


def make_img_ids(h_tokens: int, w_tokens: int) -> Array:
    """(h*w, 3) latent position ids: [0, row, col] (reference
    ``_prepare_latent_image_ids``, arcflux.py:360-373)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (h_tokens, w_tokens), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (h_tokens, w_tokens), 1)
    zeros = jnp.zeros_like(row)
    return jnp.stack([zeros, row, col], axis=-1).reshape(-1, 3)


class FluxBackbone(nn.Module):
    """Shared trunk: embedders + joint blocks + single blocks + final AdaLN.

    Subclasses/heads differ only in the output projection, so teacher
    (FluxTransformer2DModel) and student (ArcFlux) share this trunk — and
    therefore share frozen params structurally.
    """

    family = 'flux'   # converter key-map family (pipelines/convert.py)

    in_channels: int = 64
    num_layers: int = 19
    num_single_layers: int = 38
    attention_head_dim: int = 128
    num_attention_heads: int = 24
    joint_attention_dim: int = 4096
    pooled_projection_dim: int = 768
    guidance_embeds: bool = False
    axes_dims_rope: Tuple[int, int, int] = (16, 56, 56)
    rope_theta: float = 10000.0
    lora_rank: int = 0
    lora_dropout: float = 0.0
    moe_experts: int = 0              # >0: MoE joint-block MLPs (EP-ready)
    moe_capacity_factor: float = 1.0
    checkpointing: bool = True
    dtype: Dtype = jnp.bfloat16

    @property
    def inner_dim(self):
        return self.num_attention_heads * self.attention_head_dim

    @nn.compact
    def trunk(self, packed: Array, t: Array, encoder_hidden_states: Array,
              pooled_projections: Array, img_ids: Array, txt_ids: Array,
              guidance: Optional[Array] = None,
              controlnet_block_samples=None,
              controlnet_single_block_samples=None,
              controlnet_blocks_repeat: bool = False) -> Tuple[Array, Array]:
        """packed: (B, N_img, in_channels) token latents. Returns
        (hidden (B, N_img, D), temb)."""
        dt = self.dtype
        img = shard_activation(
            LoRADense(self.inner_dim, dtype=dt, name='x_embedder')(
                packed.astype(dt)), 'residual')
        txt = shard_activation(
            LoRADense(self.inner_dim, dtype=dt, name='context_embedder')(
                encoder_hidden_states.astype(dt)), 'residual')

        t_scaled = t.astype(jnp.float32) * 1000.0
        g_scaled = guidance.astype(jnp.float32) * 1000.0 \
            if guidance is not None else None
        temb = TimeTextEmbed(self.inner_dim, self.guidance_embeds,
                             lora_rank=self.lora_rank,
                                 lora_dropout=self.lora_dropout, dtype=dt,
                             name='time_text_embed')(
            t_scaled, pooled_projections, g_scaled)

        ids = jnp.concatenate([txt_ids, img_ids], axis=0)
        rope = rope_frequencies(ids, self.axes_dims_rope, self.rope_theta)

        joint_kw = dict(dim=self.inner_dim,
                        num_heads=self.num_attention_heads,
                        head_dim=self.attention_head_dim,
                        lora_rank=self.lora_rank,
                        lora_dropout=self.lora_dropout,
                        moe_experts=self.moe_experts,
                        moe_capacity_factor=self.moe_capacity_factor,
                        dtype=dt)
        joint = _scan_blocks(
            FluxJointBlock, self.num_layers, 'joint_blocks',
            remat=self.checkpointing,
            scan_cn=controlnet_block_samples is not None, **joint_kw)
        if controlnet_block_samples is not None:
            cn = _stack_controlnet_samples(
                controlnet_block_samples, self.num_layers,
                controlnet_blocks_repeat)
            (img, txt), _ = joint((img, txt), (rope, temb), cn)
        else:
            img, txt = _apply_stacked_blocks(
                self, joint, 'joint_blocks', FluxJointBlock,
                self.num_layers, self.checkpointing, joint_kw,
                (img, txt), (rope, temb))

        hidden = jnp.concatenate([txt, img], axis=1)
        single_kw = dict(dim=self.inner_dim,
                         num_heads=self.num_attention_heads,
                         head_dim=self.attention_head_dim,
                         lora_rank=self.lora_rank,
                         lora_dropout=self.lora_dropout, dtype=dt)
        single = _scan_blocks(
            FluxSingleBlock, self.num_single_layers, 'single_blocks',
            remat=self.checkpointing,
            scan_cn=controlnet_single_block_samples is not None,
            **single_kw)
        if controlnet_single_block_samples is not None:
            cn_s = _stack_controlnet_samples(
                controlnet_single_block_samples, self.num_single_layers,
                repeat=False)
            hidden, _ = single(hidden, (rope, temb), cn_s)
        else:
            hidden = _apply_stacked_blocks(
                self, single, 'single_blocks', FluxSingleBlock,
                self.num_single_layers, self.checkpointing, single_kw,
                hidden, (rope, temb))
        hidden = hidden[:, txt.shape[1]:]
        return hidden, temb

    def _prepare_tokens(self, hidden_states, encoder_hidden_states,
                        mask=None, masked_image_latents=None):
        """patchify + optional Flux-fill concat (masked-image latents +
        mask on the packed token features; reference flux.py:139-143 /
        arcflux.py:431-435) + position ids."""
        b, h, w, c = hidden_states.shape
        p = self.patch_size
        packed = patchify(hidden_states, p)
        if mask is not None and masked_image_latents is not None:
            packed = jnp.concatenate(
                [packed,
                 patchify(masked_image_latents.astype(packed.dtype), p),
                 patchify(mask.astype(packed.dtype), p)], axis=-1)
        img_ids = make_img_ids(h // p, w // p)
        txt_ids = jnp.zeros((encoder_hidden_states.shape[1], 3), jnp.int32)
        return packed, img_ids, txt_ids


def patchify(latents: Array, p: int) -> Array:
    """(B, H, W, C) -> (B, H/p * W/p, p*p*C), channel-last."""
    b, h, w, c = latents.shape
    x = latents.reshape(b, h // p, p, w // p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, (h // p) * (w // p), p * p * c)


def unpatchify(tokens: Array, h: int, w: int, p: int) -> Array:
    """(B, N, p*p*C) -> (B, H, W, C)."""
    b, n, pc = tokens.shape
    c = pc // (p * p)
    x = tokens.reshape(b, h // p, w // p, p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


@MODULES.register_module()
class FluxTransformer2DModel(FluxBackbone):
    """Teacher: standard FLUX u-prediction (reference diffusers/flux.py:14)."""

    patch_size: int = 2

    @nn.compact
    def __call__(self, hidden_states: Array, t: Array,
                 encoder_hidden_states: Array = None,
                 pooled_projections: Array = None,
                 guidance: Optional[Array] = None,
                 mask: Optional[Array] = None,
                 masked_image_latents: Optional[Array] = None,
                 controlnet_block_samples=None,
                 controlnet_single_block_samples=None,
                 controlnet_blocks_repeat: bool = False, **kwargs) -> Array:
        b, h, w, c = hidden_states.shape
        p = self.patch_size
        packed, img_ids, txt_ids = self._prepare_tokens(
            hidden_states, encoder_hidden_states, mask, masked_image_latents)

        hidden, temb = self.trunk(
            packed, t, encoder_hidden_states, pooled_projections, img_ids,
            txt_ids, guidance,
            controlnet_block_samples=controlnet_block_samples,
            controlnet_single_block_samples=controlnet_single_block_samples,
            controlnet_blocks_repeat=controlnet_blocks_repeat)
        hidden = AdaLayerNormContinuous(self.inner_dim, dtype=self.dtype,
                                        name='norm_out')(hidden, temb)
        out = LoRADense(p * p * c, dtype=jnp.float32, name='proj_out')(
            hidden.astype(jnp.float32))
        return unpatchify(out, h, w, p)


@MODULES.register_module()
class ArcFluxTransformer2DModel(FluxBackbone):
    """Student: FLUX trunk + 3 ArcFlow mixture heads (reference
    arcflux.py:259-456).

    Output dict (channel-last pixel-latent space):
      means      (B, K, H, W, C)
      logweights (B, K, H, W, 1)   log-softmax over K, per patch cell
      loggammas  (B, K-1, H, W, 1)
    """

    patch_size: int = 2
    num_gaussians: int = 16

    @property
    def logweights_channels(self):
        return self.patch_size * self.patch_size

    @nn.compact
    def __call__(self, hidden_states: Array, t: Array,
                 encoder_hidden_states: Array = None,
                 pooled_projections: Array = None,
                 guidance: Optional[Array] = None,
                 mask: Optional[Array] = None,
                 masked_image_latents: Optional[Array] = None,
                 controlnet_block_samples=None,
                 controlnet_single_block_samples=None,
                 controlnet_blocks_repeat: bool = False, **kwargs) -> dict:
        b, h, w, c = hidden_states.shape
        p = self.patch_size
        k = self.num_gaussians
        packed, img_ids, txt_ids = self._prepare_tokens(
            hidden_states, encoder_hidden_states, mask, masked_image_latents)

        hidden, temb = self.trunk(
            packed, t, encoder_hidden_states, pooled_projections, img_ids,
            txt_ids, guidance,
            controlnet_block_samples=controlnet_block_samples,
            controlnet_single_block_samples=controlnet_single_block_samples,
            controlnet_blocks_repeat=controlnet_blocks_repeat)
        hidden = AdaLayerNormContinuous(self.inner_dim, dtype=self.dtype,
                                        name='norm_out')(hidden, temb)
        hidden = hidden.astype(jnp.float32)
        n = hidden.shape[1]

        # ---- heads (fp32, zero-kernel inits; reference arcflux.py:92-132) --
        def means_bias_init(key, shape, dtype=jnp.float32):
            # 0.1 * randn per (component, pixel-channel), shared across the
            # p^2 cells of each patch (reference arcflux.py:104-105)
            noise = 0.1 * jax.random.normal(key, (k, c), dtype)
            return jnp.broadcast_to(noise[:, None, :], (k, p * p, c)).reshape(shape)

        def gamma_bias_init(key, shape, dtype=jnp.float32):
            del key
            target = jnp.logspace(math.log10(0.2), math.log10(4.0), k - 1)
            logg = jnp.log(target)   # log-spaced rates in [0.2, 4.0]
            return jnp.broadcast_to(logg[:, None],
                                    (k - 1, p * p)).reshape(shape).astype(dtype)

        means = LoRADense(k * p * p * c, dtype=jnp.float32,
                          kernel_init=nn.initializers.zeros,
                          bias_init=means_bias_init,
                          name='proj_out_means')(hidden)
        logweights = LoRADense(k * p * p, dtype=jnp.float32,
                               kernel_init=nn.initializers.zeros,
                               name='proj_out_logweights')(hidden)
        loggammas = LoRADense((k - 1) * p * p, dtype=jnp.float32,
                              kernel_init=nn.initializers.zeros,
                              bias_init=gamma_bias_init,
                              name='proj_out_loggamma')(hidden)

        # reshape token outputs to (B, K, H, W, ...) pixel space
        means = means.reshape(b, n, k, p * p, c)
        logweights = jax.nn.log_softmax(
            logweights.reshape(b, n, k, p * p, 1), axis=2)
        loggammas = loggammas.reshape(b, n, k - 1, p * p, 1)

        def to_pixel(x, kk, ch):
            # (B, N, K, p*p, ch) -> (B, K, H, W, ch)
            x = x.transpose(0, 2, 1, 3, 4).reshape(b * kk, n, p * p * ch)
            x = unpatchify(x, h, w, p)
            return x.reshape(b, kk, h, w, ch)

        return dict(means=to_pixel(means, k, c),
                    logweights=to_pixel(logweights, k, 1),
                    loggammas=to_pixel(loggammas, k - 1, 1))
