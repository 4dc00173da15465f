"""Latent text-to-image distillation composition (FLUX/Qwen-scale wiring).

Equivalent capability to the reference ``LatentDiffusionTextImage``
(``lakonlab/models/latent_diffusion_text_image.py``) + ``BaseDiffusion``
(``base_diffusion.py:73-113``): prompt embeds (cached or text-encoder
on-the-fly), latents (cached or VAE-encoded), distilled-guidance vectors,
teacher CFG with negative-embed concat — and the teacher/student/EMA weight
economy:

  * ``frozen['base']``     — the shared DiT trunk (one copy in HBM),
  * ``frozen['teacher_head']`` — the teacher's original proj_out,
  * ``trainable['diffusion']`` — the ArcFlow adapter (3 heads + norm_out +
    LoRA; <5% of params, reference README.md:29),
  * student params = overlay(base, adapter); teacher params =
    overlay(base, teacher_head).

The reference achieves this sharing with FSDP unshard-hook surgery
(``tie_fsdp_modules``, fsdp_wrapper.py:123-163); here it is a dict overlay of
array references — zero copies by construction.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..registry import MODELS, build_module
from ..diffusion.arcflow import multistep_train_loss
from ..utils.pytree import drop_params, merge_params, partition_params
from .base import BaseModel
from .flux import ARCFLUX_ADAPTER_KEYS

Array = jax.Array


@MODELS.register_module()
class LatentDiffusionTextImage(BaseModel):

    def __init__(self, diffusion: dict, teacher: Optional[dict] = None,
                 vae: Optional[dict] = None, text_encoder: Optional[dict] = None,
                 diffusion_use_ema: bool = True, tie_teacher: bool = True,
                 freeze_exclude: Tuple[str, ...] = ARCFLUX_ADAPTER_KEYS,
                 teacher_head_keys: Tuple[str, ...] = ('proj_out', 'norm_out'),
                 latent_shape: Tuple[int, int, int] = (64, 64, 16),
                 text_embed_dim: int = 4096, pooled_dim: int = 768,
                 max_text_len: int = 512,
                 frozen_dtype: Optional[str] = None,
                 frozen_quant: Optional[str] = None,
                 frozen_quant_min_size: int = 2 ** 16,
                 frozen_quant_group_size: int = 128,
                 train_cfg=None, test_cfg=None):
        super().__init__(train_cfg, test_cfg)
        # `pretrained=` on the denoising cfg loads real (converted diffusers)
        # weights at init_params time — the reference's in-__init__ HF load
        # (arcflux.py:318-357); flax modules are static so the path is kept
        # on the composition object instead.
        diffusion = dict(diffusion)
        denoising_cfg = dict(diffusion.get('denoising') or {})
        self.pretrained = denoising_cfg.pop('pretrained', None)
        self.pretrained_adapter = denoising_cfg.pop('pretrained_adapter', None)
        if diffusion.get('denoising'):
            diffusion['denoising'] = denoising_cfg
        if teacher:
            teacher = dict(teacher)
            t_denoising = dict(teacher.get('denoising') or {})
            # with tie_teacher the single student-side load covers the shared
            # trunk; an untied teacher loads the same checkpoint separately
            self.teacher_pretrained = t_denoising.pop('pretrained', None) \
                or self.pretrained
            # teacher multi-LoRA fuse loading (reference
            # diffusers/flux.py:57-68: pretrained_lora list + scales)
            self.teacher_pretrained_lora = t_denoising.pop(
                'pretrained_lora', None)
            self.teacher_pretrained_lora_scale = t_denoising.pop(
                'pretrained_lora_scale', 1.0)
            if teacher.get('denoising'):
                teacher['denoising'] = t_denoising
        else:
            self.teacher_pretrained = None
            self.teacher_pretrained_lora = None
        self.diffusion = build_module(
            diffusion, default_args=dict(train_cfg=self.train_cfg,
                                         test_cfg=self.test_cfg))
        self.teacher = build_module(teacher) if teacher else None
        self.vae = build_module(vae) if vae else None
        self.text_encoder = build_module(text_encoder) if text_encoder else None
        self.diffusion_use_ema = diffusion_use_ema
        self.tie_teacher = tie_teacher
        self.freeze_exclude = tuple(freeze_exclude)
        self.teacher_head_keys = tuple(teacher_head_keys)
        self.latent_shape = tuple(latent_shape)
        self.text_embed_dim = text_embed_dim
        self.pooled_dim = pooled_dim
        self.max_text_len = max_text_len
        # storage dtype for the frozen trunk (the reference's FSDP
        # MixedPrecision keeps frozen params bf16, flex_freeze casts only
        # trainable modules fp32 — _fsdp_train.py:36-37 + utils.py:22-81);
        # None keeps init/load precision (fp32)
        self.frozen_dtype = frozen_dtype
        # 'int8': per-output-channel int8 on the frozen trunk's big kernels
        # (weights never update, so quantization is a one-time transform);
        # halves frozen HBM again vs bf16 — roughly doubles the trainable
        # on-chip model scale. 'int4': nibble-packed group-wise int4 —
        # quarter of bf16, halving the trunk again (the weight-only int4
        # matmul is differentiable w.r.t. activations, so LoRA gradients
        # flow through it unchanged). Gradients flow through the
        # dequantized dots into the fp32 adapter (weight-only: compute
        # stays bf16). Beyond-reference capability (the reference trains
        # the trunk in bf16 only); quality gated by
        # tests/test_quantized_quality.py's int8-/int4-teacher
        # distillation runs.
        assert frozen_quant in (None, 'int8', 'int4'), frozen_quant
        self.frozen_quant = frozen_quant
        self.frozen_quant_min_size = frozen_quant_min_size
        self.frozen_quant_group_size = frozen_quant_group_size

    @property
    def ema_keys(self):
        return ('diffusion',) if self.diffusion_use_ema else ()

    # ---- params -----------------------------------------------------------
    def _dummy_inputs(self):
        h, w, c = self.latent_shape
        return dict(
            hidden_states=jnp.zeros((1, h, w, c)),
            t=jnp.zeros((1,)),
            encoder_hidden_states=jnp.zeros((1, 8, self.text_embed_dim)),
            pooled_projections=jnp.zeros((1, self.pooled_dim)),
            guidance=jnp.zeros((1,)) if getattr(
                self.diffusion.denoising, 'guidance_embeds', False) else None)

    @property
    def _family(self) -> str:
        return 'qwen' if 'Qwen' in type(self.diffusion.denoising).__name__ \
            else 'flux'

    def _load_pretrained_tree(self, path: str):
        """Load + convert a diffusers-format checkpoint (local safetensors
        dir / file / sharded index.json) to the flax naming, matching the
        reference's sharded-index loader (runner/checkpoint.py:241-278)."""
        from ..pipelines.convert import load_safetensors_state, torch_flux_to_flax
        den = self.diffusion.denoising
        state = load_safetensors_state(path)
        converted, unused = torch_flux_to_flax(
            state, num_layers=den.num_layers,
            num_single_layers=getattr(den, 'num_single_layers', 0),
            family=self._family, patch_size=den.patch_size,
            num_gaussians=getattr(den, 'num_gaussians', None))
        unexpected = [k for k in unused if not k.startswith(
            ('vae.', 'text_encoder', 'scheduler'))]
        if unexpected:
            raise ValueError(
                f'{len(unexpected)} unconvertible checkpoint keys, e.g. '
                f'{sorted(unexpected)[:5]}')
        return converted

    def init_params(self, rng):
        rng_s, rng_t, rng_noise = jax.random.split(rng, 3)
        dummy = {k: v for k, v in self._dummy_inputs().items() if v is not None}
        student_full = self.diffusion.denoising.init(rng_s, **dummy)['params']

        converted = None
        if self.pretrained is not None:
            from ..pipelines.convert import (expand_proj_out_to_arc_heads,
                                             graft_pretrained)
            converted = self._load_pretrained_tree(self.pretrained)
            if (self.teacher_pretrained_lora is not None and self.tie_teacher
                    and self.teacher_pretrained == self.pretrained):
                # tied trunk: the teacher's fused LoRAs ARE the shared base
                # (the reference builds the teacher first and ties its
                # weights into the student, base_diffusion.py:84-94)
                from ..pipelines.convert import fuse_pretrained_loras
                converted = fuse_pretrained_loras(
                    converted, self.teacher_pretrained_lora,
                    self.teacher_pretrained_lora_scale, family=self._family)
            # teacher proj_out -> K-way means head with seeded bias noise
            # (reference arcflux.py:327-341); logweights/loggamma heads and
            # LoRA keep their designed init, so they land in `missing`.
            den = self.diffusion.denoising
            expanded = expand_proj_out_to_arc_heads(
                converted, num_gaussians=den.num_gaussians,
                patch_size=den.patch_size, rng=rng_noise)
            student_full, missing, unexpected = graft_pretrained(
                student_full, expanded)
            if unexpected:
                raise ValueError(f'pretrained keys not in the student: '
                                 f'{sorted(unexpected)[:5]}')
            if self.pretrained_adapter is not None:
                from ..pipelines.convert import fuse_lora
                from ..pipelines.loader import load_adapter_state
                adapter_tree, _ = load_adapter_state(
                    self.pretrained_adapter, family=self._family)
                # base-override keys merge in; loaded LoRA deltas fuse into
                # the base kernels and unload (reference arcflux.py:342-355);
                # the new student's own fresh-init LoRA leaves re-attach on
                # top (their fused delta is zero: lora_b inits to zeros).
                fused = fuse_lora(merge_params(student_full, adapter_tree))
                fresh_lora, _ = partition_params(student_full, ('lora',))
                student_full = merge_params(fused, fresh_lora)

        adapter, base = partition_params(student_full, self.freeze_exclude)

        frozen: Dict[str, Any] = {'base': base}
        if self.teacher is not None:
            teacher_full = self.teacher.denoising.init(rng_t, **dummy)['params']
            if self.teacher_pretrained is not None:
                from ..pipelines.convert import graft_pretrained
                t_converted = converted if (
                    self.teacher_pretrained == self.pretrained
                    and converted is not None) \
                    else self._load_pretrained_tree(self.teacher_pretrained)
                if self.teacher_pretrained_lora is not None \
                        and t_converted is not converted:
                    from ..pipelines.convert import fuse_pretrained_loras
                    t_converted = fuse_pretrained_loras(
                        t_converted, self.teacher_pretrained_lora,
                        self.teacher_pretrained_lora_scale,
                        family=self._family)
                teacher_full, _, t_unexpected = graft_pretrained(
                    teacher_full, t_converted)
                if t_unexpected:
                    raise ValueError(f'pretrained keys not in the teacher: '
                                     f'{sorted(t_unexpected)[:5]}')
            if self.tie_teacher:
                # keep only the teacher-specific top-level head; the trunk
                # (incl. single_blocks.proj_out) comes from the shared base
                head, _ = partition_params(teacher_full, self.teacher_head_keys,
                                           exact_prefix=True)
                frozen['teacher_head'] = head
            else:
                frozen['teacher_full'] = teacher_full
        if self.frozen_dtype is not None:
            dt = jnp.dtype(self.frozen_dtype)
            frozen = jax.tree.map(
                lambda x: x.astype(dt)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, frozen)
        if self.frozen_quant is not None:
            from ..utils.quantize import (quantize_weights_int4,
                                          quantize_weights_int8)
            if self.frozen_quant == 'int8':
                quant_fn = lambda p: quantize_weights_int8(  # noqa: E731
                    p, min_size=self.frozen_quant_min_size)
            else:
                quant_fn = lambda p: quantize_weights_int4(  # noqa: E731
                    p, min_size=self.frozen_quant_min_size,
                    group_size=self.frozen_quant_group_size)
            frozen['base'], frozen['base_quant'] = quant_fn(frozen['base'])
            if 'teacher_full' in frozen:
                frozen['teacher_full'], frozen['teacher_quant'] = \
                    quant_fn(frozen['teacher_full'])
        return {'diffusion': adapter}, frozen

    def _with_quant(self, params, frozen, quant_key='base_quant'):
        if quant_key in frozen:
            return {'params': params, 'quant': frozen[quant_key]}
        return params

    def student_params(self, trainable, frozen):
        return self._with_quant(
            merge_params(frozen['base'], trainable['diffusion']), frozen)

    def teacher_params(self, frozen):
        if 'teacher_full' in frozen:
            return self._with_quant(frozen['teacher_full'], frozen,
                                    'teacher_quant')
        # note: single-block 'proj_out' layers exist in base too; the teacher
        # head partition keeps both — overlay order makes teacher head win
        return self._with_quant(
            merge_params(frozen['base'], frozen.get('teacher_head', {})),
            frozen)

    # ---- batch plumbing ------------------------------------------------------
    def _prompt_embeds(self, batch: Dict[str, Any], negative: bool = False
                       ) -> Dict[str, Array]:
        prefix = 'negative_' if negative else ''
        if f'{prefix}prompt_embed_kwargs' in batch:
            return dict(batch[f'{prefix}prompt_embed_kwargs'])
        if f'{prefix}prompt_kwargs' in batch:
            assert self.text_encoder is not None, \
                'text_encoder required to embed raw prompts'
            return self.text_encoder(**batch[f'{prefix}prompt_kwargs'])
        raise ValueError(
            f'batch needs {prefix}prompt_embed_kwargs or {prefix}prompt_kwargs')

    def _latents(self, batch: Dict[str, Any], frozen) -> Array:
        if 'latents' in batch:
            return jnp.asarray(batch['latents'])
        if 'images' in batch:
            assert self.vae is not None, 'vae required to encode images'
            return self.vae.encode(frozen.get('vae'),
                                   jnp.asarray(batch['images']) * 2 - 1)
        raise ValueError('batch needs latents or images')

    def _teacher_fn(self, frozen, batch, bs: int):
        """Closure querying the frozen teacher's u with CFG + distilled
        guidance (reference ``_prepare_train_minibatch_teacher_args``)."""
        from ..parallel.mesh import shard_activation
        t_params = jax.lax.stop_gradient(self.teacher_params(frozen))
        gs = self.train_cfg.get('teacher_guidance_scale', None)
        use_cfg = gs is not None and gs not in (0.0, 1.0)
        pos = {k: shard_activation(v, 'batch')
               for k, v in self._prompt_embeds(batch).items()}
        if use_cfg:
            neg = self._prompt_embeds(batch, negative=True)
            kwargs = {k: shard_activation(
                jnp.concatenate([shard_activation(neg[k], 'batch'), v],
                                axis=0), 'batch')
                      for k, v in pos.items()}
        else:
            gs = 1.0
            kwargs = dict(pos)
        tdg = self.train_cfg.get('teacher_distilled_guidance_scale', None)
        if tdg is not None:
            n = bs * 2 if use_cfg else bs
            kwargs['guidance'] = jnp.full((n,), tdg, jnp.float32)

        def fn(x_t, t):
            return self.teacher.forward_u(t_params, x_t, t,
                                          guidance_scale=gs, **kwargs)
        return fn

    # ---- training -------------------------------------------------------------
    def loss(self, trainable, frozen, rng, batch, running_status=None):
        from ..parallel.mesh import shard_activation
        latents = shard_activation(self._latents(batch, frozen), 'batch')
        bs = latents.shape[0]
        # pin the embed inputs at the program boundary so GSPMD doesn't
        # back-propagate an interior (seq-sharded) layout onto the batch
        # params (involuntary full-remat reshard otherwise)
        diffusion_kwargs = {k: shard_activation(v, 'batch')
                            for k, v in self._prompt_embeds(batch).items()}
        dgs = self.train_cfg.get('distilled_guidance_scale', None)
        if dgs is not None:
            diffusion_kwargs['guidance'] = jnp.full((bs,), dgs, jnp.float32)

        teacher_fn = self._teacher_fn(frozen, batch, bs) \
            if self.teacher is not None else None

        params = self.student_params(trainable, frozen)
        return multistep_train_loss(
            self.diffusion, params, rng, latents, teacher_fn=teacher_fn,
            running_status=running_status, **diffusion_kwargs)

    # ---- evaluation --------------------------------------------------------------
    def val_step(self, state, rng, batch, use_ema=True,
                 test_cfg_override=None, **kwargs):
        cfg = dict(self.test_cfg)
        cfg.update(test_cfg_override or {})
        adapter = state.params_for_eval('diffusion', prefer_ema=use_ema)
        params = self.student_params({'diffusion': adapter}, state.frozen)

        embeds = self._prompt_embeds(batch)
        bs = next(iter(embeds.values())).shape[0]
        dgs = cfg.get('distilled_guidance_scale', None)
        if dgs is not None:
            embeds['guidance'] = jnp.full((bs,), dgs, jnp.float32)

        noise = batch.get('noise')
        if noise is None:
            h, w, c = cfg.get('latent_size', self.latent_shape)
            noise = jax.random.normal(rng, (bs, h, w, c))
        latents_out = self.diffusion.forward_test(
            params, rng, jnp.asarray(noise),
            test_cfg_override=test_cfg_override, **embeds)
        if self.vae is not None:
            imgs = self.vae.decode(state.frozen.get('vae'), latents_out)
            return dict(num_samples=bs,
                        pred_imgs=jnp.clip(imgs / 2 + 0.5, 0.0, 1.0))
        return dict(num_samples=bs, pred_latents=latents_out)
