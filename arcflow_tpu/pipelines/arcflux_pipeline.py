"""End-user 2-NFE text-to-image pipelines (FLUX + Qwen-Image).

Equivalent capability to the reference pipelines
(``lakonlab/pipelines/arcflux_pipeline.py`` / ``arcqwen_pipeline.py``):
prompt encoding -> nfe-step ArcFlow sampling (one DiT call + analytic
momentum integration per step, temperature on non-final steps) -> VAE decode.

TPU design: the whole latent loop compiles into ONE XLA program per
(batch, resolution, nfe) signature with donated latents; VAE decode is a
second program. The reference's duplicated in-pipeline integrator
(arcflux_pipeline.py:195-249) does not exist here — the pipeline drives the
same ``ArcFlowImitationDataFree.forward_test`` used in training evaluation.
"""

from __future__ import annotations

import functools
import json
import os
from typing import Any, Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion import ArcFlowImitationDataFree
from ..registry import build_module

Array = jax.Array


def retrieve_raw_timesteps(num_inference_steps: int,
                           total_substeps: int = 128,
                           timestep_ratio: float = 1.0):
    """(nfe, substeps, ratio) -> raw sigma grid + per-segment substep counts
    (reference ``retrieve_raw_timesteps``, arcflux_pipeline.py:34-70)."""
    eps = 1e-4
    nfe = num_inference_steps
    ratio = max(timestep_ratio, eps)
    base = 1.0 / (nfe - 1 + ratio)
    raw = [1.0]
    substeps = []
    for i in range(nfe):
        seg = base * (ratio if i == nfe - 1 else 1.0)
        raw.append(max(raw[-1] - seg, 0.0))
        substeps.append(max(round(seg * total_substeps), 1))
    return np.asarray(raw, np.float32), substeps


class ArcFluxPipeline:
    """FLUX-family ArcFlow pipeline."""

    diffusion_cls = ArcFlowImitationDataFree
    family = 'flux'   # converter key-map family (pipelines/convert.py)

    def __init__(self, transformer, transformer_params,
                 vae=None, vae_params=None, text_encoder=None,
                 shift: float = 3.2, use_dynamic_shifting: bool = False,
                 nfe: int = 2, timestep_ratio: float = 1.0,
                 temperature: float = 1.0, total_substeps: int = 128,
                 guidance_scale: float = 3.5):
        self.transformer = transformer
        self.transformer_params = transformer_params
        self.vae = build_module(vae) if isinstance(vae, dict) else vae
        self.vae_params = vae_params
        self.text_encoder = text_encoder
        self.guidance_scale = guidance_scale
        self.diffusion = self.diffusion_cls(
            denoising=transformer,
            num_timesteps=1,
            timestep_sampler=dict(
                type='ContinuousTimeStepSampler', shift=shift,
                use_dynamic_shifting=use_dynamic_shifting),
            test_cfg=dict(nfe=nfe, timestep_ratio=timestep_ratio,
                          temperature=temperature,
                          total_substeps=total_substeps))
        self._sample_jit = jax.jit(
            lambda params, rng, noise, override, **kw:
            self.diffusion.forward_test(params, rng, noise,
                                        test_cfg_override=dict(override),
                                        **kw),
            static_argnums=(3,), donate_argnums=(2,))
        self._decode_jit = jax.jit(
            lambda p, z: self.vae.decode(p, z)) if self.vae else None

    # ---- loading -----------------------------------------------------------
    @classmethod
    def _dummy_inputs(cls, model) -> Dict[str, Array]:
        """Tiny abstract inputs for ``jax.eval_shape(model.init, ...)`` —
        used to derive the expected param structure without allocating."""
        p = model.patch_size
        c = model.in_channels // (p * p)
        kw = dict(hidden_states=jnp.zeros((1, 2 * p, 2 * p, c)),
                  t=jnp.zeros((1,)),
                  encoder_hidden_states=jnp.zeros(
                      (1, 4, model.joint_attention_dim)))
        if getattr(model, 'family', cls.family) == 'flux':
            kw['pooled_projections'] = jnp.zeros(
                (1, model.pooled_projection_dim))
            if model.guidance_embeds:
                kw['guidance'] = jnp.zeros((1,))
        else:
            kw['encoder_hidden_states_mask'] = jnp.ones((1, 4), jnp.int32)
        return kw

    @classmethod
    def from_pretrained(cls, model_dir: str, transformer_cls=None, **kwargs):
        """Build from a local diffusers-style folder (offline; the reference
        pulls from the HF hub).

        Two folder shapes are accepted:

        * a *transformer* folder (config.json + safetensors) — loads the
          DiT only; VAE/text towers come in through the constructor;
        * a *full pipeline* folder with ``model_index.json`` — assembles
          transformer + VAE + text encoder(s) + tokenizer(s) + scheduler
          config in ONE call, the reference's serving entry point
          (``ArcFluxPipeline.from_pretrained('black-forest-labs/FLUX.1-dev')``,
          reference inference_flux.py:5-7 via diffusers' model_index
          machinery, lakonlab/pipelines/arcflux_pipeline.py:73).
        """
        from ..models import ArcFluxTransformer2DModel
        from ..utils.pytree import flatten
        from .convert import (expand_proj_out_to_arc_heads,
                              load_safetensors_state, torch_flux_to_flax)
        from ..utils.io_utils import get_file_backend, uri_scheme
        if uri_scheme(model_dir) == 'local' and \
                os.path.exists(os.path.join(model_dir, 'model_index.json')):
            return cls._from_pipeline_folder(
                model_dir, transformer_cls=transformer_cls, **kwargs)
        if uri_scheme(model_dir) != 'local':
            # hub/remote model folder (reference arcflow_loader.py:45-67
            # pulls the repo through the HF cache): config.json rides the
            # same backend as the weights
            backend = get_file_backend(model_dir)
            mi_uri = backend.join_path(model_dir, 'model_index.json')
            if backend.exists(mi_uri):
                raise NotImplementedError(
                    f'{model_dir} is a FULL pipeline repo (model_index.'
                    f'json); full-pipeline assembly needs a local folder — '
                    f'download it, then from_pretrained(<local_dir>) '
                    f'assembles transformer + VAE + text towers + '
                    f'scheduler in one call. Remote URIs load transformer '
                    f'folders only.')
            cfg_uri = backend.join_path(model_dir, 'config.json')
            cfg = json.loads(backend.get(cfg_uri)) \
                if backend.exists(cfg_uri) else {}
        else:
            cfg_path = os.path.join(model_dir, 'config.json')
            cfg = json.load(open(cfg_path)) \
                if os.path.exists(cfg_path) else {}
        if transformer_cls is None and cfg.get('_class_name'):
            # resolve the transformer class from the config, the reference
            # loader's scheme (arcflow_loader.py:157-175)
            from .. import models as _models
            transformer_cls = getattr(_models, cfg['_class_name'], None)
        if transformer_cls is None:
            transformer_cls = ArcFluxTransformer2DModel
        # keep only constructor fields (diffusers config.json carries extra
        # bookkeeping keys) and re-tuple JSON lists (axes_dims_rope etc. —
        # flax module fields must stay hashable)
        fields = getattr(transformer_cls, '__dataclass_fields__', {})
        cfg = {k: tuple(v) if isinstance(v, list) else v
               for k, v in cfg.items()
               if not k.startswith('_') and (not fields or k in fields)}
        model = transformer_cls(**cfg)
        state = load_safetensors_state(model_dir)
        # Thread the converter family + patch size from the transformer
        # class (models declare their key-map family): the FLUX and Qwen
        # block key maps share no block keys, so a mismatched family yields
        # a near-empty tree.
        family = getattr(model, 'family', cls.family)
        tree, _ = torch_flux_to_flax(
            state, model.num_layers,
            getattr(model, 'num_single_layers', 0),
            family=family, patch_size=model.patch_size)
        if 'proj_out' in tree and getattr(model, 'num_gaussians', 0):
            # teacher-only dir: expand proj_out into the K-way arc heads
            # (reference arcflux.py:327-341 does this at student init)
            tree = expand_proj_out_to_arc_heads(
                tree, model.num_gaussians, model.patch_size)
        # structural validation against the model's init structure (trace
        # only — eval_shape allocates nothing): a wrong-family dir or key-map
        # drift must fail loudly here, not produce a silently-garbage tree.
        expected = jax.eval_shape(
            model.init, jax.random.PRNGKey(0),
            **cls._dummy_inputs(model))['params']
        exp, got = flatten(expected), flatten(tree)
        bad = [f'{k}: ckpt {np.shape(got[k])} vs model {tuple(exp[k].shape)}'
               for k in got
               if k in exp and tuple(np.shape(got[k])) != tuple(exp[k].shape)]
        missing = sorted(set(exp) - set(got))
        if bad or len(missing) > 0.1 * len(exp):
            raise ValueError(
                f'checkpoint at {model_dir} does not match the '
                f'{family!r} key maps / {type(model).__name__} '
                f'structure: {len(missing)}/{len(exp)} model params missing '
                f'(e.g. {missing[:3]}); shape mismatches: {bad[:3]} — wrong '
                f'pipeline family for this folder?')
        return cls(model, tree, **kwargs)

    @classmethod
    def _from_pipeline_folder(cls, root: str, transformer_cls=None,
                              text_encoder_kwargs: Optional[dict] = None,
                              vae_kwargs: Optional[dict] = None, **kwargs):
        """One-call assembly from a diffusers pipeline folder: reads
        ``model_index.json`` and builds every declared component from its
        subfolder — transformer, VAE (+params), text encoder(s) with their
        tokenizer subfolders, and the scheduler's shift/dynamic-shift config.
        Component classes dispatch on the *index entries* (e.g. an
        ``AutoencoderKLQwenImage`` vae entry selects the Wan VAE), so either
        pipeline class can open either family's folder."""
        with open(os.path.join(root, 'model_index.json')) as f:
            index = json.load(f)

        def sub(name):
            d = os.path.join(root, name)
            return d if name in index and os.path.isdir(d) else None

        # scheduler config -> timestep-sampler knobs (the reference swaps in
        # FlowMatchEulerDiscreteScheduler(shift=3.2), inference_flux.py:14-15;
        # explicit constructor kwargs win over the folder's config)
        sched_dir = sub('scheduler')
        if sched_dir is not None and 'shift' not in kwargs:
            spath = os.path.join(sched_dir, 'scheduler_config.json')
            if os.path.exists(spath):
                with open(spath) as f:
                    scfg = json.load(f)
                if 'shift' in scfg:
                    kwargs['shift'] = scfg['shift']
                kwargs.setdefault('use_dynamic_shifting',
                                  bool(scfg.get('use_dynamic_shifting',
                                                False)))

        vae_dir = sub('vae')
        if vae_dir is not None and 'vae' not in kwargs:
            vae_cls_name = (index.get('vae') or (None, ''))[1] or ''
            vae, vae_params = cls._load_vae_folder(vae_dir, vae_cls_name,
                                                   **(vae_kwargs or {}))
            kwargs['vae'], kwargs['vae_params'] = vae, vae_params

        if sub('text_encoder') is not None and 'text_encoder' not in kwargs:
            kwargs['text_encoder'] = cls._build_text_encoder(
                root, index, **(text_encoder_kwargs or {}))

        return cls.from_pretrained(os.path.join(root, 'transformer'),
                                   transformer_cls=transformer_cls, **kwargs)

    @staticmethod
    def _load_vae_folder(vae_dir: str, class_name: str = '', **overrides):
        """(vae module, grafted params) from a diffusers vae/ subfolder;
        the folder's config.json carries the architecture + latent
        normalization constants."""
        from ..models import PretrainedVAE, PretrainedVAEQwenImage
        cfg = {}
        cpath = os.path.join(vae_dir, 'config.json')
        if os.path.exists(cpath):
            with open(cpath) as f:
                cfg = json.load(f)
        if 'QwenImage' in class_name or 'Wan' in class_name:
            keys = ('base_dim', 'z_dim', 'dim_mult', 'num_res_blocks',
                    'latents_mean', 'latents_std')
            vae = PretrainedVAEQwenImage(
                from_pretrained=vae_dir, dtype='bfloat16',
                **{**{k: cfg[k] for k in keys if k in cfg}, **overrides})
        else:
            keys = ('latent_channels', 'block_out_channels',
                    'layers_per_block', 'scaling_factor', 'shift_factor',
                    'latents_mean', 'latents_std', 'use_quant_conv',
                    'use_post_quant_conv')
            vae = PretrainedVAE(
                from_pretrained=vae_dir, dtype='bfloat16',
                **{**{k: cfg[k] for k in keys if k in cfg}, **overrides})
        return vae, vae.init_params(jax.random.PRNGKey(0))

    @staticmethod
    def _build_text_encoder(root: str, index: dict, **overrides):
        """Text tower(s) from the pipeline folder's text_encoder*/tokenizer*
        subfolders; lazy — weights load on first encode call."""
        from ..models import (PretrainedFluxTextEncoder,
                              PretrainedQwenImageTextEncoder)
        te_cls_name = (index.get('text_encoder') or (None, ''))[1] or ''
        if te_cls_name.startswith('Qwen'):
            return PretrainedQwenImageTextEncoder(
                pretrained=os.path.join(root, 'text_encoder'),
                tokenizer_path=os.path.join(root, 'tokenizer'), **overrides)
        return PretrainedFluxTextEncoder(
            clip_path=os.path.join(root, 'text_encoder'),
            t5_path=os.path.join(root, 'text_encoder_2'),
            clip_tokenizer_path=os.path.join(root, 'tokenizer'),
            t5_tokenizer_path=os.path.join(root, 'tokenizer_2'), **overrides)

    def load_arcflow_adapter(self, adapter_path: str, rng=None):
        """Graft an exported ArcFlow adapter (heads + norm_out + LoRA) onto
        the base transformer (reference ``ArcFlowLoaderMixin``,
        arcflow_loader.py:45-275). Reads the ``policy_config`` JSON from the
        safetensors metadata header."""
        from .loader import load_adapter_state
        adapter_tree, policy_config = load_adapter_state(
            adapter_path, family=getattr(self.transformer, 'family',
                                         self.family))
        from ..utils.pytree import merge_params
        self.transformer_params = merge_params(self.transformer_params,
                                               adapter_tree)
        if policy_config:
            tc = dict(self.diffusion.test_cfg)
            tc.update({k: v for k, v in policy_config.items()
                       if k in ('nfe', 'timestep_ratio', 'total_substeps',
                                'temperature')})
            self.diffusion.test_cfg = tc
        return policy_config

    def quantize_int8(self, act_quant: bool = False,
                      min_size: int = 2 ** 16) -> None:
        """int8-quantize the transformer for serving (beyond-reference).

        Weight-only int8 halves transformer HBM (the FLUX-12B geometry fits
        one 16 GB chip); ``act_quant=True`` additionally quantizes
        activations per token so the big matmuls run on the MXU int8 path
        (~1.7x the bf16 ceiling on v5e). The ArcFlow adapter surface (heads,
        LoRA, norm_out) stays high-precision — call AFTER
        ``load_arcflow_adapter``.
        """
        from ..utils.quantize import quantize_weights_int8, set_act_quant
        assert 'params' not in self.transformer_params, 'already quantized'
        qp, quant = quantize_weights_int8(self.transformer_params,
                                          min_size=min_size)
        self.transformer_params = {'params': qp, 'quant': quant}
        set_act_quant(act_quant)   # trace-time global; set before jit traces

    def quantize_int4(self, act_quant: bool = False,
                      min_size: int = 2 ** 16,
                      group_size: int = 128) -> None:
        """int4 with group-wise scales: quarter transformer HBM (the FULL
        Qwen-20B geometry fits one 16 GB chip; the reference needs 57 GB +
        CPU offload, README.md:69). ``act_quant=True`` (w4a8) additionally
        quantizes activations per token and runs one K=group int8 dot per
        scale group at the MXU int8 rate — int8-class speed on
        int4-resident weights. Same adapter-surface skip rules as int8;
        call AFTER ``load_arcflow_adapter``."""
        from ..utils.quantize import quantize_weights_int4, set_act_quant
        assert 'params' not in self.transformer_params, 'already quantized'
        qp, quant = quantize_weights_int4(self.transformer_params,
                                          min_size=min_size,
                                          group_size=group_size)
        self.transformer_params = {'params': qp, 'quant': quant}
        set_act_quant(act_quant)   # trace-time global; set before jit traces

    def shard(self, mesh_axes: Dict[str, int], sp_mode: str = 'ulysses',
              dcn_axes: Optional[Dict[str, int]] = None,
              min_size: int = 2 ** 16):
        """Place the transformer across a device mesh for multi-chip
        serving — the reference README lists "Multi-GPU Inference" as an
        unshipped To-Do (reference README.md:39); here it is the same one
        mesh surface as training:

          * ``fsdp`` shards the (frozen) weights, ``tensor`` the heads/MLP,
            ``sp`` a single image's sequence (Ulysses or ring layout —
            the single-image latency axes), ``pipe`` stages the blocks,
            ``expert`` the MoE experts;
          * activations pin through the same trace-time constraints as
            training, so the next ``__call__`` compiles the sharded
            program. Call AFTER ``load_arcflow_adapter`` / ``quantize_*``
            (the placement maps whatever tree is current, quantized or
            not).

        Returns the mesh. Example::

            pipe.quantize_int8(act_quant=True)
            pipe.shard({'sp': 4, 'tensor': 2})   # v5p-8 single-image
        """
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..parallel import (make_mesh, param_spec_for_path,
                                set_activation_sharding)
        mesh = make_mesh(dict(mesh_axes), dcn_axes=dcn_axes)
        set_activation_sharding(mesh, sp_mode=sp_mode)

        def place(path, x):
            ps = '/'.join(str(getattr(k, 'key', k)) for k in path)
            spec = param_spec_for_path(ps, x, mesh, min_size=min_size)
            return jax.device_put(x, NamedSharding(mesh, spec))

        self.transformer_params = jax.tree_util.tree_map_with_path(
            place, self.transformer_params)
        if self.vae_params is not None:
            # the decoder is conv-bound and small: replicate, decode locally
            self.vae_params = jax.tree.map(
                lambda x: jax.device_put(x, NamedSharding(mesh, P())),
                self.vae_params)
        self.mesh = mesh
        return mesh

    # ---- inference ------------------------------------------------------------
    def encode_prompt(self, prompt: Sequence[str]) -> Dict[str, Array]:
        assert self.text_encoder is not None, \
            'pass prompt_embeds or construct with a text_encoder'
        return self.text_encoder(prompt)

    def prepare_latents(self, rng, batch_size: int, height: int, width: int,
                        channels: Optional[int] = None) -> Array:
        if channels is None:
            p = getattr(self.transformer, 'patch_size', 2)
            channels = self.transformer.in_channels // (p * p)
        return jax.random.normal(
            rng, (batch_size, height // 8, width // 8, channels), jnp.float32)

    def __call__(self, prompt: Optional[Sequence[str]] = None,
                 prompt_embeds: Optional[Dict[str, Array]] = None,
                 height: int = 1024, width: int = 1024,
                 num_inference_steps: Optional[int] = None,
                 timestep_ratio: Optional[float] = None,
                 temperature: Optional[float] = None,
                 guidance_scale: Optional[float] = None,
                 latents: Optional[Array] = None,
                 seed: int = 0, output_type: str = 'np'):
        embeds = dict(prompt_embeds) if prompt_embeds is not None \
            else self.encode_prompt(prompt)
        bs = next(iter(embeds.values())).shape[0]
        rng = jax.random.PRNGKey(seed)
        rng, rng_noise = jax.random.split(rng)
        if latents is None:
            latents = self.prepare_latents(rng_noise, bs, height, width)

        gs = guidance_scale if guidance_scale is not None \
            else self.guidance_scale
        if getattr(self.transformer, 'guidance_embeds', False) and \
                'guidance' not in embeds:
            embeds['guidance'] = jnp.full((bs,), gs, jnp.float32)

        override = {}
        if num_inference_steps is not None:
            override['nfe'] = num_inference_steps
        if timestep_ratio is not None:
            override['timestep_ratio'] = timestep_ratio
        if temperature is not None:
            override['temperature'] = temperature
        override = tuple(sorted(override.items()))

        # the sampling program is forward-only: trace it under the serving
        # flag so forward-optimized kernels (splash attention) engage
        from ..utils.quantize import set_serving
        set_serving(True)
        try:
            latents = self._sample_jit(self.transformer_params, rng, latents,
                                       override, **embeds)
        finally:
            set_serving(False)
        if self.vae is None or output_type == 'latent':
            return dict(latents=latents)
        imgs = self._decode_jit(self.vae_params, latents)
        imgs = jnp.clip(imgs / 2 + 0.5, 0.0, 1.0)
        if output_type == 'pil':
            from PIL import Image
            arr = np.asarray(imgs * 255).astype(np.uint8)
            return dict(images=[Image.fromarray(a) for a in arr])
        return dict(images=np.asarray(imgs))


class ArcQwenImagePipeline(ArcFluxPipeline):
    """Qwen-Image-family ArcFlow pipeline (reference arcqwen_pipeline.py).

    Same structure; Qwen has no guidance embeds and uses the text mask."""

    family = 'qwen'

    @classmethod
    def from_pretrained(cls, model_dir: str, transformer_cls=None, **kwargs):
        from ..models import ArcQwenImageTransformer2DModel
        return super().from_pretrained(
            model_dir,
            transformer_cls=transformer_cls or ArcQwenImageTransformer2DModel,
            **kwargs)
