"""Pretrained text encoder wrappers (CLIP-L + T5-XXL for FLUX, Qwen2.5-VL for
Qwen-Image, triple-CLIP/T5 for SD3).

Equivalent capability to the reference wrappers
(``lakonlab/models/architecture/diffusers/pretrained.py:153-281``): encode a
batch of prompts into the kwargs dict the DiT consumes
(``encoder_hidden_states`` / ``pooled_projections`` /
``encoder_hidden_states_mask``) with max-length padding.

Built on transformers' Flax models (FlaxT5EncoderModel / FlaxCLIPTextModel)
— batched XLA forward passes. Weights load from local paths or the HF cache;
in network-less environments the cached-embedding data path
(``prompt_embed_kwargs`` in batches, the reference's primary training mode)
does not need these at all.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..registry import MODULES


def _require_transformers():
    try:
        import transformers
    except ImportError as e:   # pragma: no cover
        raise RuntimeError('transformers is required for on-the-fly text '
                           'encoding; use cached prompt_embed_kwargs '
                           'otherwise') from e
    # patch the removed jnp.clip(a_min/a_max) spelling at import time, before
    # ANY FlaxT5 model init can trace it (init_weights traces the forward,
    # so patching lazily in _load() is too late for externally-built models)
    _patch_flax_t5_clip(transformers)
    return transformers


class _JnpClipCompat:
    """jnp proxy whose clip() accepts the removed a_min/a_max spellings.

    transformers' FlaxT5 still calls ``jnp.clip(x, a_max=...)``
    (modeling_flax_t5.py:261) — deprecated in jax and slated for removal,
    i.e. the T5 path would break on a jax upgrade. ``modeling_flax_t5`` does
    ``import jax.numpy as jnp``, so swapping that module's ``jnp`` attribute
    for this proxy is contained to the one file.
    """

    def __getattr__(self, name):
        return getattr(jnp, name)

    @staticmethod
    def clip(x, a_min=None, a_max=None, **kwargs):
        return jnp.clip(x, min=kwargs.get('min', a_min),
                        max=kwargs.get('max', a_max))


def _patch_flax_t5_clip(tf) -> None:
    m = tf.models.t5.modeling_flax_t5
    if not isinstance(m.jnp, _JnpClipCompat):
        m.jnp = _JnpClipCompat()


@MODULES.register_module()
class PretrainedFluxTextEncoder:
    """CLIP-L pooled embedding + T5-XXL sequence embedding (reference
    ``PretrainedFluxTextEncoder``, pretrained.py:153-190)."""

    def __init__(self, clip_path: str = 'openai/clip-vit-large-patch14',
                 t5_path: str = 'google/t5-v1_1-xxl',
                 max_sequence_length: int = 512, dtype: str = 'bfloat16',
                 freeze: bool = True,
                 clip_tokenizer_path: Optional[str] = None,
                 t5_tokenizer_path: Optional[str] = None, **kwargs):
        self.clip_path = clip_path
        self.t5_path = t5_path
        # diffusers pipeline folders keep tokenizers in sibling subfolders
        # (tokenizer/ vs text_encoder/); standalone repos keep them together
        self.clip_tokenizer_path = clip_tokenizer_path or clip_path
        self.t5_tokenizer_path = t5_tokenizer_path or t5_path
        self.max_sequence_length = max_sequence_length
        self.dtype = getattr(jnp, dtype)
        self._loaded = False

    def _load(self):
        if self._loaded:
            return
        tf = _require_transformers()
        _patch_flax_t5_clip(tf)
        self.clip_tokenizer = tf.CLIPTokenizer.from_pretrained(
            self.clip_tokenizer_path)
        self.clip = tf.FlaxCLIPTextModel.from_pretrained(
            self.clip_path, dtype=self.dtype)
        self.t5_tokenizer = tf.T5TokenizerFast.from_pretrained(
            self.t5_tokenizer_path)
        self.t5 = tf.FlaxT5EncoderModel.from_pretrained(
            self.t5_path, dtype=self.dtype)
        self._loaded = True

    def __call__(self, prompt: Sequence[str], **kwargs) -> Dict[str, Any]:
        self._load()
        clip_inputs = self.clip_tokenizer(
            list(prompt), padding='max_length', max_length=77,
            truncation=True, return_tensors='np')
        pooled = self.clip(input_ids=clip_inputs['input_ids']).pooler_output

        t5_inputs = self.t5_tokenizer(
            list(prompt), padding='max_length',
            max_length=self.max_sequence_length, truncation=True,
            return_tensors='np')
        seq = self.t5(input_ids=t5_inputs['input_ids']).last_hidden_state
        return dict(encoder_hidden_states=jnp.asarray(seq),
                    pooled_projections=jnp.asarray(pooled))


@MODULES.register_module()
class PretrainedQwenImageTextEncoder:
    """Qwen2.5-VL-7B prompt encoder (reference
    ``PretrainedQwenImageTextEncoder``, pretrained.py:194-238).

    ``backend='flax'`` (default) runs the native flax Qwen2.5 decoder
    (models/qwen_text.py) as one jitted XLA program on the accelerator —
    prompt encoding stops being a host-CPU torch forward serialized against
    the train step. ``backend='torch'`` keeps the transformers VL model on
    host CPU (useful to cross-check, and for checkpoints the converter
    cannot read).
    """

    PROMPT_TEMPLATE = (
        '<|im_start|>system\nDescribe the image by detailing the color, '
        'shape, size, texture, quantity, text, spatial relationships of the '
        'objects and background:<|im_end|>\n'
        '<|im_start|>user\n{}<|im_end|>\n<|im_start|>assistant\n')
    PROMPT_TEMPLATE_DROP_IDX = 34

    def __init__(self, pretrained: str = 'Qwen/Qwen2.5-VL-7B-Instruct',
                 pad_seq_len: Optional[int] = 512, dtype: str = 'bfloat16',
                 freeze: bool = True, backend: str = 'flax',
                 tokenizer_path: Optional[str] = None, **kwargs):
        self.pretrained = pretrained
        # diffusers pipeline folders keep the tokenizer in a sibling
        # subfolder (tokenizer/ vs text_encoder/)
        self.tokenizer_path = tokenizer_path or pretrained
        self.pad_seq_len = pad_seq_len
        self.dtype_name = dtype
        assert backend in ('flax', 'torch'), backend
        self.backend = backend
        self._loaded = False

    def _load_flax(self):
        tf = _require_transformers()
        from .qwen_text import load_qwen25_text_params
        self.tokenizer = tf.AutoTokenizer.from_pretrained(self.tokenizer_path)
        dt = getattr(jnp, self.dtype_name)
        self.model, params = load_qwen25_text_params(self.pretrained,
                                                     dtype=dt)
        # big kernels in compute dtype; norms/bias stay fp32
        self.params = jax.tree.map(
            lambda x: x.astype(dt) if x.ndim >= 2 else x, params)
        model = self.model

        @jax.jit
        def encode(params, input_ids, attention_mask):
            return model.apply({'params': params}, input_ids, attention_mask)

        self._encode = encode
        self._loaded = True

    def _load(self):
        if self._loaded:
            return
        if self.backend == 'flax':
            self._load_flax()
            return
        tf = _require_transformers()
        import torch
        self.tokenizer = tf.AutoTokenizer.from_pretrained(self.tokenizer_path)
        # Qwen2.5-VL checkpoints are *ForConditionalGeneration — the causal-LM
        # auto class does not map them. Try the VL class first (what
        # diffusers' QwenImagePipeline loads), fall back for text-only repos.
        cls = getattr(tf, 'Qwen2_5_VLForConditionalGeneration', None)
        errors = []
        for candidate in (cls, getattr(tf, 'AutoModelForImageTextToText',
                                       None), tf.AutoModelForCausalLM):
            if candidate is None:
                continue
            try:
                self.model = candidate.from_pretrained(
                    self.pretrained,
                    torch_dtype=getattr(torch, self.dtype_name))
                break
            except (ValueError, OSError, KeyError) as e:
                errors.append((candidate.__name__, e))
        else:
            raise RuntimeError(f'could not load {self.pretrained}: {errors}')
        self.model.eval()
        self._loaded = True

    def __call__(self, prompt: Sequence[str], **kwargs) -> Dict[str, Any]:
        self._load()
        if self.backend == 'flax':
            return self._call_flax(prompt)
        return self._call_torch(prompt)

    def _call_flax(self, prompt: Sequence[str]) -> Dict[str, Any]:
        texts = [self.PROMPT_TEMPLATE.format(p) for p in prompt]
        drop = self.PROMPT_TEMPLATE_DROP_IDX
        # fixed-length padding: one compiled program per batch size instead
        # of one per longest-prompt length
        max_len = (self.pad_seq_len + drop if self.pad_seq_len is not None
                   else 1024)
        enc = self.tokenizer(texts, padding='max_length', max_length=max_len,
                             truncation=True, return_tensors='np')
        hidden = self._encode(self.params,
                              jnp.asarray(enc['input_ids'], jnp.int32),
                              jnp.asarray(enc['attention_mask'], jnp.int32))
        hidden = hidden[:, drop:]
        mask = jnp.asarray(enc['attention_mask'][:, drop:], jnp.int32)
        return dict(
            encoder_hidden_states=jnp.asarray(hidden, jnp.float32),
            encoder_hidden_states_mask=mask)

    def _call_torch(self, prompt: Sequence[str]) -> Dict[str, Any]:
        import torch
        texts = [self.PROMPT_TEMPLATE.format(p) for p in prompt]
        enc = self.tokenizer(texts, padding=True, return_tensors='pt')
        with torch.no_grad():
            out = self.model(**enc, output_hidden_states=True)
        hidden = out.hidden_states[-1]
        drop = self.PROMPT_TEMPLATE_DROP_IDX
        hidden = hidden[:, drop:]
        mask = enc['attention_mask'][:, drop:]
        if self.pad_seq_len is not None:
            s = hidden.shape[1]
            if s < self.pad_seq_len:
                pad = self.pad_seq_len - s
                hidden = torch.nn.functional.pad(hidden, (0, 0, 0, pad))
                mask = torch.nn.functional.pad(mask, (0, pad))
            else:
                hidden = hidden[:, :self.pad_seq_len]
                mask = mask[:, :self.pad_seq_len]
        return dict(
            encoder_hidden_states=jnp.asarray(
                hidden.float().numpy(), jnp.float32),
            encoder_hidden_states_mask=jnp.asarray(mask.numpy(), jnp.int32))


@MODULES.register_module()
class PretrainedStableDiffusion3TextEncoder:
    """SD3 triple encoder — reference pretrained.py:242-281, producing the
    real SD3 embedding layout (diffusers SD3Pipeline.encode_prompt):

      encoder_hidden_states:
        concat_seq( pad_feat(concat_feat(clip_l_hidden[-2] (B,77,768),
                                         clip_g_hidden[-2] (B,77,1280)),
                             -> t5_dim),
                    t5_seq (B, max_len, t5_dim) )
      pooled_projections: concat(clip_l_text_embeds, clip_g_text_embeds)
                          (B, 2048)
    """

    def __init__(self, clip_l_path: str = 'openai/clip-vit-large-patch14',
                 clip_g_path: str = 'laion/CLIP-ViT-bigG-14-laion2B-39B-b160k',
                 t5_path: str = 'google/t5-v1_1-xxl',
                 max_sequence_length: int = 256, dtype: str = 'bfloat16',
                 **kwargs):
        self.clip_l_path = clip_l_path
        self.clip_g_path = clip_g_path
        self.t5_path = t5_path
        self.max_sequence_length = max_sequence_length
        self.dtype = getattr(jnp, dtype)
        self._loaded = False

    def _load(self):
        if self._loaded:
            return
        tf = _require_transformers()
        _patch_flax_t5_clip(tf)
        proj_cls = getattr(tf, 'FlaxCLIPTextModelWithProjection',
                           tf.FlaxCLIPTextModel)

        def load_clip(path):
            tok = tf.CLIPTokenizer.from_pretrained(path)
            try:
                model = proj_cls.from_pretrained(path, dtype=self.dtype)
            except (OSError, ValueError):
                model = proj_cls.from_pretrained(path, dtype=self.dtype,
                                                 from_pt=True)
            return tok, model

        self.clip_l_tok, self.clip_l = load_clip(self.clip_l_path)
        self.clip_g_tok, self.clip_g = load_clip(self.clip_g_path)
        self.t5_tokenizer = tf.T5TokenizerFast.from_pretrained(self.t5_path)
        self.t5 = tf.FlaxT5EncoderModel.from_pretrained(self.t5_path,
                                                        dtype=self.dtype)
        self._loaded = True

    def _clip_embed(self, tok, model, prompt):
        inputs = tok(list(prompt), padding='max_length', max_length=77,
                     truncation=True, return_tensors='np')
        out = model(input_ids=inputs['input_ids'],
                    output_hidden_states=True)
        hidden = out.hidden_states[-2]          # penultimate, SD3 convention
        pooled = getattr(out, 'text_embeds', None)
        if pooled is None:
            pooled = out.pooler_output
        return hidden, pooled

    def __call__(self, prompt: Sequence[str], **kwargs) -> Dict[str, Any]:
        self._load()
        h_l, p_l = self._clip_embed(self.clip_l_tok, self.clip_l, prompt)
        h_g, p_g = self._clip_embed(self.clip_g_tok, self.clip_g, prompt)
        clip_seq = jnp.concatenate([h_l, h_g], axis=-1)    # (B, 77, 2048)

        t5_inputs = self.t5_tokenizer(
            list(prompt), padding='max_length',
            max_length=self.max_sequence_length, truncation=True,
            return_tensors='np')
        t5_seq = self.t5(input_ids=t5_inputs['input_ids']).last_hidden_state
        clip_seq = jnp.pad(
            clip_seq, ((0, 0), (0, 0),
                       (0, t5_seq.shape[-1] - clip_seq.shape[-1])))
        return dict(
            encoder_hidden_states=jnp.concatenate([clip_seq, t5_seq], axis=1),
            pooled_projections=jnp.concatenate([p_l, p_g], axis=-1))
