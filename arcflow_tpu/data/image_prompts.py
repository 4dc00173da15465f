"""ImagePrompt dataset: cached text-embedding records for T2I distillation.

Equivalent capability to the reference ``ImagePrompt``
(``lakonlab/datasets/image_prompts.py``): two modes —

  (a) cache mode: a jsonl(.gz) datalist naming zstd-compressed pickle records
      ``{prompt, prompt_embed_kwargs, latents?|latent_size, latents_scale?}``
      (the 3M-prompt / 3TB FLUX cache format, configs/flux/README.md);
  (b) prompt mode: raw prompts (jsonl/list/HF dataset) encoded on the fly by
      the model's text encoder.

Plus: ``pad_seq_len`` truncation/padding with masks, negative prompt embeds
from a single file, per-index deterministic test noise (the reference's
golden-fixture substitute), resolution bucket ids, start/end slicing and
repeat.

Tensors are converted to channel-last numpy on load (reference stores torch
CHW tensors; the device never sees torch).
"""

from __future__ import annotations

import gzip
import io
import json
import os
import pickle
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from ..registry import DATASETS


def _to_numpy(x):
    """torch tensor / numpy / scalar -> numpy (no torch import unless needed)."""
    if isinstance(x, np.ndarray) or np.isscalar(x):
        return np.asarray(x)
    if hasattr(x, 'detach'):   # torch tensor
        return x.detach().to('cpu').float().numpy()
    return np.asarray(x)


def _chw_to_hwc(x: np.ndarray) -> np.ndarray:
    if x.ndim == 3:
        return np.moveaxis(x, 0, -1)
    return x


def load_datalist(path: str) -> List[dict]:
    """jsonl(.gz) datalist; lines are names or {'name':..., 'size_idx':...}."""
    opener = gzip.open if path.endswith('.gz') else open
    out = []
    with opener(path, 'rt', encoding='utf-8') as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                rec = line
            if isinstance(rec, str):
                rec = {'name': rec}
            out.append(rec)
    return out


@DATASETS.register_module()
class ImagePrompt:
    def __init__(self,
                 cache_dir: Optional[str] = None,
                 datalist_path: Optional[str] = None,
                 prompts: Optional[Sequence[str]] = None,
                 prompts_path: Optional[str] = None,
                 negative_prompt_embeds_path: Optional[str] = None,
                 negative_prompt: Optional[str] = None,
                 latent_size=(128, 128, 16),
                 pad_seq_len: Optional[int] = None,
                 start_ind: int = 0,
                 end_ind: Optional[int] = None,
                 repeat: int = 1,
                 test_mode: bool = False,
                 ignore_cached_latents: bool = False):
        self.cache_dir = cache_dir
        self.test_mode = test_mode
        self.ignore_cached_latents = ignore_cached_latents
        self.latent_size = tuple(latent_size)
        self.pad_seq_len = pad_seq_len
        self.repeat = repeat

        if cache_dir is not None:
            assert datalist_path is not None, 'cache mode needs a datalist'
            self.datalist = load_datalist(datalist_path)
        else:
            if prompts_path is not None:
                self.datalist = load_datalist(prompts_path)
                for r in self.datalist:
                    r.setdefault('prompt', r.get('name'))
            elif prompts is not None:
                self.datalist = [{'prompt': p} for p in prompts]
            else:
                raise ValueError('need cache_dir+datalist, prompts, or '
                                 'prompts_path')

        n = len(self.datalist)
        if end_ind is None:
            end_ind = n
        # negative indices slice from the end (reference start_ind=-128 style)
        self.start_ind = start_ind % n if start_ind < 0 else start_ind
        self.end_ind = end_ind % n if end_ind < 0 else min(end_ind, n)

        self.negative_prompt = negative_prompt
        self.negative_prompt_embed_kwargs = None
        if negative_prompt_embeds_path is not None:
            self.negative_prompt_embed_kwargs = self._load_embed_file(
                negative_prompt_embeds_path)

        # resolution buckets from datalist size_idx (reference
        # image_prompts.py:188-203)
        self.bucket_ids = np.asarray(
            [r.get('size_idx', 0) for r in self.datalist[
                self.start_ind:self.end_ind]], np.int64)

    @staticmethod
    def _load_embed_file(path: str) -> Dict[str, np.ndarray]:
        if path.endswith('.npz'):
            return {k: np.asarray(v) for k, v in np.load(path).items()}
        import torch
        data = torch.load(path, map_location='cpu', weights_only=False)
        return {k: _to_numpy(v) for k, v in data.items()}

    def __len__(self):
        return self.repeat * (self.end_ind - self.start_ind)

    def _map_idx(self, idx: int) -> int:
        return self.start_ind + (idx // self.repeat) % \
            (self.end_ind - self.start_ind)

    def parse_prompt_embeds(self, raw: dict) -> Dict[str, np.ndarray]:
        """Extract + pad/truncate embed kwargs (reference
        image_prompts.py:277-309 incl. legacy key remap)."""
        pek = raw.get('prompt_embed_kwargs')
        if pek is None:
            # legacy flat keys
            pek = {}
            remap = {'prompt_embeds': 'encoder_hidden_states',
                     'pooled_prompt_embeds': 'pooled_projections',
                     'prompt_embeds_mask': 'encoder_hidden_states_mask'}
            for old, new in remap.items():
                if old in raw:
                    pek[new] = raw[old]
        pek = {k: _to_numpy(v) for k, v in pek.items()}
        if self.pad_seq_len is not None and 'encoder_hidden_states' in pek:
            seq = pek['encoder_hidden_states']
            s = seq.shape[0]
            if s < self.pad_seq_len:
                pad = self.pad_seq_len - s
                pek['encoder_hidden_states'] = np.pad(
                    seq, ((0, pad), (0, 0)))
                mask = pek.get('encoder_hidden_states_mask',
                               np.ones((s,), np.int64))
                pek['encoder_hidden_states_mask'] = np.pad(mask, (0, pad))
            else:
                pek['encoder_hidden_states'] = seq[:self.pad_seq_len]
                if 'encoder_hidden_states_mask' in pek:
                    pek['encoder_hidden_states_mask'] = \
                        pek['encoder_hidden_states_mask'][:self.pad_seq_len]
        return pek

    def getitems(self, indices) -> list:
        """Batched fetch: the native loader reads + zstd-decompresses all
        records in parallel with the GIL released (C++ core in
        ``_fastloader``); python unpickles the already-decoded bytes."""
        if self.cache_dir is None:
            return [self[int(i)] for i in indices]
        from ._fastloader import get_fastloader
        fast = get_fastloader()
        if fast is None:
            return [self[int(i)] for i in indices]
        paths = [os.path.join(self.cache_dir,
                              f'{self.datalist[self._map_idx(int(i))]["name"]}.zst')
                 for i in indices]
        blobs = fast.load_batch(paths, num_threads=0, decompress=True)
        return [self._build_item(int(i), pickle.loads(blob))
                for i, blob in zip(indices, blobs)]

    def _build_item(self, idx: int, raw: dict) -> dict:
        """Assemble one sample from a decoded cache record."""
        rec = self.datalist[self._map_idx(idx)]
        data: Dict[str, Any] = dict(
            ids=idx, name=raw.get('prompt', rec['name']),
            prompt_embed_kwargs=self.parse_prompt_embeds(raw))
        if not self.ignore_cached_latents:
            if 'latents' in raw:
                latents = _chw_to_hwc(_to_numpy(raw['latents']))
                if self.test_mode:
                    data['noise'] = np.random.default_rng(idx).standard_normal(
                        latents.shape).astype(np.float32)
                else:
                    scale = raw.get('latents_scale')
                    data['latents'] = latents * scale if scale is not None \
                        else latents
            else:
                size = tuple(raw.get('latent_size', self.latent_size))
                if self.test_mode:
                    data['noise'] = np.random.default_rng(idx).standard_normal(
                        size).astype(np.float32)
                else:
                    data['latents'] = np.zeros(size, np.float32)
        if self.negative_prompt_embed_kwargs is not None:
            data['negative_prompt_embed_kwargs'] = \
                self.negative_prompt_embed_kwargs
        if self.negative_prompt is not None:
            data['negative_prompt_kwargs'] = dict(prompt=self.negative_prompt)
        return data

    def __getitem__(self, idx: int) -> dict:
        mapped = self._map_idx(idx)
        rec = self.datalist[mapped]

        if self.cache_dir is not None:
            import zstandard as zstd
            path = os.path.join(self.cache_dir, f'{rec["name"]}.zst')
            with open(path, 'rb') as fh:
                with zstd.ZstdDecompressor().stream_reader(fh) as f:
                    raw = pickle.load(f)
            return self._build_item(idx, raw)
        else:
            prompt = rec['prompt']
            data = dict(ids=idx, name=prompt,
                        prompt_kwargs=dict(prompt=prompt))
            size = self._latent_size_for(rec)
            if self.test_mode:
                data['noise'] = np.random.default_rng(idx).standard_normal(
                    size).astype(np.float32)
            else:
                data['latents'] = np.zeros(size, np.float32)

        if self.negative_prompt_embed_kwargs is not None:
            data['negative_prompt_embed_kwargs'] = \
                self.negative_prompt_embed_kwargs
        if self.negative_prompt is not None:
            data['negative_prompt_kwargs'] = dict(prompt=self.negative_prompt)
        return data

    def _latent_size_for(self, rec: dict):
        """Latent size from H/W columns (reference image_prompts.py:311-319),
        channel-last with /8 VAE downsampling."""
        if 'height' in rec and 'width' in rec:
            return (rec['height'] // 8, rec['width'] // 8,
                    self.latent_size[-1])
        return self.latent_size
