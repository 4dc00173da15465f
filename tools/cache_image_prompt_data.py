#!/usr/bin/env python
"""Build the prompt-embedding cache consumed by ImagePrompt (cache mode).

This is the tool the reference documents but does not ship
(``cache_image_prompt_data.py`` referenced by configs/flux/README.md and
configs/qwen/README.md; SURVEY.md flags it as missing). Output format matches
``ImagePrompt``: one zstd-compressed pickle per prompt holding
``{prompt, prompt_embed_kwargs, latent_size}`` plus a jsonl.gz datalist.

Usage: python tools/cache_image_prompt_data.py --prompts prompts.jsonl \
       --out <cache_dir> --family flux [--height 1024 --width 1024]
"""

import argparse
import gzip
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--prompts', required=True,
                   help='jsonl of prompts (or {"prompt": ...} records)')
    p.add_argument('--out', required=True)
    p.add_argument('--family', choices=['flux', 'qwen'], default='flux')
    p.add_argument('--height', type=int, default=1024)
    p.add_argument('--width', type=int, default=1024)
    p.add_argument('--max-seq-len', type=int, default=512)
    p.add_argument('--batch', type=int, default=16)
    p.add_argument('--clip-path', default=None,
                   help='flux family: CLIP model/tokenizer dir or repo id '
                        '(default: openai/clip-vit-large-patch14)')
    p.add_argument('--t5-path', default=None,
                   help='flux family: T5 model/tokenizer dir or repo id')
    p.add_argument('--pretrained', default=None,
                   help='qwen family: Qwen2.5-VL model dir or repo id')
    args = p.parse_args()

    import zstandard as zstd
    from arcflow_tpu.data import load_datalist
    from arcflow_tpu.utils import setup_jax

    setup_jax()
    if args.family == 'flux':
        from arcflow_tpu.models import PretrainedFluxTextEncoder
        enc_kw = {k: v for k, v in
                  dict(clip_path=args.clip_path, t5_path=args.t5_path).items()
                  if v}
        encoder = PretrainedFluxTextEncoder(
            max_sequence_length=args.max_seq_len, **enc_kw)
    else:
        from arcflow_tpu.models import PretrainedQwenImageTextEncoder
        enc_kw = dict(pretrained=args.pretrained) if args.pretrained else {}
        encoder = PretrainedQwenImageTextEncoder(
            pad_seq_len=args.max_seq_len, **enc_kw)

    records = load_datalist(args.prompts)
    prompts = [r.get('prompt', r.get('name')) for r in records]
    latent_size = (args.height // 8, args.width // 8, 16)

    os.makedirs(args.out, exist_ok=True)
    names = []
    for i in range(0, len(prompts), args.batch):
        chunk = prompts[i:i + args.batch]
        embeds = encoder(chunk)
        embeds = {k: np.asarray(v) for k, v in embeds.items()}
        for j, prompt in enumerate(chunk):
            name = f'{i + j:08d}'
            rec = dict(prompt=prompt,
                       prompt_embed_kwargs={k: v[j] for k, v in embeds.items()},
                       latent_size=latent_size)
            with open(os.path.join(args.out, f'{name}.zst'), 'wb') as f:
                with zstd.ZstdCompressor().stream_writer(f) as z:
                    pickle.dump(rec, z)
            names.append(name)
        print(f'\r{i + len(chunk)}/{len(prompts)}', end='')
    print()
    with gzip.open(os.path.join(args.out, 'datalist.jsonl.gz'), 'wt') as f:
        for n in names:
            f.write(json.dumps({'name': n}) + '\n')


if __name__ == '__main__':
    main()
