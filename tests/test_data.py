"""Data pipeline: ImagePrompt cache round-trip, bucketized sampler invariants,
ImageNet fixtures."""

import gzip
import json
import os
import pickle

import numpy as np
import pytest

from arcflow_tpu.data import (BucketizedBatchSampler, ImageNet, ImagePrompt,
                              build_bucketized_loader, collate)


def write_cache(tmp_path, n=8, seq=6, dim=16, with_latents=True):
    """Create a reference-format zstd cache + jsonl datalist."""
    import zstandard as zstd
    import torch
    cache = tmp_path / 'cache'
    cache.mkdir(exist_ok=True)
    names = []
    for i in range(n):
        rec = dict(
            prompt=f'a photo number {i}',
            prompt_embed_kwargs=dict(
                encoder_hidden_states=torch.randn(seq, dim),
                pooled_projections=torch.randn(8)))
        if with_latents:
            rec['latents'] = torch.randn(4, 8, 8)   # torch CHW
        else:
            rec['latent_size'] = (8, 8, 4)
        name = f'rec{i:04d}'
        with open(cache / f'{name}.zst', 'wb') as f:
            with zstd.ZstdCompressor().stream_writer(f) as z:
                pickle.dump(rec, z)
        names.append(name)
    dl = tmp_path / 'datalist.jsonl.gz'
    with gzip.open(dl, 'wt') as f:
        for i, nm in enumerate(names):
            f.write(json.dumps({'name': nm, 'size_idx': i % 2}) + '\n')
    return str(cache), str(dl)


def test_image_prompt_cache_mode(tmp_path):
    cache, dl = write_cache(tmp_path)
    ds = ImagePrompt(cache_dir=cache, datalist_path=dl, pad_seq_len=10)
    assert len(ds) == 8
    item = ds[0]
    assert item['latents'].shape == (8, 8, 4)       # CHW -> HWC
    pek = item['prompt_embed_kwargs']
    assert pek['encoder_hidden_states'].shape == (10, 16)   # padded
    assert pek['encoder_hidden_states_mask'].sum() == 6
    assert (ds.bucket_ids == np.array([0, 1] * 4)).all()


def test_image_prompt_test_mode_deterministic(tmp_path):
    cache, dl = write_cache(tmp_path)
    ds1 = ImagePrompt(cache_dir=cache, datalist_path=dl, test_mode=True)
    ds2 = ImagePrompt(cache_dir=cache, datalist_path=dl, test_mode=True)
    np.testing.assert_array_equal(ds1[3]['noise'], ds2[3]['noise'])
    assert 'latents' not in ds1[3]


def test_image_prompt_slicing(tmp_path):
    cache, dl = write_cache(tmp_path)
    ds = ImagePrompt(cache_dir=cache, datalist_path=dl, start_ind=-4)
    assert len(ds) == 4
    assert ds[0]['name'] == 'a photo number 4'


def test_prompt_mode():
    ds = ImagePrompt(prompts=['a cat', 'a dog'], latent_size=(8, 8, 4))
    item = ds[1]
    assert item['prompt_kwargs']['prompt'] == 'a dog'
    assert item['latents'].shape == (8, 8, 4)


def test_bucketized_sampler_single_bucket_batches():
    bucket_ids = np.array([0] * 10 + [1] * 13 + [2] * 7)
    s = BucketizedBatchSampler(bucket_ids, batch_size=2, num_replicas=2,
                               seed=0)
    batches = s.epoch_batches(0)
    for g in batches:
        assert len(g) == 4   # global batch
        assert len(set(bucket_ids[g])) == 1, 'mixed-bucket batch!'
    # all samples covered at least once
    covered = np.unique(np.concatenate(batches))
    assert len(covered) == 30


def test_bucketized_sampler_rank_split_and_resume():
    bucket_ids = np.array([0] * 16 + [1] * 16)
    s0 = BucketizedBatchSampler(bucket_ids, 4, num_replicas=2, rank=0, seed=1)
    s1 = BucketizedBatchSampler(bucket_ids, 4, num_replicas=2, rank=1, seed=1)
    it0, it1 = s0.iter_batches(), s1.iter_batches()
    b0, b1 = next(it0), next(it1)
    assert len(set(b0) & set(b1)) == 0   # disjoint rank shards
    assert len(set(bucket_ids[np.concatenate([b0, b1])])) == 1
    # resume: iterating 3 then reading == fresh iterator at start_iter=3
    it_ref = s0.iter_batches()
    for _ in range(3):
        next(it_ref)
    ref = next(it_ref)
    resumed = next(s0.iter_batches(start_iter=3))
    np.testing.assert_array_equal(ref, resumed)


def test_bucketized_loader_collates(tmp_path):
    cache, dl = write_cache(tmp_path)
    ds = ImagePrompt(cache_dir=cache, datalist_path=dl, pad_seq_len=8)
    loader = build_bucketized_loader(ds, batch_size=2, seed=0)
    batch = next(loader)
    assert batch['latents'].shape == (2, 8, 8, 4)
    assert batch['prompt_embed_kwargs']['encoder_hidden_states'].shape == \
        (2, 8, 16)


def test_imagenet_test_mode():
    ds = ImageNet(test_mode=True, latent_size=(4, 4, 4), num_classes=10,
                  n_test_samples=100)
    assert len(ds) == 100
    a, b = ds[5], ds[5]
    np.testing.assert_array_equal(a['noise'], b['noise'])
    assert a['label'] == b['label'] and 0 <= a['label'] < 10


def test_imagenet_latents_mode(tmp_path):
    import torch
    d = tmp_path / 'latents'
    d.mkdir()
    for i in range(4):
        torch.save(dict(x=torch.randn(4, 8, 8), y=torch.tensor(i % 2)),
                   d / f'{i:05d}.pth')
    ds = ImageNet(latents_dir=str(d))
    item = ds[2]
    assert item['latents'].shape == (8, 8, 4)
    assert item['label'] == 0


def test_comfy_flux_lora_conversion():
    """Comfy/Kohya BFL lora naming -> diffusers peft naming, with exact
    fused-qkv splitting and alpha folding."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tools'))
    from convert_comfy_flux_lora_to_diffusers import convert_comfy_flux_lora

    d, r = 8, 2
    rng = np.random.default_rng(0)
    state = {
        'lora_unet_double_blocks_0_img_attn_qkv.lora_down.weight':
            rng.standard_normal((r, d)).astype(np.float32),
        'lora_unet_double_blocks_0_img_attn_qkv.lora_up.weight':
            rng.standard_normal((3 * d, r)).astype(np.float32),
        'lora_unet_double_blocks_0_img_attn_qkv.alpha':
            np.float32(4.0),
        'lora_unet_single_blocks_1_linear2.lora_down.weight':
            rng.standard_normal((r, 5 * d)).astype(np.float32),
        'lora_unet_single_blocks_1_linear2.lora_up.weight':
            rng.standard_normal((d, r)).astype(np.float32),
    }
    out = convert_comfy_flux_lora(state, attention_head_dim=d,
                                  num_attention_heads=1)
    down = state['lora_unet_double_blocks_0_img_attn_qkv.lora_down.weight']
    up = state['lora_unet_double_blocks_0_img_attn_qkv.lora_up.weight']
    # A shared, B split per projection, alpha/rank folded (4/2 = 2x)
    np.testing.assert_array_equal(
        out['transformer.transformer_blocks.0.attn.to_q.lora_A.weight'], down)
    np.testing.assert_allclose(
        out['transformer.transformer_blocks.0.attn.to_k.lora_B.weight'],
        up[d:2 * d] * 2.0, rtol=1e-6)
    np.testing.assert_array_equal(
        out['transformer.single_transformer_blocks.1.proj_out.lora_B.weight'],
        state['lora_unet_single_blocks_1_linear2.lora_up.weight'])
    assert len(out) == 8
    with pytest.raises(KeyError):
        convert_comfy_flux_lora({'lora_unet_weird.lora_down.weight':
                                 np.zeros((1, 1))})
