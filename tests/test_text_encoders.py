"""Text-encoder wrappers driven end-to-end on tiny, locally fabricated
checkpoints (zero egress: tokenizers trained in-test, random tiny weights).

Covers the from_pretrained plumbing and the output contracts the DiTs
consume (reference ``lakonlab/models/architecture/diffusers/pretrained.py:
153-281``): FLUX (CLIP pooled + T5 sequence), SD3 (dual-CLIP + T5 layout),
Qwen-Image (VL hidden states + mask, template drop, pad_seq_len).
"""

import json
import os

import numpy as np
import pytest

tf = pytest.importorskip('transformers')

PROMPTS = ['a photo of a cat sitting on a mat',
           'an astronaut riding a horse on the moon']


@pytest.fixture(scope='module')
def tok_dir(tmp_path_factory):
    """Tiny BPE trained in-test; saves tokenizer.json + vocab/merges."""
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    d = str(tmp_path_factory.mktemp('tok'))
    tok = Tokenizer(models.BPE(unk_token='<unk>'))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    trainer = trainers.BpeTrainer(vocab_size=240, special_tokens=[
        '<unk>', '<pad>', '</s>', '<|startoftext|>', '<|endoftext|>',
        '<|im_start|>', '<|im_end|>'])
    tok.train_from_iterator(
        PROMPTS + ['the quick brown fox jumps over the lazy dog',
                   'describe the image system user assistant'] * 5, trainer)
    tok.save(os.path.join(d, 'tokenizer.json'))
    tok.model.save(d)   # vocab.json + merges.txt
    return d


def _write_clip_tokenizer(src, dst):
    for f in ('vocab.json', 'merges.txt'):
        with open(os.path.join(src, f)) as fh:
            data = fh.read()
        with open(os.path.join(dst, f), 'w') as fh:
            fh.write(data)
    with open(os.path.join(dst, 'tokenizer_config.json'), 'w') as fh:
        json.dump(dict(tokenizer_class='CLIPTokenizer',
                       bos_token='<|startoftext|>',
                       eos_token='<|endoftext|>', unk_token='<unk>',
                       pad_token='<|endoftext|>', model_max_length=77), fh)


@pytest.fixture(scope='module')
def clip_dir(tmp_path_factory, tok_dir):
    d = str(tmp_path_factory.mktemp('clip'))
    cfg = tf.CLIPTextConfig(vocab_size=240, hidden_size=32,
                            intermediate_size=64, num_hidden_layers=2,
                            num_attention_heads=2,
                            max_position_embeddings=77, projection_dim=24)
    tf.FlaxCLIPTextModelWithProjection(cfg, seed=0).save_pretrained(d)
    _write_clip_tokenizer(tok_dir, d)
    return d


@pytest.fixture(scope='module')
def t5_dir(tmp_path_factory, tok_dir):
    # FlaxT5 init traces the forward, which still spells
    # jnp.clip(a_min/a_max) — patch before building the tiny checkpoint
    from arcflow_tpu.models.text_encoders import _patch_flax_t5_clip
    _patch_flax_t5_clip(tf)
    d = str(tmp_path_factory.mktemp('t5'))
    # d_model wider than the dual-CLIP concat (2 x 32), matching the real
    # SD3 relationship (t5 4096 > clip 2048) the pad-to-t5-width layout needs
    cfg = tf.T5Config(vocab_size=240, d_model=80, d_kv=8, d_ff=64,
                      num_layers=2, num_heads=2)
    tf.FlaxT5EncoderModel(cfg, seed=0).save_pretrained(d)
    with open(os.path.join(tok_dir, 'tokenizer.json')) as fh:
        data = fh.read()
    with open(os.path.join(d, 'tokenizer.json'), 'w') as fh:
        fh.write(data)
    with open(os.path.join(d, 'tokenizer_config.json'), 'w') as fh:
        json.dump(dict(tokenizer_class='T5Tokenizer', eos_token='</s>',
                       unk_token='<unk>', pad_token='<pad>'), fh)
    return d


def test_flux_text_encoder_contract(clip_dir, t5_dir):
    import warnings
    from arcflow_tpu.models import PretrainedFluxTextEncoder
    enc = PretrainedFluxTextEncoder(clip_path=clip_dir, t5_path=t5_dir,
                                    max_sequence_length=16, dtype='float32')
    with warnings.catch_warnings():
        # the _patch_flax_t5_clip shim must silence transformers'
        # deprecated jnp.clip(a_max=) call (would break on a jax upgrade)
        warnings.simplefilter('error', DeprecationWarning)
        out = enc(PROMPTS)
    assert set(out) == {'encoder_hidden_states', 'pooled_projections'}
    assert out['encoder_hidden_states'].shape == (2, 16, 80)   # (B, L, t5_d)
    assert out['pooled_projections'].shape[0] == 2
    assert np.isfinite(np.asarray(out['encoder_hidden_states'])).all()
    assert np.isfinite(np.asarray(out['pooled_projections'])).all()


def test_sd3_text_encoder_layout(clip_dir, t5_dir):
    """SD3: hidden = concat_seq(pad_feat(clip_l+clip_g), t5); pooled =
    concat(clip projections) — reference pretrained.py:242-281."""
    from arcflow_tpu.models import PretrainedStableDiffusion3TextEncoder
    enc = PretrainedStableDiffusion3TextEncoder(
        clip_l_path=clip_dir, clip_g_path=clip_dir, t5_path=t5_dir,
        max_sequence_length=16, dtype='float32')
    out = enc(PROMPTS)
    # clip seq (77) + t5 seq (16); clip features (32+32) padded to t5 width
    h = np.asarray(out['encoder_hidden_states'])
    assert h.shape == (2, 77 + 16, 80)
    # the padded clip rows are zero beyond the concat width
    assert np.abs(h[:, :77, 64:]).max() == 0.0
    p = np.asarray(out['pooled_projections'])
    assert p.shape == (2, 48)    # 2 x projection_dim(24)
    assert np.isfinite(h).all() and np.isfinite(p).all()


@pytest.fixture(scope='module')
def qwen_dir(tmp_path_factory, tok_dir):
    import torch
    d = str(tmp_path_factory.mktemp('qwenvl'))
    cfg = tf.Qwen2_5_VLConfig(
        text_config=dict(vocab_size=240, hidden_size=32,
                         intermediate_size=64, num_hidden_layers=2,
                         num_attention_heads=2, num_key_value_heads=2,
                         max_position_embeddings=256,
                         rope_scaling=dict(type='mrope',
                                           mrope_section=[2, 2, 4])),
        vision_config=dict(depth=2, hidden_size=32, out_hidden_size=32,
                           intermediate_size=64, num_heads=2, patch_size=14,
                           spatial_merge_size=2, temporal_patch_size=2))
    tf.Qwen2_5_VLForConditionalGeneration(cfg).save_pretrained(d)
    with open(os.path.join(tok_dir, 'tokenizer.json')) as fh:
        data = fh.read()
    with open(os.path.join(d, 'tokenizer.json'), 'w') as fh:
        fh.write(data)
    with open(os.path.join(d, 'tokenizer_config.json'), 'w') as fh:
        json.dump(dict(tokenizer_class='Qwen2Tokenizer', unk_token='<unk>',
                       eos_token='<|im_end|>', pad_token='<pad>'), fh)
    return d


def test_qwen_text_encoder_contract(qwen_dir):
    """VL class resolution + template drop + pad_seq_len + mask contract
    (reference pretrained.py:194-238), torch backend."""
    from arcflow_tpu.models import PretrainedQwenImageTextEncoder
    enc = PretrainedQwenImageTextEncoder(pretrained=qwen_dir,
                                         pad_seq_len=48, dtype='float32',
                                         backend='torch')
    out = enc(PROMPTS)
    assert set(out) == {'encoder_hidden_states', 'encoder_hidden_states_mask'}
    h = np.asarray(out['encoder_hidden_states'])
    m = np.asarray(out['encoder_hidden_states_mask'])
    assert h.shape == (2, 48, 32) and m.shape == (2, 48)
    assert np.isfinite(h).all()
    assert set(np.unique(m)) <= {0, 1}
    # the VL class (not the causal-LM fallback) must have loaded
    assert type(enc.model).__name__ == 'Qwen2_5_VLForConditionalGeneration'


def test_qwen_flax_backend_matches_torch(qwen_dir):
    """The native flax Qwen2.5 decoder (default backend) must reproduce the
    torch VL model's hidden states at every valid token position."""
    from arcflow_tpu.models import PretrainedQwenImageTextEncoder
    kw = dict(pretrained=qwen_dir, pad_seq_len=48, dtype='float32')
    out_t = PretrainedQwenImageTextEncoder(backend='torch', **kw)(PROMPTS)
    enc_f = PretrainedQwenImageTextEncoder(**kw)   # flax is the default
    assert enc_f.backend == 'flax'
    out_f = enc_f(PROMPTS)

    m_t = np.asarray(out_t['encoder_hidden_states_mask'])
    m_f = np.asarray(out_f['encoder_hidden_states_mask'])
    np.testing.assert_array_equal(m_t, m_f)
    h_t = np.asarray(out_t['encoder_hidden_states'])
    h_f = np.asarray(out_f['encoder_hidden_states'])
    assert h_t.shape == h_f.shape == (2, 48, 32)
    valid = m_t.astype(bool)
    err = np.abs(h_t - h_f)[valid]
    scale = np.abs(h_t[valid]).mean() + 1e-6
    assert err.max() / scale < 5e-2, (err.max(), scale)
    np.testing.assert_allclose(h_f[valid], h_t[valid], atol=1e-3, rtol=1e-2)
