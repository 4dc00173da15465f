"""One-call full-pipeline assembly from a diffusers pipeline folder
(VERDICT r04 missing #1): ``Arc*Pipeline.from_pretrained`` on a dir with
``model_index.json`` builds transformer + VAE + text encoder(s) + tokenizers
+ scheduler config, both families, and the CLIs need only ``--model-dir``.

Reference behavior: ``ArcFluxPipeline.from_pretrained('black-forest-labs/
FLUX.1-dev')`` (reference inference_flux.py:5-7) assembles every component
through diffusers' model_index machinery
(lakonlab/pipelines/arcflux_pipeline.py:73 subclasses FluxPipeline).

All components are tiny and fabricated in-test (zero egress): tokenizers
trained here, flax/torch checkpoints saved with random weights, VAE
safetensors in the diffusers key layout from test_vae_convert's synthesizers.
"""

import json
import os
import sys

import numpy as np
import pytest

tf = pytest.importorskip('transformers')

from test_from_pretrained import _write_model_dir   # noqa: E402
from test_vae_convert import (synth_autoencoder_kl_state,   # noqa: E402
                              synth_qwen_vae_state)

PROMPT = 'a photo of a cat sitting on a mat'


# ---------------------------------------------------------------------------
# tiny component fabricators
# ---------------------------------------------------------------------------

@pytest.fixture(scope='module')
def tok_files(tmp_path_factory):
    """Tiny BPE trained in-test (vocab.json/merges.txt + tokenizer.json)."""
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    d = str(tmp_path_factory.mktemp('tok'))
    tok = Tokenizer(models.BPE(unk_token='<unk>'))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    trainer = trainers.BpeTrainer(vocab_size=240, special_tokens=[
        '<unk>', '<pad>', '</s>', '<|startoftext|>', '<|endoftext|>',
        '<|im_start|>', '<|im_end|>'])
    tok.train_from_iterator(
        [PROMPT, 'the quick brown fox jumps over the lazy dog',
         'describe the image system user assistant'] * 5, trainer)
    tok.save(os.path.join(d, 'tokenizer.json'))
    tok.model.save(d)   # vocab.json + merges.txt
    return d


def _write_clip_tokenizer(src, dst):
    os.makedirs(dst, exist_ok=True)
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


def _write_json_tokenizer(src, dst, tokenizer_class, **cfg):
    os.makedirs(dst, exist_ok=True)
    with open(os.path.join(src, 'tokenizer.json')) as fh:
        data = fh.read()
    with open(os.path.join(dst, 'tokenizer.json'), 'w') as fh:
        fh.write(data)
    with open(os.path.join(dst, 'tokenizer_config.json'), 'w') as fh:
        json.dump(dict(tokenizer_class=tokenizer_class, unk_token='<unk>',
                       **cfg), fh)


def _write_vae_folder(d, family):
    """diffusers-format vae/ subfolder (config.json + safetensors) with an
    8x spatial factor so height/width semantics match the real pipelines."""
    from safetensors.numpy import save_file
    os.makedirs(d, exist_ok=True)
    if family == 'flux':
        state = synth_autoencoder_kl_state(
            block_out=(32, 32, 32, 32), layers=1, z=4, quant=False, seed=7)
        cfg = dict(_class_name='AutoencoderKL', latent_channels=4,
                   block_out_channels=[32, 32, 32, 32], layers_per_block=1,
                   scaling_factor=0.5, shift_factor=0.1,
                   use_quant_conv=False, use_post_quant_conv=False)
    else:
        state = synth_qwen_vae_state(base=16, mult=(1, 1, 2, 2), nres=1,
                                     z=4, seed=7)
        cfg = dict(_class_name='AutoencoderKLQwenImage', base_dim=16,
                   z_dim=4, dim_mult=[1, 1, 2, 2], num_res_blocks=1,
                   latents_mean=[0.0] * 4, latents_std=[1.0] * 4)
    with open(os.path.join(d, 'config.json'), 'w') as f:
        json.dump(cfg, f)
    save_file({k: np.ascontiguousarray(v) for k, v in state.items()},
              os.path.join(d, 'diffusion_pytorch_model.safetensors'))


def _write_flux_pipeline_dir(tmp_path, tok_files):
    """Full FLUX pipeline folder: widths match test_from_pretrained's
    TINY_FLUX (joint_attention_dim=64 -> T5 d_model, pooled dim 32 ->
    CLIP hidden)."""
    root = tmp_path / 'flux_pipe'
    root.mkdir()
    # transformer/ — reuse the tiny fabricated transformer folder
    tdir, model, params = _write_model_dir(tmp_path, 'flux')
    os.rename(tdir, root / 'transformer')

    clip_cfg = tf.CLIPTextConfig(vocab_size=240, hidden_size=32,
                                 intermediate_size=64, num_hidden_layers=2,
                                 num_attention_heads=2,
                                 max_position_embeddings=77,
                                 projection_dim=24)
    tf.FlaxCLIPTextModel(clip_cfg, seed=0).save_pretrained(
        str(root / 'text_encoder'))
    from arcflow_tpu.models.text_encoders import _patch_flax_t5_clip
    _patch_flax_t5_clip(tf)
    t5_cfg = tf.T5Config(vocab_size=240, d_model=64, d_kv=8, d_ff=64,
                         num_layers=2, num_heads=2)
    tf.FlaxT5EncoderModel(t5_cfg, seed=0).save_pretrained(
        str(root / 'text_encoder_2'))
    _write_clip_tokenizer(tok_files, str(root / 'tokenizer'))
    _write_json_tokenizer(tok_files, str(root / 'tokenizer_2'),
                          'T5Tokenizer', eos_token='</s>', pad_token='<pad>')
    _write_vae_folder(str(root / 'vae'), 'flux')
    (root / 'scheduler').mkdir()
    with open(root / 'scheduler' / 'scheduler_config.json', 'w') as f:
        json.dump(dict(_class_name='FlowMatchEulerDiscreteScheduler',
                       shift=5.0, use_dynamic_shifting=False), f)
    with open(root / 'model_index.json', 'w') as f:
        json.dump({'_class_name': 'FluxPipeline',
                   '_diffusers_version': '0.35.0',
                   'transformer': ['diffusers', 'FluxTransformer2DModel'],
                   'vae': ['diffusers', 'AutoencoderKL'],
                   'text_encoder': ['transformers', 'CLIPTextModel'],
                   'text_encoder_2': ['transformers', 'T5EncoderModel'],
                   'tokenizer': ['transformers', 'CLIPTokenizer'],
                   'tokenizer_2': ['transformers', 'T5TokenizerFast'],
                   'scheduler': ['diffusers',
                                 'FlowMatchEulerDiscreteScheduler']}, f)
    return str(root)


def _write_qwen_pipeline_dir(tmp_path, tok_files):
    """Full Qwen-Image pipeline folder (text hidden 48 = TINY_QWEN's
    joint_attention_dim; mrope sections sum to head_dim/2)."""
    root = tmp_path / 'qwen_pipe'
    root.mkdir()
    tdir, model, params = _write_model_dir(tmp_path, 'qwen')
    os.rename(tdir, root / 'transformer')

    cfg = tf.Qwen2_5_VLConfig(
        text_config=dict(vocab_size=240, hidden_size=48,
                         intermediate_size=96, num_hidden_layers=2,
                         num_attention_heads=2, num_key_value_heads=2,
                         max_position_embeddings=256,
                         rope_scaling=dict(type='mrope',
                                           mrope_section=[2, 4, 6])),
        vision_config=dict(depth=2, hidden_size=32, out_hidden_size=48,
                           intermediate_size=64, num_heads=2, patch_size=14,
                           spatial_merge_size=2, temporal_patch_size=2))
    tf.Qwen2_5_VLForConditionalGeneration(cfg).save_pretrained(
        str(root / 'text_encoder'))
    _write_json_tokenizer(tok_files, str(root / 'tokenizer'),
                          'Qwen2Tokenizer', eos_token='<|im_end|>',
                          pad_token='<pad>')
    _write_vae_folder(str(root / 'vae'), 'qwen')
    (root / 'scheduler').mkdir()
    with open(root / 'scheduler' / 'scheduler_config.json', 'w') as f:
        json.dump(dict(_class_name='FlowMatchEulerDiscreteScheduler',
                       shift=3.1), f)
    with open(root / 'model_index.json', 'w') as f:
        json.dump({'_class_name': 'QwenImagePipeline',
                   'transformer': ['diffusers',
                                   'QwenImageTransformer2DModel'],
                   'vae': ['diffusers', 'AutoencoderKLQwenImage'],
                   'text_encoder': ['transformers',
                                    'Qwen2_5_VLForConditionalGeneration'],
                   'tokenizer': ['transformers', 'Qwen2Tokenizer'],
                   'scheduler': ['diffusers',
                                 'FlowMatchEulerDiscreteScheduler']}, f)
    return str(root)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_flux_full_pipeline_folder(tmp_path, tok_files):
    """model_index.json -> transformer + VAE + CLIP/T5 towers + scheduler
    shift, then prompt -> image in one pipe() call."""
    from arcflow_tpu.pipelines import ArcFluxPipeline
    root = _write_flux_pipeline_dir(tmp_path, tok_files)
    pipe = ArcFluxPipeline.from_pretrained(
        root, nfe=2, text_encoder_kwargs=dict(max_sequence_length=16,
                                              dtype='float32'))
    assert pipe.vae is not None and pipe.vae_params is not None
    assert pipe.text_encoder is not None
    # scheduler config rode in (shift=5.0, not the 3.2 default)
    assert pipe.diffusion.timestep_sampler.shift == 5.0
    out = pipe(prompt=[PROMPT], height=64, width=64, seed=1)
    imgs = np.asarray(out['images'])
    assert imgs.shape == (1, 64, 64, 3)
    assert np.isfinite(imgs).all()
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0
    # the forward-only serving flag must not leak past the sampling call
    # (a later training trace in this process must keep the flash kernel)
    from arcflow_tpu.utils.quantize import serving_active
    assert not serving_active()


def test_flux_explicit_kwargs_beat_folder(tmp_path, tok_files):
    """Constructor kwargs win over the folder's scheduler/vae entries."""
    from arcflow_tpu.pipelines import ArcFluxPipeline
    root = _write_flux_pipeline_dir(tmp_path, tok_files)
    pipe = ArcFluxPipeline.from_pretrained(
        root, nfe=2, shift=2.0, vae=None,
        text_encoder_kwargs=dict(max_sequence_length=16, dtype='float32'))
    assert pipe.diffusion.timestep_sampler.shift == 2.0
    assert pipe.vae is None
    out = pipe(prompt=[PROMPT], height=64, width=64, seed=1)
    assert np.isfinite(np.asarray(out['latents'])).all()


def test_qwen_full_pipeline_folder(tmp_path, tok_files):
    """Qwen family: the index's component classes pick the Wan VAE and the
    Qwen2.5-VL text tower (flax backend), masked attention end-to-end."""
    from arcflow_tpu.pipelines import ArcQwenImagePipeline
    root = _write_qwen_pipeline_dir(tmp_path, tok_files)
    pipe = ArcQwenImagePipeline.from_pretrained(
        root, nfe=2, text_encoder_kwargs=dict(pad_seq_len=24,
                                              dtype='float32'))
    assert pipe.vae is not None
    assert type(pipe.vae).__name__ == 'PretrainedVAEQwenImage'
    assert pipe.diffusion.timestep_sampler.shift == 3.1
    out = pipe(prompt=[PROMPT], height=64, width=64, seed=1)
    imgs = np.asarray(out['images'])
    assert imgs.shape == (1, 64, 64, 3)
    assert np.isfinite(imgs).all()


def test_inference_flux_cli_full_folder(tmp_path, tok_files, monkeypatch):
    """Done-criterion from VERDICT r04 #4: ``inference_flux.py --model-dir
    <full_dir>`` produces an image with no other model flags."""
    import importlib
    root = _write_flux_pipeline_dir(tmp_path, tok_files)
    out = str(tmp_path / 'img.png')
    mod = importlib.import_module('inference_flux')
    monkeypatch.setattr(sys, 'argv', [
        'inference_flux.py', '--model-dir', root, '--prompt', PROMPT,
        '--height', '64', '--width', '64', '--out', out])
    mod.main()
    from PIL import Image
    img = Image.open(out)
    assert img.size == (64, 64)


def test_remote_full_pipeline_uri_raises_helpfully(tmp_path):
    """A hub URI pointing at a full pipeline repo (model_index.json) must
    fail with guidance, not silently load it as a transformer folder."""
    from arcflow_tpu.pipelines import ArcFluxPipeline
    from arcflow_tpu.utils import io_utils
    from test_from_pretrained import _FakeHubBackend
    d = tmp_path / 'repo'
    d.mkdir()
    with open(d / 'model_index.json', 'w') as f:
        json.dump({'_class_name': 'FluxPipeline'}, f)
    io_utils.register_backend('huggingface', _FakeHubBackend(str(d)))
    try:
        with pytest.raises(NotImplementedError, match='model_index'):
            ArcFluxPipeline.from_pretrained('huggingface://org/repo')
    finally:
        io_utils.register_backend('huggingface', io_utils.HuggingFaceBackend)
        io_utils._BACKENDS.pop('huggingface', None)
