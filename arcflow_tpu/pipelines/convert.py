"""Weight conversion: diffusers/torch safetensors <-> arcflow_tpu flax trees.

Equivalent capability to the reference's pretrained-loading machinery
(``arcflux.py:318-357``: HF sharded-index checkpoints, proj_out K-way
expansion with seeded bias noise, LoRA key handling) plus the reverse
direction used by the exporter (``export_arcflow_to_diffusers.py``).

The flax trees stack transformer blocks along axis 0 (nn.scan layout), so
conversion gathers per-block torch keys into one stacked array and vice
versa. Linear weights transpose (out,in) -> (in,out).
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.pytree import flatten, unflatten

# torch-side name -> flax-side name, per FLUX block kind
_FLUX_JOINT_MAP = {
    'norm1.linear': 'img_norm1.modulation',
    'norm1_context.linear': 'txt_norm1.modulation',
    'attn.to_q': 'attn.img_q',
    'attn.to_k': 'attn.img_k',
    'attn.to_v': 'attn.img_v',
    'attn.to_out.0': 'attn.img_out',
    'attn.add_q_proj': 'attn.txt_q',
    'attn.add_k_proj': 'attn.txt_k',
    'attn.add_v_proj': 'attn.txt_v',
    'attn.to_add_out': 'attn.txt_out',
    'attn.norm_q': 'attn.img_q_norm',
    'attn.norm_k': 'attn.img_k_norm',
    'attn.norm_added_q': 'attn.txt_q_norm',
    'attn.norm_added_k': 'attn.txt_k_norm',
    'ff.net.0.proj': 'ff_img.in_proj',
    'ff.net.2': 'ff_img.out_proj',
    'ff_context.net.0.proj': 'ff_txt.in_proj',
    'ff_context.net.2': 'ff_txt.out_proj',
}
_FLUX_SINGLE_MAP = {
    'norm.linear': 'norm.modulation',
    'attn.to_q': 'attn.q',
    'attn.to_k': 'attn.k',
    'attn.to_v': 'attn.v',
    'attn.norm_q': 'attn.q_norm',
    'attn.norm_k': 'attn.k_norm',
    'proj_mlp': 'proj_mlp',
    'proj_out': 'proj_out',
}
_FLUX_TOP_MAP = {
    'x_embedder': 'x_embedder',
    'context_embedder': 'context_embedder',
    'time_text_embed.timestep_embedder.linear_1':
        'time_text_embed.timestep_embedder.linear1',
    'time_text_embed.timestep_embedder.linear_2':
        'time_text_embed.timestep_embedder.linear2',
    'time_text_embed.guidance_embedder.linear_1':
        'time_text_embed.guidance_embedder.linear1',
    'time_text_embed.guidance_embedder.linear_2':
        'time_text_embed.guidance_embedder.linear2',
    'time_text_embed.text_embedder.linear_1':
        'time_text_embed.text_embedder.linear1',
    'time_text_embed.text_embedder.linear_2':
        'time_text_embed.text_embedder.linear2',
    'norm_out.linear': 'norm_out.modulation',
    'proj_out': 'proj_out',
}
# Qwen-Image mapping (diffusers transformer_qwenimage naming)
_QWEN_BLOCK_MAP = {
    'img_mod.1': 'img_norm1.modulation',
    'txt_mod.1': 'txt_norm1.modulation',
    'attn.to_q': 'attn.img_q',
    'attn.to_k': 'attn.img_k',
    'attn.to_v': 'attn.img_v',
    'attn.to_out.0': 'attn.img_out',
    'attn.add_q_proj': 'attn.txt_q',
    'attn.add_k_proj': 'attn.txt_k',
    'attn.add_v_proj': 'attn.txt_v',
    'attn.to_add_out': 'attn.txt_out',
    'attn.norm_q': 'attn.img_q_norm',
    'attn.norm_k': 'attn.img_k_norm',
    'attn.norm_added_q': 'attn.txt_q_norm',
    'attn.norm_added_k': 'attn.txt_k_norm',
    'img_mlp.net.0.proj': 'ff_img.in_proj',
    'img_mlp.net.2': 'ff_img.out_proj',
    'txt_mlp.net.0.proj': 'ff_txt.in_proj',
    'txt_mlp.net.2': 'ff_txt.out_proj',
}
_QWEN_TOP_MAP = {
    'img_in': 'img_in',
    'txt_in': 'txt_in',
    'txt_norm': 'txt_norm',
    'time_text_embed.timestep_embedder.linear_1':
        'timestep_embedder.linear1',
    'time_text_embed.timestep_embedder.linear_2':
        'timestep_embedder.linear2',
    'norm_out.linear': 'norm_out.modulation',
    'proj_out': 'proj_out',
}


def _leaf_name(torch_key: str) -> Tuple[str, str]:
    """Split '...module.weight' -> (module_path, torch_leaf)."""
    path, _, leaf = torch_key.rpartition('.')
    return path, leaf


def _convert_leaf(torch_leaf: str, value: np.ndarray,
                  is_norm: bool) -> Tuple[str, np.ndarray]:
    if torch_leaf == 'weight':
        if is_norm:
            return 'scale', value
        if value.ndim == 2:
            return 'kernel', value.T
        return 'kernel', value
    if torch_leaf == 'bias':
        return 'bias', value
    # peft LoRA leaves: lora_A.weight (r, in) -> lora_a (in, r);
    # lora_B.weight (out, r) -> lora_b (r, out). Both are plain transposes.
    if torch_leaf == 'lora_A.weight':
        return 'lora_a', value.T
    if torch_leaf == 'lora_B.weight':
        return 'lora_b', value.T
    raise KeyError(torch_leaf)


_TORCH_LEAVES = ('weight', 'bias', 'lora_A.weight', 'lora_B.weight')
_FLAX_LEAVES = ('kernel', 'bias', 'scale', 'lora_a', 'lora_b')
_FLAX_TO_TORCH_LEAF = {'kernel': 'weight', 'scale': 'weight', 'bias': 'bias',
                       'lora_a': 'lora_A.weight', 'lora_b': 'lora_B.weight'}


def _permute_packed(arr: np.ndarray, axis: int, p2: int, groups: int = 1,
                    to_flax: bool = True) -> np.ndarray:
    """Reorder a packed-token feature axis between layouts.

    diffusers/reference FLUX packs latent tokens with feature layout
    (c, p, p) — ``_pack_latents`` / reference arcflux.py patchify
    ``permute(0, 1, 3, 5, 2, 4)`` — while this repo's patchify
    (models/flux.py:239) uses (p, p, c). Weights touching the packed token
    dim (x_embedder input, proj_out / proj_out_means output) must be
    reordered or real checkpoints load scrambled. ``groups`` handles the
    leading K mixture components of proj_out_means.
    """
    arr = np.asarray(arr)
    n = arr.shape[axis]
    if p2 == 1 or n % (groups * p2) != 0:
        return arr
    c = n // (groups * p2)
    arr = np.moveaxis(arr, axis, 0)
    rest = arr.shape[1:]
    # torch->flax: split as (g, c, p2), swap to (g, p2, c); the reverse
    # direction splits as (g, p2, c) and swaps back — the same transpose.
    inner = (groups, c, p2) if to_flax else (groups, p2, c)
    arr = arr.reshape(inner + rest)
    arr = arr.transpose((0, 2, 1) + tuple(range(3, arr.ndim)))
    arr = arr.reshape((n,) + rest)
    return np.moveaxis(arr, 0, axis)


# top-level keys whose weights touch the packed-token feature dim:
# name -> ('in'|'out', uses K groups)
_PACKED_TOUCHING = {
    'x_embedder': ('in', False),       # flux packed-latent input
    'img_in': ('in', False),           # qwen packed-latent input
    'proj_out': ('out', False),        # teacher packed-latent output
    'proj_out_means': ('out', True),   # arc means head: (K, c, p2) layout
}


# arc head names pass through unchanged (reference export keeps them);
# logweights/loggamma have (K, p2) feature layout on both sides.
_ARC_HEAD_MAP = {
    'proj_out_means': 'proj_out_means',
    'proj_out_logweights': 'proj_out_logweights',
    'proj_out_loggamma': 'proj_out_loggamma',
}


def load_safetensors_state(path: str) -> Dict[str, np.ndarray]:
    """Load a .safetensors file, a sharded index.json, or a directory —
    local or remote (``huggingface://org/repo/path`` resolves through the
    hub cache incl. sharded indexes, the reference's HF checkpoint scheme,
    runner/checkpoint.py:241-278)."""
    from safetensors import safe_open

    def load_one(p):
        out = {}
        with safe_open(p, framework='np') as f:
            for k in f.keys():
                out[k] = f.get_tensor(k)
        return out

    from ..utils.io_utils import get_file_backend, uri_scheme
    if uri_scheme(path) != 'local':
        backend = get_file_backend(path)
        if not path.endswith(('.safetensors', '.index.json')):
            # remote model *folder* (hub repo): probe the diffusers-standard
            # filenames, sharded index first (reference arcflow_loader.py
            # downloads the repo and resolves the index the same way)
            for cand in ('diffusion_pytorch_model.safetensors.index.json',
                         'model.safetensors.index.json',
                         'diffusion_pytorch_model.safetensors',
                         'model.safetensors'):
                c = backend.join_path(path, cand)
                if backend.exists(c):
                    path = c
                    break
            else:
                raise FileNotFoundError(
                    f'no safetensors checkpoint found under {path}')
        if not hasattr(backend, 'local_path'):
            raise ValueError(f'backend for {path} cannot resolve local files')
        local = backend.local_path(path)
        if path.endswith('.index.json'):
            with open(local) as f:
                index = json.load(f)
            base = path.rsplit('/', 1)[0]
            state = {}
            for shard in sorted(set(index['weight_map'].values())):
                state.update(load_one(
                    backend.local_path(f'{base}/{shard}')))
            return state
        return load_one(local)

    if os.path.isdir(path):
        idx = [f for f in os.listdir(path) if f.endswith('.index.json')]
        if idx:
            return load_safetensors_state(os.path.join(path, idx[0]))
        state = {}
        for f in sorted(os.listdir(path)):
            if f.endswith('.safetensors'):
                state.update(load_one(os.path.join(path, f)))
        return state
    if path.endswith('.index.json'):
        with open(path) as f:
            index = json.load(f)
        base = os.path.dirname(path)
        state = {}
        for shard in sorted(set(index['weight_map'].values())):
            state.update(load_one(os.path.join(base, shard)))
        return state
    return load_one(path)


def _family_maps(family: str):
    if family == 'flux':
        block_specs = [
            ('transformer_blocks', 'joint_blocks', _FLUX_JOINT_MAP),
            ('single_transformer_blocks', 'single_blocks', _FLUX_SINGLE_MAP)]
        top_map = dict(_FLUX_TOP_MAP, **_ARC_HEAD_MAP)
    else:
        block_specs = [('transformer_blocks', 'transformer_blocks',
                        _QWEN_BLOCK_MAP)]
        top_map = dict(_QWEN_TOP_MAP, **_ARC_HEAD_MAP)
    return block_specs, top_map


def _is_norm_path(torch_path: str) -> bool:
    return ('norm_q' in torch_path or 'norm_k' in torch_path
            or 'norm_added' in torch_path
            or torch_path.endswith('txt_norm'))


def torch_flux_to_flax(state: Dict[str, np.ndarray],
                       num_layers: int = 19, num_single_layers: int = 38,
                       family: str = 'flux', dtype=np.float32,
                       patch_size: int = 2,
                       num_gaussians: Optional[int] = None
                       ) -> Tuple[Dict, Dict]:
    """Convert a diffusers FLUX/Qwen transformer state dict to the stacked
    flax tree. Returns (flax_tree, unused_torch_keys).

    Handles plain weights, peft LoRA leaves (``lora_A.weight`` per-block ->
    stacked ``lora_a``), and the packed-token feature reorder between the
    reference's (c, p, p) layout and this repo's (p, p, c) — see
    ``_permute_packed``.
    """
    block_specs, top_map = _family_maps(family)
    n_blocks_of = {'transformer_blocks': num_layers,
                   'single_transformer_blocks': num_single_layers} \
        if family == 'flux' else {'transformer_blocks': num_layers}

    p2 = patch_size * patch_size
    if num_gaussians is None and 'proj_out_logweights.bias' in state:
        num_gaussians = state['proj_out_logweights.bias'].shape[0] // p2
    if num_gaussians is None and 'proj_out_logweights.weight' in state:
        num_gaussians = state['proj_out_logweights.weight'].shape[0] // p2

    flat: Dict[str, np.ndarray] = {}
    used = set()

    # stacked blocks
    for torch_prefix, flax_prefix, mapping in block_specs:
        n_blocks = n_blocks_of[torch_prefix]
        for t_sub, f_sub in mapping.items():
            for leaf in _TORCH_LEAVES:
                keys = [f'{torch_prefix}.{i}.{t_sub}.{leaf}'
                        for i in range(n_blocks)]
                present = [k in state for k in keys]
                if not any(present):
                    continue
                if not all(present):
                    raise KeyError(
                        f'{torch_prefix}.*.{t_sub}.{leaf}: present for only '
                        f'{sum(present)}/{n_blocks} blocks — cannot stack')
                used.update(keys)
                f_leaf = _convert_leaf(leaf, state[keys[0]],
                                       _is_norm_path(t_sub))[0]
                stacked = np.stack(
                    [_convert_leaf(leaf, state[k], _is_norm_path(t_sub))[1]
                     for k in keys]).astype(dtype)
                flat[f'{flax_prefix}.{f_sub}.{f_leaf}'] = stacked

    # top-level
    for t_sub, f_sub in top_map.items():
        for leaf in _TORCH_LEAVES:
            key = f'{t_sub}.{leaf}'
            if key not in state:
                continue
            used.add(key)
            f_leaf, v = _convert_leaf(leaf, state[key], _is_norm_path(t_sub))
            if t_sub in _PACKED_TOUCHING and f_leaf in ('kernel', 'bias'):
                io, has_k = _PACKED_TOUCHING[t_sub]
                groups = (num_gaussians or 1) if has_k else 1
                if f_leaf == 'kernel':
                    axis = 0 if io == 'in' else v.ndim - 1
                    v = _permute_packed(v, axis, p2, groups, to_flax=True)
                elif io == 'out':   # bias only exists on the output side
                    v = _permute_packed(v, 0, p2, groups, to_flax=True)
            flat[f'{f_sub}.{f_leaf}'] = np.asarray(v).astype(dtype)

    unused = {k: v for k, v in state.items() if k not in used}
    return unflatten(flat), unused


def expand_proj_out_to_arc_heads(flax_tree: Dict, num_gaussians: int,
                                 patch_size: int = 2,
                                 rng: Optional[jax.Array] = None,
                                 noise_scale: float = 0.05) -> Dict:
    """Initialize the ArcFlow student's means head from the teacher's
    proj_out: K-way weight expansion + seeded bias noise shared across patch
    cells (reference arcflux.py:327-341). Returns a tree with
    ``proj_out_means`` replacing ``proj_out``."""
    flat = flatten(flax_tree)
    if 'proj_out.kernel' not in flat:
        return flax_tree
    k = num_gaussians
    p2 = patch_size * patch_size
    kernel = flat.pop('proj_out.kernel')          # (D, p2*C)
    bias = flat.pop('proj_out.bias')              # (p2*C,)
    out_ch = kernel.shape[1]
    c = out_ch // p2
    # my head layout is (K, p2, C) flattened on the output dim; the teacher's
    # is (p2, C) — tile K times
    kernel_k = np.tile(np.asarray(kernel).reshape(-1, 1, p2, c),
                       (1, k, 1, 1)).reshape(kernel.shape[0], k * p2 * c)
    bias_k = np.tile(np.asarray(bias).reshape(1, p2, c),
                     (k, 1, 1))
    if rng is None:
        rng = jax.random.PRNGKey(0)
    noise = noise_scale * np.asarray(
        jax.random.normal(rng, (k, c), jnp.float32))
    bias_k = (bias_k + noise[:, None, :]).reshape(k * p2 * c)
    flat['proj_out_means.kernel'] = kernel_k.astype(kernel.dtype)
    flat['proj_out_means.bias'] = bias_k.astype(bias.dtype)
    return unflatten(flat)


def flax_to_torch_flux(flax_tree: Dict, family: str = 'flux',
                       patch_size: int = 2,
                       num_gaussians: Optional[int] = None
                       ) -> Dict[str, np.ndarray]:
    """Reverse conversion for export (stacked flax -> per-block torch keys),
    producing diffusers/reference-compatible naming *and* the reference's
    (c, p, p) packed-feature layout (see ``_permute_packed``)."""
    block_specs, top_map = _family_maps(family)
    flat = flatten(flax_tree)
    out: Dict[str, np.ndarray] = {}
    handled = set()

    p2 = patch_size * patch_size
    if num_gaussians is None and 'proj_out_logweights.bias' in flat:
        num_gaussians = np.asarray(
            flat['proj_out_logweights.bias']).shape[-1] // p2
    if num_gaussians is None and 'proj_out_logweights.kernel' in flat:
        num_gaussians = np.asarray(
            flat['proj_out_logweights.kernel']).shape[-1] // p2

    def deconvert(f_leaf, v):
        v = np.asarray(v)
        t_leaf = _FLAX_TO_TORCH_LEAF[f_leaf]
        if f_leaf in ('kernel', 'lora_a', 'lora_b') and v.ndim == 2:
            return t_leaf, v.T
        return t_leaf, v

    for torch_prefix, flax_prefix, mapping in block_specs:
        for t_sub, f_sub in mapping.items():
            for f_leaf in _FLAX_LEAVES:
                key = f'{flax_prefix}.{f_sub}.{f_leaf}'
                if key not in flat:
                    continue
                handled.add(key)
                stacked = np.asarray(flat[key])
                for i in range(stacked.shape[0]):
                    t_leaf, v = deconvert(f_leaf, stacked[i])
                    out[f'{torch_prefix}.{i}.{t_sub}.{t_leaf}'] = v
    for t_sub, f_sub in top_map.items():
        for f_leaf in _FLAX_LEAVES:
            key = f'{f_sub}.{f_leaf}'
            if key not in flat:
                continue
            handled.add(key)
            v = np.asarray(flat[key])
            if t_sub in _PACKED_TOUCHING and f_leaf in ('kernel', 'bias'):
                io, has_k = _PACKED_TOUCHING[t_sub]
                groups = (num_gaussians or 1) if has_k else 1
                if f_leaf == 'kernel':
                    axis = 0 if io == 'in' else v.ndim - 1
                    v = _permute_packed(v, axis, p2, groups, to_flax=False)
                elif io == 'out':   # bias only touches packed features on
                    v = _permute_packed(v, 0, p2, groups,   # the output side
                                        to_flax=False)
            t_leaf, v = deconvert(f_leaf, v)
            out[f'{t_sub}.{t_leaf}'] = v
    # anything unmapped passes through with canonical leaf names
    for key, v in flat.items():
        if key in handled:
            continue
        out[key.replace('.kernel', '.weight')] = (
            np.asarray(v).swapaxes(-1, -2) if key.endswith('.kernel')
            and np.asarray(v).ndim >= 2 else np.asarray(v))
    return out


# ---------------------------------------------------------------------------
# VAE converters (diffusers torch -> flax NHWC)
# ---------------------------------------------------------------------------

# diffusers AutoencoderKL (SD / FLUX VAE) -> models/vae.py naming
_VAE_NAME_RULES = [
    (r'^(encoder|decoder)\.down_blocks\.(\d+)\.resnets\.(\d+)\.',
     r'\1.down_\2_res_\3.'),
    (r'^(encoder|decoder)\.up_blocks\.(\d+)\.resnets\.(\d+)\.',
     r'\1.up_\2_res_\3.'),
    (r'^(encoder|decoder)\.down_blocks\.(\d+)\.downsamplers\.0\.',
     r'\1.down_\2_ds.'),
    (r'^(encoder|decoder)\.up_blocks\.(\d+)\.upsamplers\.0\.',
     r'\1.up_\2_us.'),
    (r'\.mid_block\.resnets\.0\.', '.mid_res_1.'),
    (r'\.mid_block\.resnets\.1\.', '.mid_res_2.'),
    (r'\.mid_block\.attentions\.0\.', '.mid_attn.'),
    (r'\.to_out\.0\.', '.to_out.'),
]

# diffusers AutoencoderKLQwenImage / AutoencoderKLWan -> models/qwen_vae.py
_QWEN_VAE_NAME_RULES = [
    (r'^encoder\.down_blocks\.(\d+)\.', r'encoder.down_blocks_\1.'),
    (r'^decoder\.up_blocks\.(\d+)\.resnets\.(\d+)\.',
     r'decoder.up_blocks_\1.resnets_\2.'),
    (r'^decoder\.up_blocks\.(\d+)\.upsamplers\.0\.',
     r'decoder.up_blocks_\1.upsampler.'),
    (r'\.mid_block\.resnets\.(\d+)\.', r'.mid_block.resnets_\1.'),
    (r'\.mid_block\.attentions\.0\.', '.mid_block.attentions_0.'),
    (r'\.resample\.1\.', '.resample_conv.'),
]

_VAE_NORM_NAMES = ('norm1', 'norm2', 'group_norm', 'conv_norm_out',
                   'norm_out')


def _is_vae_norm(path: str) -> bool:
    mod = path.rsplit('.', 1)[-1] if '.' in path else path
    return mod in _VAE_NORM_NAMES


def torch_vae_to_flax(state: Dict[str, np.ndarray],
                      dtype=np.float32) -> Tuple[Dict, Dict]:
    """diffusers AutoencoderKL state dict -> flax tree for models/vae.py.

    Conv kernels transpose NCHW (o,i,h,w) -> HWIO; attention Linears
    transpose; GroupNorm weight -> scale. Matches the reference's
    ``PretrainedVAE`` wrapped model (pretrained.py:23-100).
    """
    flat, used = {}, set()
    for key, v in state.items():
        name = key
        for pat, rep in _VAE_NAME_RULES:
            name = re.sub(pat, rep, name)
        path, _, leaf = name.rpartition('.')
        if leaf == 'weight':
            if _is_vae_norm(path):
                f_leaf, val = 'scale', v
            elif v.ndim == 4:
                f_leaf, val = 'kernel', v.transpose(2, 3, 1, 0)
            elif v.ndim == 2:
                f_leaf, val = 'kernel', v.T
            else:
                continue
        elif leaf == 'bias':
            f_leaf, val = 'bias', v
        else:
            continue
        used.add(key)
        flat[f'{path}.{f_leaf}'] = np.asarray(val).astype(dtype)
    unused = {k: v for k, v in state.items() if k not in used}
    return unflatten(flat), unused


def torch_qwen_vae_to_flax(state: Dict[str, np.ndarray],
                           dtype=np.float32) -> Tuple[Dict, Dict]:
    """diffusers AutoencoderKLQwenImage (Wan 3D-causal) -> flax image-mode
    tree for models/qwen_vae.py.

    Image-mode (single frame, empty cache) is exact with:
      * 3-D causal conv kernels (o,i,t,h,w) -> 2-D kernels from the LAST
        temporal slice (causal front zero-padding makes earlier slices see
        only zeros on frame 0);
      * ``time_conv`` weights skipped (never applied to the first frame);
      * WanRMS_norm gamma (c,1,1,1)/(c,1,1) -> (c,).
    """
    flat, used, skipped = {}, set(), {}
    for key, v in state.items():
        if '.time_conv.' in key:
            skipped[key] = v      # intentionally unused in image mode
            used.add(key)
            continue
        name = key
        for pat, rep in _QWEN_VAE_NAME_RULES:
            name = re.sub(pat, rep, name)
        path, _, leaf = name.rpartition('.')
        if leaf == 'gamma':
            f_leaf, val = 'gamma', v.reshape(-1)
        elif leaf == 'weight':
            if v.ndim == 5:                       # causal conv3d
                f_leaf, val = 'kernel', v[:, :, -1].transpose(2, 3, 1, 0)
            elif v.ndim == 4:                     # plain conv2d (attention)
                f_leaf, val = 'kernel', v.transpose(2, 3, 1, 0)
            else:
                continue
        elif leaf == 'bias':
            f_leaf, val = 'bias', v
        else:
            continue
        used.add(key)
        flat[f'{path}.{f_leaf}'] = np.asarray(val).astype(dtype)
    unused = {k: v for k, v in state.items() if k not in used}
    return unflatten(flat), unused


def fuse_lora(tree: Dict, scale: float = 1.0) -> Dict:
    """Fold LoRA deltas into the base kernels and drop the lora leaves
    (reference ``fuse_lora`` + ``unload_lora``, arcflux.py:352-355).

    kernel += scale * lora_a @ lora_b, with LoRADense's default
    alpha == rank so scale defaults to 1. Handles both 2-D and nn.scan
    stacked (L, in, r) x (L, r, out) leaves.
    """
    flat = flatten(tree)
    out = {}
    for k, v in flat.items():
        if k.endswith(('.lora_a', '.lora_b')):
            continue
        if k.endswith('.kernel'):
            a = flat.get(k[:-len('.kernel')] + '.lora_a')
            b = flat.get(k[:-len('.kernel')] + '.lora_b')
            if a is not None and b is not None:
                a, b, v = jnp.asarray(a), jnp.asarray(b), jnp.asarray(v)
                delta = a @ b if a.ndim == 2 \
                    else jnp.einsum('lir,lro->lio', a, b)
                v = v + scale * delta.astype(v.dtype)
        out[k] = v
    return unflatten(out)


def fuse_pretrained_loras(tree: Dict, lora_paths, lora_scales=1.0,
                          family: str = 'flux') -> Dict:
    """Teacher multi-LoRA fuse loading (reference diffusers/flux.py:57-68):
    each adapter's LoRA deltas are folded into the base kernels at its own
    scale, in order. Non-LoRA adapter keys are ignored (the reference's
    ``load_lora_adapter`` consumes only lora keys)."""
    from ..utils.pytree import merge_params, partition_params
    from .loader import load_adapter_state
    paths = [lora_paths] if isinstance(lora_paths, str) else list(lora_paths)
    scales = [lora_scales] * len(paths) \
        if isinstance(lora_scales, (int, float)) else list(lora_scales)
    assert len(scales) == len(paths), (paths, scales)
    for path, scale in zip(paths, scales):
        adapter, _ = load_adapter_state(path, family=family)
        lora_only, _ = partition_params(adapter, ('lora_a', 'lora_b'))
        tree = fuse_lora(merge_params(tree, lora_only), scale=float(scale))
    return tree


def graft_pretrained(init_tree: Dict, converted: Dict,
                     strict_shapes: bool = True) -> Tuple[Dict, list, list]:
    """Overlay converted weights onto an init tree; report missing/unexpected.

    Returns (tree, missing_keys, unexpected_keys) — the load contract of the
    reference's ``load_full_state_dict``.
    """
    init_flat = flatten(init_tree)
    conv_flat = flatten(converted)
    missing = [k for k in init_flat if k not in conv_flat]
    unexpected = [k for k in conv_flat if k not in init_flat]
    out = dict(init_flat)
    for k, v in conv_flat.items():
        if k in out:
            if strict_shapes and tuple(out[k].shape) != tuple(v.shape):
                raise ValueError(
                    f'shape mismatch for {k}: init {out[k].shape} vs '
                    f'checkpoint {v.shape}')
            out[k] = jnp.asarray(v, out[k].dtype)
    return unflatten(out), missing, unexpected
