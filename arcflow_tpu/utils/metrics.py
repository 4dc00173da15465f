"""Quantitative sample-quality metrics for eval hooks.

The reference registers eval hooks over HPSv2/COCO-10k prompt sets
(``configs/flux/_data_test.py``, ``apis/train.py:126-139``) but computes no
quantitative metric in-repo (FID/CLIP numbers are produced offline). Here
the always-available metric is a **latent-space Fréchet distance** between
generated and reference latents (no external model needed, zero egress),
plus a CLIP-score path that activates when local CLIP weights exist.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def frechet_distance(feats_a: np.ndarray, feats_b: np.ndarray,
                     eps: float = 1e-6) -> float:
    """FD^2 = |mu_a - mu_b|^2 + tr(Ca + Cb - 2 sqrtm(Ca Cb)).

    Works on any (N, D) feature matrix; used on flattened/pooled VAE
    latents as a reference-free-model proxy for FID.
    """
    a = np.asarray(feats_a, np.float64).reshape(len(feats_a), -1)
    b = np.asarray(feats_b, np.float64).reshape(len(feats_b), -1)
    mu_a, mu_b = a.mean(0), b.mean(0)
    ca = np.cov(a, rowvar=False) + eps * np.eye(a.shape[1])
    cb = np.cov(b, rowvar=False) + eps * np.eye(b.shape[1])
    diff = mu_a - mu_b
    # tr(sqrtm(Ca Cb)) = sum sqrt(eigvals(Ca Cb)); the product of two PSD
    # matrices has real non-negative spectrum up to numerical noise
    eigvals = np.linalg.eigvals(ca @ cb)
    tr_sqrt = np.sqrt(np.clip(eigvals.real, 0.0, None)).sum()
    fd2 = diff @ diff + np.trace(ca) + np.trace(cb) - 2.0 * tr_sqrt
    return float(max(fd2, 0.0))


def latent_stats_features(latents: np.ndarray) -> np.ndarray:
    """(N, H, W, C) latents -> (N, 2C) per-sample channel mean/std features
    (keeps the FD covariance tractable at small N)."""
    x = np.asarray(latents, np.float64)
    return np.concatenate([x.mean(axis=(1, 2)), x.std(axis=(1, 2))], axis=-1)


def latent_frechet_distance(pred_latents: np.ndarray,
                            ref_latents: np.ndarray) -> float:
    return frechet_distance(latent_stats_features(pred_latents),
                            latent_stats_features(ref_latents))


def clip_score(images: np.ndarray, prompts: Sequence[str],
               clip_path: str = 'openai/clip-vit-large-patch14',
               dtype: str = 'float32') -> Optional[float]:
    """Mean CLIP image-text cosine similarity, or None when CLIP weights are
    unavailable (zero-egress environments without a local cache)."""
    try:
        import jax.numpy as jnp
        import transformers
        processor = transformers.CLIPProcessor.from_pretrained(clip_path)
        model = transformers.FlaxCLIPModel.from_pretrained(clip_path)
    except Exception:
        return None
    imgs = np.clip(np.asarray(images) * 255, 0, 255).astype(np.uint8)
    inputs = processor(text=list(prompts), images=list(imgs),
                       return_tensors='np', padding=True)
    out = model(**inputs)
    img_emb = out.image_embeds / jnp.linalg.norm(
        out.image_embeds, axis=-1, keepdims=True)
    txt_emb = out.text_embeds / jnp.linalg.norm(
        out.text_embeds, axis=-1, keepdims=True)
    return float((img_emb * txt_emb).sum(-1).mean())
