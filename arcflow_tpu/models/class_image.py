"""Class-conditional latent diffusion composition (ImageNet path).

Equivalent capability to the reference ``LatentDiffusionClassImage``
(``lakonlab/models/latent_diffusion_class_image.py``): label conditioning
with ``prob_class`` dropout to the null class (CFG training), negative-label
concat for guided evaluation, cached-latents or VAE-encode input, optional
frozen teacher for distillation.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..registry import MODELS, build_module
from ..diffusion.arcflow import multistep_train_loss
from .base import BaseModel

Array = jax.Array


@MODELS.register_module()
class LatentDiffusionClassImage(BaseModel):

    def __init__(self, diffusion: dict, teacher: Optional[dict] = None,
                 vae: Optional[dict] = None, num_classes: int = 1000,
                 prob_class: float = 0.1, diffusion_use_ema: bool = True,
                 latent_shape: Tuple[int, int, int] = (32, 32, 4),
                 teacher_ckpt: Optional[str] = None, teacher_use_ema=True,
                 student_init_from_teacher: bool = False,
                 train_cfg=None, test_cfg=None):
        super().__init__(train_cfg, test_cfg)
        self.diffusion = build_module(
            diffusion, default_args=dict(train_cfg=self.train_cfg,
                                         test_cfg=self.test_cfg))
        self.teacher = build_module(teacher) if teacher else None
        self.vae = build_module(vae) if vae else None
        self.num_classes = num_classes
        self.prob_class = prob_class
        self.diffusion_use_ema = diffusion_use_ema
        self.latent_shape = tuple(latent_shape)
        self.teacher_ckpt = teacher_ckpt
        self.teacher_use_ema = teacher_use_ema
        self.student_init_from_teacher = student_init_from_teacher

    @property
    def ema_keys(self):
        return ('diffusion',) if self.diffusion_use_ema else ()

    def _dummy(self):
        h, w, c = self.latent_shape
        return (jnp.zeros((1, h, w, c)), jnp.zeros((1,)),
                jnp.zeros((1,), jnp.int32))

    def init_params(self, rng):
        x, t, y = self._dummy()
        rng_s, rng_t = jax.random.split(rng)
        trainable = {'diffusion': self.diffusion.denoising.init(
            rng_s, x, t, label=y)['params']}
        frozen = {}
        if self.teacher is not None:
            teacher = self.teacher.denoising.init(rng_t, x, t,
                                                  label=y)['params']
            if self.teacher_ckpt:
                from ..runner.checkpoint import load_raw_checkpoint
                raw = load_raw_checkpoint(self.teacher_ckpt)
                src = raw.get('ema') if (self.teacher_use_ema
                                         and raw.get('ema')) \
                    else raw['trainable']
                teacher = jax.tree.map(lambda ref, v: jnp.asarray(v, ref.dtype),
                                       teacher, src['diffusion'])
            frozen['teacher'] = teacher
            if self.student_init_from_teacher:
                trainable['diffusion'] = self._graft_student_from_teacher(
                    trainable['diffusion'], teacher, rng_s)
        return trainable, frozen

    def _graft_student_from_teacher(self, student, teacher, rng):
        """Init the student trunk from the teacher and expand the teacher's
        output conv into the K-way means head with seeded bias noise — the
        UNet analogue of the reference's proj_out expansion
        (arcflux.py:327-341)."""
        from ..utils.pytree import flatten, unflatten
        s_flat = dict(flatten(student))
        t_flat = flatten(teacher)
        for key, v in t_flat.items():
            if key in s_flat and tuple(s_flat[key].shape) == tuple(v.shape):
                # copy, don't alias: the trainable tree is donated by the
                # train step while the frozen teacher keeps its buffer
                s_flat[key] = jnp.array(v, dtype=s_flat[key].dtype)
        if 'proj_out_means.kernel' in s_flat and 'conv_out.kernel' in t_flat:
            kern = jnp.asarray(t_flat['conv_out.kernel'])   # (kh,kw,Cin,c)
            bias = jnp.asarray(t_flat['conv_out.bias'])     # (c,)
            c = kern.shape[-1]
            k = s_flat['proj_out_means.kernel'].shape[-1] // c
            tiled = jnp.tile(kern[..., None, :], (1, 1, 1, k, 1))
            s_flat['proj_out_means.kernel'] = tiled.reshape(
                *kern.shape[:3], k * c).astype(
                s_flat['proj_out_means.kernel'].dtype)
            noise = 0.05 * jax.random.normal(rng, (k, c), jnp.float32)
            s_flat['proj_out_means.bias'] = (
                jnp.tile(bias[None], (k, 1)) + noise).reshape(k * c).astype(
                s_flat['proj_out_means.bias'].dtype)
        return unflatten(s_flat)

    def _labels_with_dropout(self, rng: Array, labels: Array) -> Array:
        """Randomly replace labels with the null class (reference
        prob_class label dropout)."""
        if self.prob_class <= 0:
            return labels
        drop = jax.random.uniform(rng, labels.shape) < self.prob_class
        return jnp.where(drop, self.num_classes, labels)

    def teacher_fn(self, frozen):
        t_params = jax.lax.stop_gradient(frozen['teacher'])
        gs = self.train_cfg.get('teacher_guidance_scale', 1.0) or 1.0

        def fn(x_t, t, label=None, **kw):
            if gs not in (0.0, 1.0) and label is not None:
                neg = jnp.full_like(label, self.num_classes)
                lbl = jnp.concatenate([neg, label], axis=0)
                return self.teacher.forward_u(t_params, x_t, t,
                                              guidance_scale=gs, label=lbl)
            return self.teacher.forward_u(t_params, x_t, t, label=label)
        return fn

    def loss(self, trainable, frozen, rng, batch, running_status=None):
        latents = jnp.asarray(batch['latents'])
        labels = jnp.asarray(batch['label'], jnp.int32)
        rng_drop, rng_loss = jax.random.split(rng)
        labels = self._labels_with_dropout(rng_drop, labels)
        if self.teacher is not None:
            t_fn = self.teacher_fn(frozen)
            teacher_fn = lambda x_t, t: t_fn(x_t, t, label=labels)  # noqa
            return multistep_train_loss(
                self.diffusion, trainable['diffusion'], rng_loss, latents,
                teacher_fn=teacher_fn, running_status=running_status,
                label=labels)
        return self.diffusion.forward_train(
            trainable['diffusion'], rng_loss, latents,
            running_status=running_status, label=labels)

    def val_step(self, state, rng, batch, use_ema=True, guidance_scale=1.0,
                 test_cfg_override=None, **kwargs):
        params = state.params_for_eval('diffusion', prefer_ema=use_ema)
        labels = jnp.asarray(batch['label'], jnp.int32)
        noise = batch.get('noise')
        if noise is None:
            noise = jax.random.normal(
                rng, (labels.shape[0], *self.latent_shape))
        lbl = labels
        if guidance_scale not in (0.0, 1.0):
            neg = jnp.full_like(labels, self.num_classes)
            lbl = jnp.concatenate([neg, labels], axis=0)
        latents = self.diffusion.forward_test(
            params, rng, jnp.asarray(noise), guidance_scale=guidance_scale,
            test_cfg_override=test_cfg_override, label=lbl)
        if self.vae is not None and 'vae' in state.frozen:
            imgs = self.vae.decode(state.frozen['vae'], latents)
            return dict(num_samples=labels.shape[0],
                        pred_imgs=jnp.clip(imgs / 2 + 0.5, 0, 1))
        return dict(num_samples=labels.shape[0], pred_latents=latents)
