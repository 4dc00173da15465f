"""Model composition layer: wiring submodules (diffusion, teacher, VAE, text
encoder) into loss/val functions with a trainable/frozen param split.

Equivalent capability to the reference's model hierarchy
(``lakonlab/models/base.py`` BaseModel, ``base_diffusion.py`` BaseDiffusion
with teacher wiring + tied weights, ``diffusion_2d.py`` Diffusion2D), but
expressed functionally: a model owns static submodule *definitions* and
exposes pure ``init_params`` / ``loss`` / ``val_step`` taking explicit param
trees. Teacher/student weight sharing is just passing the same tree to both
roles — no module surgery.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..registry import MODELS, build_module
from ..diffusion.arcflow import multistep_train_loss

Array = jax.Array


class BaseModel:
    """Base composition: subclasses build submodules and define the loss."""

    def __init__(self, train_cfg: Optional[dict] = None,
                 test_cfg: Optional[dict] = None):
        self.train_cfg = dict(train_cfg or {})
        self.test_cfg = dict(test_cfg or {})

    # -- interface used by the runner ------------------------------------
    def init_params(self, rng: Array) -> Tuple[Dict[str, Any], Dict[str, Any]]:
        """Returns (trainable, frozen) as {submodule_name: param_tree}."""
        raise NotImplementedError

    def loss(self, trainable, frozen, rng, batch, running_status=None
             ) -> Tuple[Array, Dict[str, Any]]:
        raise NotImplementedError

    def val_step(self, state, rng, batch, **kwargs):
        raise NotImplementedError

    @property
    def ema_keys(self) -> Tuple[str, ...]:
        """Trainable submodule keys that keep an EMA copy."""
        return ()


@MODELS.register_module()
class Diffusion2D(BaseModel):
    """2-D toy diffusion (reference ``lakonlab/models/diffusion_2d.py``):
    the CPU-debuggable minimal path used for smoke-testing the whole trainer.
    """

    def __init__(self, diffusion: dict, data_shape=(2,), diffusion_use_ema=True,
                 train_cfg=None, test_cfg=None):
        super().__init__(train_cfg, test_cfg)
        self.diffusion = build_module(
            diffusion, default_args=dict(train_cfg=self.train_cfg,
                                         test_cfg=self.test_cfg))
        self.data_shape = tuple(data_shape)
        self.diffusion_use_ema = diffusion_use_ema

    @property
    def ema_keys(self):
        return ('diffusion',) if self.diffusion_use_ema else ()

    def init_params(self, rng):
        x = jnp.zeros((1, *self.data_shape))
        t = jnp.zeros((1,))
        params = self.diffusion.denoising.init(rng, x, t)['params']
        return {'diffusion': params}, {}

    def loss(self, trainable, frozen, rng, batch, running_status=None):
        x_0 = jnp.reshape(batch['x'], (-1, *self.data_shape))
        loss, log_vars = self.diffusion.forward_train(
            trainable['diffusion'], rng, x_0, running_status=running_status)
        return loss, log_vars

    def val_step(self, state, rng, batch, use_ema=True, **kwargs):
        params = state.params_for_eval('diffusion', prefer_ema=use_ema)
        noise = batch.get('noise')
        if noise is None:
            noise = jax.random.normal(
                rng, (batch['num_samples'], *self.data_shape))
        return self.diffusion.forward_test(params, rng, noise, **kwargs)


@MODELS.register_module()
class Distillation2D(BaseModel):
    """2-D toy distillation: frozen flow teacher -> few-step ArcFlow student.

    Miniature of the reference's LatentDiffusion distillation wiring
    (``base_diffusion.py:73-113``: teacher built first, frozen, queried with
    ``return_u``): the teacher here is a GaussianFlow whose params live in
    ``frozen``; the student's ArcFlow module receives a ``teacher_fn`` closure.
    """

    def __init__(self, diffusion: dict, teacher: dict, data_shape=(2,),
                 diffusion_use_ema=True, teacher_guidance_scale=1.0,
                 teacher_ckpt=None, teacher_use_ema=True,
                 teacher_quant=None, teacher_quant_min_size=1024,
                 teacher_quant_group_size=32,
                 train_cfg=None, test_cfg=None):
        super().__init__(train_cfg, test_cfg)
        self.diffusion = build_module(
            diffusion, default_args=dict(train_cfg=self.train_cfg,
                                         test_cfg=self.test_cfg))
        self.teacher = build_module(teacher)
        self.data_shape = tuple(data_shape)
        self.diffusion_use_ema = diffusion_use_ema
        self.teacher_guidance_scale = teacher_guidance_scale
        self.teacher_ckpt = teacher_ckpt
        self.teacher_use_ema = teacher_use_ema
        # 'int8'/'int4': quantize the frozen teacher's big kernels — the
        # toy-scale mirror of LatentDiffusionTextImage's frozen_quant
        # (distill with a quantized teacher; quality gated by
        # tests/test_quantized_quality.py)
        assert teacher_quant in (None, 'int8', 'int4'), teacher_quant
        self.teacher_quant = teacher_quant
        self.teacher_quant_min_size = teacher_quant_min_size
        self.teacher_quant_group_size = teacher_quant_group_size

    @property
    def ema_keys(self):
        return ('diffusion',) if self.diffusion_use_ema else ()

    def init_params(self, rng):
        rng_s, rng_t = jax.random.split(rng)
        x = jnp.zeros((1, *self.data_shape))
        t = jnp.zeros((1,))
        student = self.diffusion.denoising.init(rng_s, x, t)['params']
        teacher = self.teacher.denoising.init(rng_t, x, t)['params']
        if self.teacher_ckpt:
            from ..runner.checkpoint import load_raw_checkpoint
            raw = load_raw_checkpoint(self.teacher_ckpt)
            src = raw.get('ema') if (self.teacher_use_ema and raw.get('ema')) \
                else raw['trainable']
            teacher = jax.tree.map(
                lambda ref, x: jnp.asarray(x, ref.dtype),
                teacher, src['diffusion'])
        frozen = {'teacher': teacher}
        if self.teacher_quant == 'int8':
            from ..utils.quantize import quantize_weights_int8
            frozen['teacher'], frozen['teacher_quant'] = \
                quantize_weights_int8(teacher,
                                      min_size=self.teacher_quant_min_size)
        elif self.teacher_quant == 'int4':
            from ..utils.quantize import quantize_weights_int4
            frozen['teacher'], frozen['teacher_quant'] = \
                quantize_weights_int4(
                    teacher, min_size=self.teacher_quant_min_size,
                    group_size=self.teacher_quant_group_size)
        return {'diffusion': student}, frozen

    def teacher_fn(self, frozen):
        teacher_params = jax.lax.stop_gradient(frozen['teacher'])
        if 'teacher_quant' in frozen:
            teacher_params = {'params': teacher_params,
                              'quant': frozen['teacher_quant']}

        def fn(x_t, t, **kw):
            return self.teacher.forward_u(
                teacher_params, x_t, t,
                guidance_scale=self.teacher_guidance_scale, **kw)
        return fn

    def loss(self, trainable, frozen, rng, batch, running_status=None):
        x_0 = jnp.reshape(batch['x'], (-1, *self.data_shape))
        return multistep_train_loss(
            self.diffusion, trainable['diffusion'], rng, x_0,
            teacher_fn=self.teacher_fn(frozen), running_status=running_status)

    def val_step(self, state, rng, batch, use_ema=True, **kwargs):
        params = state.params_for_eval('diffusion', prefer_ema=use_ema)
        noise = batch.get('noise')
        if noise is None:
            noise = jax.random.normal(
                rng, (batch['num_samples'], *self.data_shape))
        return self.diffusion.forward_test(params, rng, noise, **kwargs)
