"""Config -> running training job.

Equivalent capability to the reference ``lakonlab/apis/train.py``
(``train_model``): build model/datasets/optimizers/runner from the config,
register hooks, auto-resume from the latest checkpoint with sampler
fast-forward, run. The reference's module-wrapper step (DDP/FSDP) becomes a
mesh/sharding configuration of the same jitted train step (parallel/).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from ..config import Config  # noqa: F401
from ..registry import MODELS
from ..data import build_dataloader, build_dataset
from ..runner import (CheckpointHook, CheckpointManager, EmaConfig,
                      IterBasedRunner, QuartileLossLoggerHook, TrainState,
                      build_hooks, build_logger, build_optimizers,
                      build_train_step, count_params)


def build_model_from_cfg(cfg: Config):
    return MODELS.build(cfg.model, default_args=dict(
        train_cfg=cfg.get('train_cfg'), test_cfg=cfg.get('test_cfg')))


def ema_config_from_cfg(cfg: Config) -> EmaConfig:
    for hook_cfg in cfg.get('custom_hooks', []) or []:
        if 'ExponentialMovingAverage' in hook_cfg.get('type', ''):
            return EmaConfig.from_hook_cfg(hook_cfg)
    return EmaConfig(enabled=True, momentum_policy='fixed', momentum=0.999)


def train_model(cfg: Config, work_dir: Optional[str] = None,
                resume: bool = True, seed: int = 0, max_iters: Optional[int] = None):
    work_dir = work_dir or cfg.get('work_dir', 'work_dirs/default')
    os.makedirs(work_dir, exist_ok=True)
    logger = build_logger(work_dir)
    cfg.dump(os.path.join(work_dir, 'config.py'))

    model = build_model_from_cfg(cfg)

    rng = jax.random.PRNGKey(seed)
    rng, rng_init = jax.random.split(rng)
    trainable, frozen = model.init_params(rng_init)
    logger.info(f'trainable params: {count_params(trainable):,}; '
                f'frozen params: {count_params(frozen):,}')

    optimizers = build_optimizers(dict(cfg.optimizer), trainable)
    state = TrainState.create(rng, trainable, frozen, optimizers,
                              ema_keys=model.ema_keys)

    # config-driven mesh parallelism (the reference's DDP/FSDP wrapper config
    # surface, SURVEY.md §2.4): parallel = dict(mesh=dict(data=2, fsdp=-1),
    # tensor_axis='tensor', min_shard_size=65536)
    mesh = None
    parallel_cfg = dict(cfg.get('parallel', {}) or {})
    if parallel_cfg.get('mesh'):
        from ..parallel import make_mesh, shard_state
        mesh = make_mesh(dict(parallel_cfg['mesh']),
                         dcn_axes=parallel_cfg.get('dcn_mesh'))
        state, _ = shard_state(
            state, mesh,
            fsdp_axis=parallel_cfg.get('fsdp_axis', 'fsdp'),
            tensor_axis=parallel_cfg.get('tensor_axis'),
            min_size=parallel_cfg.get('min_shard_size', 2 ** 16),
            pipe_axis=parallel_cfg.get('pipe_axis', 'pipe'))
        # activation constraints (trace-time): batch pinned to (data, fsdp),
        # attention-head/MLP activations to the tensor axis; a 'pipe' mesh
        # axis stages the DiT blocks as a GPipe schedule
        from ..parallel import set_activation_sharding
        set_activation_sharding(
            mesh, tensor_axis=parallel_cfg.get('tensor_axis') or 'tensor',
            sp_mode=parallel_cfg.get('sp_mode', 'ulysses'),
            pipe_axis=parallel_cfg.get('pipe_axis', 'pipe'),
            pipe_microbatches=parallel_cfg.get('pipe_microbatches'),
            pipe_interleave=parallel_cfg.get('pipe_interleave', 1))
        logger.info(f'mesh parallelism: {dict(mesh.shape)}')

    ckpt_cfg = dict(cfg.get('checkpoint_config', {}) or {})
    out_dir = ckpt_cfg.pop('out_dir', os.path.join(work_dir, 'checkpoints'))
    name = cfg.get('name', 'default')
    manager = CheckpointManager(
        os.path.join(out_dir, name),
        interval=ckpt_cfg.get('interval', 1000),
        must_save_interval=ckpt_cfg.get('must_save_interval'),
        max_keep_ckpts=ckpt_cfg.get('max_keep_ckpts'),
        ckpt_trainable_only=ckpt_cfg.get('trainable_only', True),
        ckpt_fp16=ckpt_cfg.get('fp16', False),
        ckpt_fp16_ema=ckpt_cfg.get('fp16_ema', False),
        ckpt_bf16_optim=ckpt_cfg.get('bf16_optim', False))

    if resume and manager.latest_step() is not None:
        state = manager.restore(state)
        logger.info(f'resumed from iter {int(state.step)}')

    train_cfg = dict(cfg.get('train_cfg', {}) or {})
    data_cfg = dict(cfg.data)
    samples_per_gpu = (data_cfg.get('train_dataloader', {}) or {}).get(
        'samples_per_gpu', data_cfg.get('samples_per_gpu', 1))
    grad_accum_bs = train_cfg.get('grad_accum_batch_size')
    grad_accum_steps = 1
    if grad_accum_bs:
        assert samples_per_gpu % grad_accum_bs == 0
        grad_accum_steps = samples_per_gpu // grad_accum_bs

    # train_cfg.offload_cold_state=True keeps optimizer slots + EMA in the
    # TPU host's pinned memory, streamed on/off-device around the update —
    # the single-chip capacity mode (measured: 7.96B on one 16 GB chip,
    # README "Training throughput"). Under a mesh the cold state already
    # shards over fsdp; offload there is not implemented (use the mesh).
    offload_shardings = None
    if train_cfg.pop('offload_cold_state', False):
        if mesh is not None:
            logger.warning('offload_cold_state ignored under a mesh: cold '
                           'state is already fsdp-sharded')
        elif jax.default_backend() != 'tpu':
            # XLA:CPU silently drops output memory-space annotations, and
            # donating a pinned_host input against a device-kind output
            # hard-aborts the process — TPU-only feature
            logger.warning('offload_cold_state needs a TPU backend; '
                           'ignored')
        else:
            from jax.sharding import SingleDeviceSharding
            dev = jax.devices()[0]
            host_s = SingleDeviceSharding(dev, memory_kind='pinned_host')
            offload_shardings = (SingleDeviceSharding(dev), host_s)
            state = state.replace(
                opt_states=jax.tree.map(
                    lambda x: jax.device_put(x, host_s), state.opt_states),
                ema=jax.tree.map(lambda x: jax.device_put(x, host_s),
                                 state.ema)
                if state.ema is not None else None)
            logger.info('cold state (optimizer slots + EMA) host-offloaded')

    train_step = build_train_step(
        model, optimizers, train_cfg=train_cfg,
        ema_cfg=ema_config_from_cfg(cfg) if model.ema_keys else None,
        grad_accum_steps=grad_accum_steps,
        offload_shardings=offload_shardings)

    dataset = build_dataset(data_cfg['train'])
    # The batch shards over (data, fsdp): every device computes a distinct
    # micro-batch (samples_per_gpu is per *device*, as in the reference's
    # per-GPU semantics). Multihost: each process loads only its slice.
    n_proc, proc_id = jax.process_count(), jax.process_index()
    if mesh is not None:
        from ..parallel import batch_axes
        batch_devices = int(np.prod([mesh.shape[a] for a in
                                     batch_axes(mesh)]))
    else:
        batch_devices = 1
    global_bs = samples_per_gpu * batch_devices
    assert global_bs % n_proc == 0, (global_bs, n_proc)
    global_bs //= n_proc
    if getattr(dataset, 'bucket_ids', None) is not None and \
            len(np.unique(dataset.bucket_ids)) > 1:
        from ..data import build_bucketized_loader
        loader = build_bucketized_loader(dataset, global_bs, seed=seed,
                                         start_iter=int(state.step),
                                         num_replicas=n_proc, rank=proc_id)
    else:
        loader = build_dataloader(dataset, global_bs, seed=seed,
                                  start_iter=int(state.step),
                                  num_replicas=n_proc, rank=proc_id)
    raw_loader = loader
    if mesh is not None:
        from ..parallel import shard_batch
        base_loader = loader

        def sharded_loader():
            for batch in base_loader:
                yield shard_batch(batch, mesh, axis='data')
        loader = sharded_loader()

    extra_hooks = [QuartileLossLoggerHook(
        total_timesteps=cfg.model.diffusion.get('num_timesteps', 1000)),
        CheckpointHook(manager)]
    eval_cfg = cfg.get('evaluation')
    if eval_cfg:
        from ..runner.hooks import EvalHook
        if isinstance(eval_cfg, dict):
            eval_cfg = [eval_cfg]
        for e_cfg in eval_cfg:
            e_cfg = {k: v for k, v in dict(e_cfg).items() if k != 'type'}
            extra_hooks.append(EvalHook(**e_cfg))
    if cfg.get('profiler'):
        from ..runner.hooks import ProfilerHook
        extra_hooks.append(ProfilerHook(**dict(cfg.profiler)))
    hooks = build_hooks(cfg.get('log_config'), extra_hooks=extra_hooks)

    total = max_iters or cfg.get('total_iters', 10000)
    runner = IterBasedRunner(model, state, train_step, loader, total,
                             work_dir=work_dir, hooks=hooks, logger=logger,
                             gc_interval=cfg.get('gc_interval'))
    try:
        state = runner.run()
    finally:
        # stop the prefetch worker (otherwise it lives on, pinning the data
        # iterator and its staged batches after training ends)
        if hasattr(raw_loader, 'close'):
            raw_loader.close()
        manager.close()
    return state, model
