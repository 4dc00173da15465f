"""Shared training base for FLUX-scale distillation on a TPU mesh.

TPU-native replacement for the reference's launcher bases
(``configs/flux/_fsdp_train.py`` / ``_ddp_train.py``): one
``jax.sharding.Mesh`` expresses DDP (data axis), FSDP/ZeRO-3 (fsdp axis) and
the hybrid-shard layout (fsdp over ICI, data over DCN). Teacher/student/EMA
share the frozen trunk structurally — no wrapper/tie config needed.
"""

# v5p-8 style: 2-way data parallel x 4-way parameter sharding.
# Set fsdp=-1 to infer from the device count.
parallel = dict(
    mesh=dict(data=2, fsdp=-1),
    fsdp_axis='fsdp',
    tensor_axis=None,        # set to 'tensor' (and add to mesh) for TP
    min_shard_size=2 ** 16,
)

optimizer = dict(diffusion=dict(
    type='AdamW', lr=1e-4, betas=(0.9, 0.95), weight_decay=0.0,
    paramwise_cfg=dict(custom_keys={'proj_out_loggamma': dict(lr_mult=0.1)})))

train_cfg_base = dict(
    diffusion_grad_clip=50.0,
    diffusion_grad_clip_begin_iter=100,
    diffusion_grad_clip_skip_ratio=20.0,
)

log_config = dict(interval=50, hooks=[dict(type='TextLoggerHook'),
                                      dict(type='JsonLoggerHook')])
