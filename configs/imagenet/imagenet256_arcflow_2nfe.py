"""ImageNet-256 ArcFlow 2-NFE distillation: frozen class-conditional flow
teacher (trained with imagenet256_flow.py) -> mixture-head UNet student.

The CPU-runnable distillation slice named by BASELINE.json (reference path:
tools/cache_imagenet_data_sdvae.py latents +
models/latent_diffusion_class_image.py distillation wiring).
"""

name = 'imagenet256_arcflow_2nfe'

_unet = dict(
    in_channels=4,
    base_channels=128,
    channel_mult=(1, 2, 4),
    num_res_blocks=2,
    attn_resolutions=(16, 8),
    num_classes=1000,
    num_heads=8)

model = dict(
    type='LatentDiffusionClassImage',
    num_classes=1000,
    prob_class=0.0,                      # distillation uses clean labels
    latent_shape=(32, 32, 4),
    diffusion_use_ema=True,
    # teacher weights come from the trained flow run
    teacher_ckpt='work_dirs/imagenet256_flow/checkpoints/imagenet256_flow',
    student_init_from_teacher=True,
    diffusion=dict(
        type='ArcFlowImitationDataFree',
        policy_type='ArcFlow',
        denoising=dict(type='ArcDenoisingUnetMod', num_gaussians=8, **_unet),
        flow_loss=dict(type='DiffusionMSELoss',
                       data_info=dict(pred='u_t_pred', target='u_t'),
                       rescale_cfg=dict(scale=30.0)),
        num_timesteps=1,
        timestep_sampler=dict(type='ContinuousTimeStepSampler', shift=1.0)),
    teacher=dict(
        type='GaussianFlow',
        denoising=dict(type='DenoisingUnetMod', **_unet),
        num_timesteps=1),
)

train_cfg = dict(
    nfe=2,
    timestep_ratio=1.0,
    total_substeps=128,
    num_intermediate_states=4,
    window_substeps=3,
    gm_dropout=0.1,
    num_decay_iters=2000,
    teacher_guidance_scale=1.5,
    diffusion_grad_clip=10.0,
    diffusion_grad_clip_begin_iter=100,
)
test_cfg = dict(nfe=2, timestep_ratio=1.0, total_substeps=128)

optimizer = dict(diffusion=dict(type='AdamW', lr=1e-4, weight_decay=0.0))

data = dict(
    train=dict(type='ImageNet', latents_dir='data/imagenet256_latents'),
    train_dataloader=dict(samples_per_gpu=32),
)

checkpoint_config = dict(interval=5000, max_keep_ckpts=2)
log_config = dict(interval=100, hooks=[dict(type='TextLoggerHook')])
custom_hooks = [
    dict(type='ExponentialMovingAverageHookMod', module_keys=('diffusion_ema',),
         interp_mode='lerp', interval=1, start_iter=100,
         momentum_policy='karras', momentum_cfg=dict(gamma=7.0)),
]
total_iters = 20000
work_dir = f'work_dirs/{name}'
