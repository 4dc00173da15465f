"""ImageNet-256 class-conditional flow matching on cached SD-VAE latents —
the CPU-runnable teacher for the tiny-DiT distillation path (BASELINE.json
config 1; reference path: tools/cache_imagenet_data_sdvae.py +
DenoisingUnetMod)."""

name = 'imagenet256_flow'

model = dict(
    type='LatentDiffusionClassImage',
    num_classes=1000,
    prob_class=0.1,
    latent_shape=(32, 32, 4),
    diffusion_use_ema=True,
    diffusion=dict(
        type='GaussianFlow',
        denoising=dict(
            type='DenoisingUnetMod',
            in_channels=4,
            base_channels=128,
            channel_mult=(1, 2, 4),
            num_res_blocks=2,
            attn_resolutions=(16, 8),
            num_classes=1000,
            num_heads=8),
        flow_loss=dict(type='DiffusionMSELoss',
                       data_info=dict(pred='u_t_pred', target='u_t')),
        num_timesteps=1000,
        timestep_sampler=dict(type='ContinuousTimeStepSampler', shift=1.0)),
)

train_cfg = dict(diffusion_grad_clip=10.0)
test_cfg = dict(sampler='FlowEulerODE', num_timesteps=50)

optimizer = dict(diffusion=dict(type='AdamW', lr=1e-4, weight_decay=0.0))

data = dict(
    train=dict(type='ImageNet', latents_dir='data/imagenet256_latents'),
    train_dataloader=dict(samples_per_gpu=64),
)

checkpoint_config = dict(interval=5000, max_keep_ckpts=2)
log_config = dict(interval=100, hooks=[dict(type='TextLoggerHook')])
custom_hooks = [
    dict(type='ExponentialMovingAverageHookMod', module_keys=('diffusion_ema',),
         interp_mode='lerp', interval=1, start_iter=0,
         momentum_policy='karras', momentum_cfg=dict(gamma=7.0)),
]
total_iters = 400000
work_dir = f'work_dirs/{name}'
