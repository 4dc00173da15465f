"""2-D checkerboard flow-matching — the minimal end-to-end training config
(reference analogue: Diffusion2D + CheckerboardData toy path)."""

name = 'checkerboard_flow'

model = dict(
    type='Diffusion2D',
    data_shape=(2,),
    diffusion_use_ema=True,
    diffusion=dict(
        type='GaussianFlow',
        denoising=dict(
            type='ToyMLPDenoiser',
            out_channels=2,
            hidden=(256, 256, 256),
            fourier_freqs=6,
            num_timesteps=1000),
        flow_loss=dict(
            type='DiffusionMSELoss',
            data_info=dict(pred='u_t_pred', target='u_t'),
            rescale_mode='constant',
            rescale_cfg=dict(scale=1.0)),
        num_timesteps=1000,
        timestep_sampler=dict(type='ContinuousTimeStepSampler', shift=1.0),
        denoising_mean_mode='U'),
)

train_cfg = dict(
    diffusion_grad_clip=10.0,
    diffusion_grad_clip_begin_iter=100,
)
test_cfg = dict(
    sampler='FlowEulerODE',
    num_timesteps=64,
)

optimizer = dict(diffusion=dict(type='AdamW', lr=1e-3, weight_decay=0.0))

data = dict(
    train=dict(type='CheckerboardData', n_rc=4, scale=1.0),
    train_dataloader=dict(samples_per_gpu=512),
)

checkpoint_config = dict(interval=1000, max_keep_ckpts=2, trainable_only=True)

custom_hooks = [
    dict(type='ExponentialMovingAverageHookMod',
         module_keys=('diffusion_ema',),
         interp_mode='lerp',
         interval=1,
         start_iter=100,
         momentum_policy='karras',
         momentum_cfg=dict(gamma=7.0),
         priority='VERY_HIGH'),
]

log_config = dict(interval=200, hooks=[dict(type='TextLoggerHook')])

total_iters = 4000
work_dir = f'work_dirs/{name}'
