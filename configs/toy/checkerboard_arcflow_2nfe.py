"""2-D checkerboard ArcFlow distillation: frozen flow teacher -> 2-NFE student
(toy-scale mirror of the FLUX/Qwen distillation configs)."""

name = 'checkerboard_arcflow_2nfe'

_teacher_denoising = dict(
    type='ToyMLPDenoiser',
    out_channels=2,
    hidden=(256, 256, 256),
    fourier_freqs=6,
    num_timesteps=1000)

model = dict(
    type='Distillation2D',
    data_shape=(2,),
    diffusion_use_ema=True,
    teacher_guidance_scale=1.0,
    # teacher weights come from the trained flow run
    teacher_ckpt='work_dirs/checkerboard_flow/checkpoints/checkerboard_flow',
    diffusion=dict(
        type='ArcFlowImitationDataFree',
        policy_type='ArcFlow',
        denoising=dict(
            type='ToyArcFlowDenoiser',
            out_channels=2,
            num_gaussians=8,
            hidden=(256, 256, 256),
            fourier_freqs=6,
            num_timesteps=1000),
        flow_loss=dict(
            type='DiffusionMSELoss',
            data_info=dict(pred='u_t_pred', target='u_t'),
            rescale_mode='constant',
            rescale_cfg=dict(scale=30.0)),
        num_timesteps=1000,
        timestep_sampler=dict(type='ContinuousTimeStepSampler', shift=1.0),
        denoising_mean_mode='U'),
    teacher=dict(
        type='GaussianFlow',
        denoising=_teacher_denoising,
        num_timesteps=1000,
        denoising_mean_mode='U'),
)

train_cfg = dict(
    nfe=2,
    timestep_ratio=1.0,
    total_substeps=128,
    num_intermediate_states=4,
    window_substeps=3,
    gm_dropout=0.1,
    num_decay_iters=500,
    diffusion_grad_clip=50.0,
    diffusion_grad_clip_begin_iter=100,
)
test_cfg = dict(nfe=2, timestep_ratio=1.0, total_substeps=128)

optimizer = dict(diffusion=dict(
    type='AdamW', lr=1e-3, weight_decay=0.0,
    paramwise_cfg=dict(custom_keys={'proj_out_loggamma': dict(lr_mult=0.1)})))

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

total_iters = 3000
work_dir = f'work_dirs/{name}'
