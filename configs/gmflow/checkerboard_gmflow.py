"""GMFlow (Gaussian-mixture flow) on the 2-D checkerboard — exposes the
retained prior-work module (reference GMFlow) through the config surface."""

name = 'checkerboard_gmflow'

model = dict(
    type='Diffusion2D',
    data_shape=(1, 1, 2),            # GM ops use (B, H, W, C); points as 1x1
    diffusion_use_ema=True,
    diffusion=dict(
        type='GMFlow',
        denoising=dict(
            type='ToyGMFlowDenoiser',
            out_channels=2,
            num_gaussians=8,
            hidden=(256, 256, 256),
            num_timesteps=1000),
        flow_loss=dict(
            type='GMFlowNLLLoss',
            data_info=dict(pred_means='means', target='x_t_low',
                           pred_logstds='logstds',
                           pred_logweights='logweights')),
        num_timesteps=1000,
        timestep_sampler=dict(type='ContinuousTimeStepSampler', shift=1.0)),
)

train_cfg = dict(trans_ratio=1.0, diffusion_grad_clip=10.0)
test_cfg = dict(sampler='FlowEulerODE', num_timesteps=16, output_mode='mean',
                order=2, num_substeps=2)

optimizer = dict(diffusion=dict(type='AdamW', lr=1e-3, weight_decay=0.0))

data = dict(
    train=dict(type='CheckerboardData', n_rc=4, scale=1.0),
    train_dataloader=dict(samples_per_gpu=512),
)

checkpoint_config = dict(interval=2000, max_keep_ckpts=2)
log_config = dict(interval=200, hooks=[dict(type='TextLoggerHook')])
custom_hooks = [
    dict(type='ExponentialMovingAverageHookMod', module_keys=('diffusion_ema',),
         interp_mode='lerp', interval=1, start_iter=100,
         momentum_policy='karras', momentum_cfg=dict(gamma=7.0)),
]
total_iters = 10000
work_dir = f'work_dirs/{name}'
