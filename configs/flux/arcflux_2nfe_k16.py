"""ArcFlow-FLUX 2-NFE distillation at full scale (capability mirror of the
reference ``configs/flux/arcflux_2nfe_k16.py``).

Pretrained FLUX.1-dev weights load from a *local* converted checkpoint dir
(``pretrained=``); in network-enabled deployments point it at the downloaded
``black-forest-labs/FLUX.1-dev`` transformer folder.
"""

_base_ = ['./_mesh_train.py', './_data_trainval.py']

name = 'arcflux_2nfe_k16'

model = dict(
    type='LatentDiffusionTextImage',
    latent_shape=(128, 128, 16),         # 1024px
    text_embed_dim=4096,
    pooled_dim=768,
    tie_teacher=True,
    diffusion_use_ema=True,
    diffusion=dict(
        type='ArcFlowImitationDataFree',
        policy_type='ArcFlow',
        denoising=dict(
            type='ArcFluxTransformer2DModel',
            patch_size=2,
            num_gaussians=16,
            in_channels=64,
            num_layers=19,
            num_single_layers=38,
            attention_head_dim=128,
            num_attention_heads=24,
            joint_attention_dim=4096,
            pooled_projection_dim=768,
            guidance_embeds=True,
            checkpointing=True,
            lora_rank=256,
            # LoRA-branch dropout, train-mode only (reference lora_dropout=0.05)
            lora_dropout=0.05,
            # local converted FLUX.1-dev transformer weights (safetensors
            # dir, file, or sharded *.index.json); None = random init.
            # Reference: pretrained='huggingface://black-forest-labs/
            # FLUX.1-dev/transformer/...index.json' (arcflux config) —
            # zero-egress here, so point at a pre-downloaded copy.
            pretrained=None,
            # optional exported ArcFlow adapter to fuse into the base
            # before training (reference pretrained_adapter)
            pretrained_adapter=None),
        flow_loss=dict(
            type='DiffusionMSELoss',
            data_info=dict(pred='u_t_pred', target='u_t'),
            rescale_mode='constant',
            rescale_cfg=dict(scale=30.0)),
        num_timesteps=1,
        timestep_sampler=dict(type='ContinuousTimeStepSampler', shift=3.2),
        denoising_mean_mode='U'),
    teacher=dict(
        type='GaussianFlow',
        denoising=dict(
            type='FluxTransformer2DModel',
            patch_size=2,
            in_channels=64,
            num_layers=19,
            num_single_layers=38,
            attention_head_dim=128,
            num_attention_heads=24,
            joint_attention_dim=4096,
            pooled_projection_dim=768,
            guidance_embeds=True,
            checkpointing=True),
        num_timesteps=1,
        denoising_mean_mode='U'),
)

train_cfg = dict(
    num_decay_iters=2000,
    window_substeps=3,
    gm_dropout=0.1,
    num_intermediate_states=4,
    distilled_guidance_scale=3.5,
    teacher_distilled_guidance_scale=3.5,
    nfe=2,
    timestep_ratio=1.0,
    total_substeps=128,
    diffusion_grad_clip=50.0,
    diffusion_grad_clip_begin_iter=100,
)
test_cfg = dict(
    distilled_guidance_scale=3.5,
    nfe=2,
    timestep_ratio=1.0,
    total_substeps=128,
)

save_interval = 500
checkpoint_config = dict(
    interval=save_interval,
    must_save_interval=1000,
    max_keep_ckpts=1,
    trainable_only=True,
    out_dir='checkpoints/')

total_iters = 10000
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

work_dir = f'work_dirs/{name}'
