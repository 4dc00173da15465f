"""ArcFlow-Qwen-Image 2-NFE distillation (capability mirror of the reference
``configs/qwen/arcqwen_2nfe_k16.py``)."""

_base_ = ['../flux/_mesh_train.py']

name = 'arcqwen_2nfe_k16'

data_root = 'data/qwen_embeds'

model = dict(
    type='LatentDiffusionTextImage',
    latent_shape=(128, 128, 16),
    text_embed_dim=3584,
    pooled_dim=3584,              # unused by Qwen (no pooled projections)
    max_text_len=512,
    tie_teacher=True,
    diffusion_use_ema=True,
    diffusion=dict(
        type='ArcFlowImitationDataFree',
        policy_type='ArcFlow',
        denoising=dict(
            type='ArcQwenImageTransformer2DModel',
            patch_size=2,
            num_gaussians=16,
            in_channels=64,
            num_layers=60,
            attention_head_dim=128,
            num_attention_heads=24,
            joint_attention_dim=3584,
            max_text_len=512,
            checkpointing=True,
            lora_rank=256,
            # LoRA-branch dropout, train-mode only (reference lora_dropout=0.05)
            lora_dropout=0.05,
            # local converted Qwen-Image transformer weights (safetensors
            # dir/file/index.json); None = random init (zero egress)
            pretrained=None,
            pretrained_adapter=None),
        flow_loss=dict(
            type='DiffusionMSELoss',
            data_info=dict(pred='u_t_pred', target='u_t'),
            rescale_mode='constant',
            rescale_cfg=dict(scale=30.0)),
        num_timesteps=1,
        timestep_sampler=dict(
            type='ContinuousTimeStepSampler',
            use_dynamic_shifting=True,
            base_seq_len=256, max_seq_len=4096,
            base_logshift=0.5, max_logshift=1.15),
        denoising_mean_mode='U'),
    teacher=dict(
        type='GaussianFlow',
        denoising=dict(
            type='QwenImageTransformer2DModel',
            patch_size=2,
            in_channels=64,
            num_layers=60,
            attention_head_dim=128,
            num_attention_heads=24,
            joint_attention_dim=3584,
            max_text_len=512,
            checkpointing=True),
        num_timesteps=1,
        denoising_mean_mode='U'),
)

train_cfg = dict(
    num_decay_iters=2000,
    window_substeps=3,
    gm_dropout=0.1,
    num_intermediate_states=4,
    teacher_guidance_scale=4.0,
    nfe=2,
    timestep_ratio=1.0,
    total_substeps=128,
    diffusion_grad_clip=50.0,
    diffusion_grad_clip_begin_iter=100,
    grad_accum_batch_size=1,
)
test_cfg = dict(nfe=2, timestep_ratio=1.0, total_substeps=128)

data = dict(
    train=dict(
        type='ImagePrompt',
        cache_dir=f'{data_root}/cache',
        datalist_path=f'{data_root}/datalist.jsonl.gz',
        latent_size=(128, 128, 16),
        pad_seq_len=512,
        negative_prompt_embeds_path=f'{data_root}/negative_embeds.pth',
        end_ind=-128),
    train_dataloader=dict(samples_per_gpu=4),
)

save_interval = 500
checkpoint_config = dict(interval=save_interval, must_save_interval=1000,
                         max_keep_ckpts=1, trainable_only=True,
                         out_dir='checkpoints/')
total_iters = 15000
custom_hooks = [
    dict(type='ExponentialMovingAverageHookMod',
         module_keys=('diffusion_ema',),
         interp_mode='lerp', interval=1, start_iter=100,
         momentum_policy='karras', momentum_cfg=dict(gamma=7.0),
         priority='VERY_HIGH'),
]
work_dir = f'work_dirs/{name}'
