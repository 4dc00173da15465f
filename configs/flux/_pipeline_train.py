"""Pipeline-parallel training base: the DiT blocks stage over a 'pipe'
mesh axis (GPipe schedule, arcflow_tpu/parallel/pipeline.py) composed with
data parallelism — the memory-scaling alternative to FSDP where parameters
never move (stage handoff is one neighbour ppermute of activations over
ICI, vs FSDP's all-gather of every weight each step).

Capability beyond the reference (SURVEY.md §2.4: PP ABSENT). Use when the
per-step weight all-gather dominates (very large models / slow
interconnect) or to co-locate each stage's optimizer state with its
layers. Each block stack pipelines independently when its depth divides
the pipe degree and falls back to the plain scan otherwise (FLUX at
pipe=2: the 38 single blocks stage, the 19 joint blocks stay scanned;
Qwen's 60 blocks divide by 2/3/4/5/6/10/...). `pipe_microbatches` tunes
the bubble: fraction (S-1)/(M+S-1) of each step idles, so raise M with
the global batch.
"""

parallel = dict(
    mesh=dict(data=-1, pipe=2),
    fsdp_axis=None,
    tensor_axis=None,
    pipe_axis='pipe',
    pipe_microbatches=None,   # default: one microbatch per stage
    # >1 selects the circular (interleaved) schedule: V strided layer
    # chunks per device, bubble (S-1)/(V*S+S-1) instead of (S-1)/(2S-1);
    # needs depth % (pipe*V) == 0 and M == S (forced), degrades to the
    # plain GPipe schedule otherwise
    pipe_interleave=1,
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
