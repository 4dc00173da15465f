"""Qwen training data: cached prompt-embedding records (reference
``configs/qwen/_data_trainval.py``). Build the cache with
``tools/cache_image_prompt_data.py --family qwen``."""

data_root = 'data/qwen_embeds'

data = dict(
    workers_per_gpu=2,
    train=dict(
        type='ImagePrompt',
        cache_dir=f'{data_root}/cache',
        datalist_path=f'{data_root}/datalist.jsonl.gz',
        latent_size=(128, 128, 16),
        pad_seq_len=512,
        end_ind=-128),
    val=dict(
        type='ImagePrompt',
        cache_dir=f'{data_root}/cache',
        datalist_path=f'{data_root}/datalist.jsonl.gz',
        latent_size=(128, 128, 16),
        pad_seq_len=512,
        start_ind=-128,
        test_mode=True),
    train_dataloader=dict(samples_per_gpu=4),
    val_dataloader=dict(samples_per_gpu=1),
)
