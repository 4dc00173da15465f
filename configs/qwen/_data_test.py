"""Qwen-Image evaluation prompt sets (reference ``configs/qwen/_data_test.py``):
HPSv2 and COCO-10k prompt benchmarks in ImagePrompt test mode.

Zero-egress note: prompt_dataset_kwargs point at the HF datasets the
reference uses; in offline deployments pre-download them or point
``datalist_path`` at a local jsonl(.gz) prompt list.
"""

data = dict(
    test=dict(
        type='ImagePrompt',
        data_root='data/t2i_prompts_hpsv2/',
        cache_dir='preproc_qwen',
        cache_datalist_path='data/t2i_prompts_hpsv2/preproc_qwen.jsonl.gz',
        prompt_dataset_kwargs=dict(
            path='Lakonik/t2i-prompts-hpsv2',
            split='train'),
        latent_size=(128, 128, 16),
        test_mode=True,
    ),
    test2=dict(
        type='ImagePrompt',
        data_root='data/t2i_prompts_coco_10k/',
        cache_dir='preproc_qwen',
        cache_datalist_path='data/t2i_prompts_coco_10k/preproc_qwen.jsonl.gz',
        prompt_dataset_kwargs=dict(
            path='Lakonik/t2i-prompts-coco-10k',
            split='train'),
        latent_size=(128, 128, 16),
        test_mode=True,
    ),
)

# registered as eval hooks when present (reference apis/train.py:126-139)
evaluation = [
    dict(type='EvalHook', interval=1000, num_samples=16,
         metrics=('latent_fd', 'clip_score')),
]
