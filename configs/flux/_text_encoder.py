"""On-the-fly prompt encoding (reference ``configs/flux/_text_encoder.py``):
include this base to encode raw prompts at train/eval time instead of
reading the cached embeds (zero-egress note: needs local CLIP/T5 weights)."""

model = dict(
    text_encoder=dict(type='PretrainedFluxTextEncoder'),
)
