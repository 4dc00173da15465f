"""On-the-fly prompt encoding (reference ``configs/qwen/_text_encoder.py``):
Qwen2.5-VL prompt tower; needs local weights under zero egress."""

model = dict(
    text_encoder=dict(type='PretrainedQwenImageTextEncoder'),
)
