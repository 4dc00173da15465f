"""Gradio text-to-image interface builder.

Equivalent capability to the reference UI
(``lakonlab/ui/gradio/create_text_to_img.py:5-54`` + ``shared_opts.py``):
prompt box, seed bar with randomize, H/W fields with swap, nfe/temperature
sliders, batched generation. Gated on gradio availability (not baked into
this image); the builder takes any pipeline with the ArcFluxPipeline call
signature.
"""

from __future__ import annotations

import random
from typing import Any, Callable, Optional


def create_interface_text_to_img(pipeline, default_prompt: str = '',
                                 default_height: int = 1024,
                                 default_width: int = 1024,
                                 max_batch: int = 4):
    try:
        import gradio as gr
    except ImportError as e:   # pragma: no cover
        raise RuntimeError('gradio is not installed in this environment; '
                           'the UI layer is available when it is') from e
    import numpy as np

    def generate(prompt, height, width, nfe, temperature,
                 guidance, seed, batch):
        out = pipeline(prompt=[prompt] * int(batch),
                       height=int(height), width=int(width),
                       num_inference_steps=int(nfe),
                       temperature=float(temperature),
                       guidance_scale=float(guidance), seed=int(seed),
                       output_type='np')
        return [np.asarray(img) for img in out['images']]

    def randomize_seed():
        return random.randint(0, 2 ** 31 - 1)

    def swap_hw(h, w):
        return w, h

    with gr.Blocks(title='ArcFlow TPU') as demo:
        gr.Markdown('## ArcFlow 2-NFE text-to-image (TPU)')
        with gr.Row():
            with gr.Column():
                prompt = gr.Textbox(label='Prompt', value=default_prompt,
                                    lines=3)
                with gr.Row():
                    height = gr.Number(label='Height', value=default_height)
                    width = gr.Number(label='Width', value=default_width)
                    swap = gr.Button('⇄', scale=0)
                with gr.Row():
                    nfe = gr.Slider(1, 8, value=2, step=1, label='NFE')
                    temperature = gr.Slider(0.1, 2.0, value=1.0,
                                            label='Temperature')
                    guidance = gr.Slider(0.0, 10.0, value=3.5,
                                         label='Guidance')
                with gr.Row():
                    seed = gr.Number(label='Seed', value=42, precision=0)
                    rand = gr.Button('\U0001f3b2', scale=0)
                    batch = gr.Slider(1, max_batch, value=1, step=1,
                                      label='Batch')
                run = gr.Button('Generate', variant='primary')
            gallery = gr.Gallery(label='Results', columns=2)
        swap.click(swap_hw, [height, width], [height, width])
        rand.click(randomize_seed, [], [seed])
        # no negative-prompt box: the 2-NFE student is guidance-distilled
        # (guidance_scale conditions the distilled vector; no CFG pass)
        run.click(generate,
                  [prompt, height, width, nfe, temperature,
                   guidance, seed, batch], [gallery])
    return demo
