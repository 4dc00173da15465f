"""ArcFlow-FLUX 2-NFE distillation with an int8 FROZEN trunk.

Same recipe as ``arcflux_2nfe_k16.py``; the shared frozen teacher/student
trunk stores its big kernels per-output-channel int8 (a one-time init
transform — the trunk never updates), halving frozen HBM vs bf16 and
roughly doubling the on-chip trainable scale (``bench.py --train
--frozen-int8`` measures 6.65 B tied teacher+student on one 16 GB chip).
Gradients flow through the dequantized dots into the fp32 adapter.

Quality gate:
``tests/test_quantized_quality.py::test_int8_teacher_distillation_quality``
holds the int8-teacher-distilled student within 0.08 in-support of the
bf16-teacher run on the toy stack.
"""

_base_ = ['./arcflux_2nfe_k16.py']

name = 'arcflux_2nfe_k16_int8trunk'

model = dict(
    frozen_dtype='bfloat16',
    frozen_quant='int8')

work_dir = f'work_dirs/{name}'
