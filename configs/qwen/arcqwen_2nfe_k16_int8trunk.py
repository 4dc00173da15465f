"""ArcFlow-Qwen-Image 2-NFE distillation with an int8 FROZEN trunk.

Same recipe as ``arcqwen_2nfe_k16.py``; the shared frozen teacher/student
trunk stores its big kernels per-output-channel int8 (a one-time init
transform — the trunk never updates), halving frozen HBM vs bf16
(``bench.py --train --qwen --frozen-int8`` measures 6.11 B tied
teacher+student at 17 joint blocks on one 16 GB chip; the full 60-block
step is AOT-audited at the v5p-8 mesh, AOT_20B.json). Gradients flow
through the dequantized dots into the fp32 adapter.

Quality gate:
``tests/test_quantized_quality.py::test_int8_teacher_distillation_quality``
holds the int8-teacher-distilled student within 0.08 in-support of the
bf16-teacher run on the toy stack.
"""

_base_ = ['./arcqwen_2nfe_k16.py']

name = 'arcqwen_2nfe_k16_int8trunk'

model = dict(
    frozen_dtype='bfloat16',
    frozen_quant='int8')

work_dir = f'work_dirs/{name}'
