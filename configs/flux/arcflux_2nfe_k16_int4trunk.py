"""ArcFlow-FLUX 2-NFE distillation with an int4 FROZEN trunk.

Same recipe as ``arcflux_2nfe_k16.py``; the shared frozen teacher/student
trunk stores its big kernels nibble-packed group-128 int4 (a one-time
init transform — the trunk never updates), quartering frozen HBM vs bf16.
Gradients flow through the dequantized dots into the fp32 adapter
unchanged (the weight-only matmul is differentiable w.r.t. activations).

Use when trunk HBM is the binding constraint (e.g. serving-class chips);
on the 16 GB bench chip the measured trainable scale matches int8 (the
binding term there is program temps, not the trunk — see README
"Training throughput") and the group-wise dequant costs ~26% per step,
so ``arcflux_2nfe_k16_int8trunk.py`` remains the default quantized-trunk
recipe.

Quality gate:
``tests/test_quantized_quality.py::test_int4_teacher_distillation_quality``
holds the int4-teacher-distilled student within 0.10 in-support of the
bf16-teacher run on the toy stack.
"""

_base_ = ['./arcflux_2nfe_k16.py']

name = 'arcflux_2nfe_k16_int4trunk'

model = dict(
    frozen_dtype='bfloat16',
    frozen_quant='int4',
    frozen_quant_group_size=128)

work_dir = f'work_dirs/{name}'
