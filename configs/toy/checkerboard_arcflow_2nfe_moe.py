"""2-D checkerboard ArcFlow distillation with an expert-choice MoE student
trunk — the trained MoE/EP path at toy scale.

Same schedule as ``checkerboard_arcflow_2nfe.py``; the student's mid-trunk
FFN is the expert-choice ``MoEFeedForward`` the DiT joint blocks use
(params under a ``moe`` scope, so the EP placement and partitions address
them by path).  Quality-gated by
``tests/test_quantized_quality.py::test_moe_student_distillation_quality``.
"""

_base_ = ['./checkerboard_arcflow_2nfe.py']

name = 'checkerboard_arcflow_2nfe_moe'

model = dict(
    diffusion=dict(
        denoising=dict(
            moe_experts=4,
            moe_capacity_factor=2.0)))
