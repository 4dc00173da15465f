#!/usr/bin/env bash
# ArcFlow-Qwen-Image 2-NFE distillation launcher (reference train_qwen.sh).
set -e
python train.py configs/qwen/arcqwen_2nfe_k16.py "$@"
