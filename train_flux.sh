#!/usr/bin/env bash
# ArcFlow-FLUX 2-NFE distillation launcher (reference train_flux.sh).
# Multihost TPU slices: run once per host; jax.distributed discovers peers.
set -e
python train.py configs/flux/arcflux_2nfe_k16.py "$@"
