#!/usr/bin/env bash
# Export the trained FLUX adapter (reference export.sh).
set -e
python export_arcflow_to_diffusers.py configs/flux/arcflux_2nfe_k16.py \
    checkpoints/arcflux_2nfe_k16 exported/arcflow-flux-2steps "$@"
