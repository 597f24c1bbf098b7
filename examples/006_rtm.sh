#!/bin/bash
# Reverse-time migration twin experiment — the standalone CLI's adjoint
# imaging flow (reference: main.cu:322+ withAdj, image_vel_time.cu).
# Observed data from a layered true model is migrated with a smooth
# background; the muted image peaks at the reflector.
set -e
python -m sep2023_tpu rtm --out scratch/rtm/rtm_image.npz "$@"
python -m sep2023_tpu rtm --physics elastic \
    --out scratch/rtm/rtm_image_elastic.npz "$@"
