#!/bin/sh
# Reference Main-005 (NO-PCS): invert vp/vs/rho directly on rock-physics data
exec python -m sep2023_tpu invert --head vp_vs_rho --model rock --nz 201 --nx 321 --dz 10 --dx 10 --dt 0.001 --nt 4001 --f0 15 \
  --exp-name "${1:-/tmp/sep2023/rock-no-pcs}" --niter "${2:-50}"
