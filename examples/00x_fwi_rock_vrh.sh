#!/bin/sh
exec python -m sep2023_tpu invert --head rock_vrh --nz 201 --nx 321 --dz 10 --dx 10 --dt 0.001 --nt 4001 --f0 15 \
  --exp-name "${1:-/tmp/sep2023/rock-vrh}" --niter "${2:-50}"
