#!/bin/sh
# Reference Main-004 workload: 201x321 grid, dx=10 m, dt=1 ms, nt=4001, f0=15 Hz
exec python -m sep2023_tpu invert --head rock_gassmann --nz 201 --nx 321 --dz 10 --dx 10 --dt 0.001 --nt 4001 --f0 15 \
  --exp-name "${1:-/tmp/sep2023/rock-physics}" --niter "${2:-50}"
