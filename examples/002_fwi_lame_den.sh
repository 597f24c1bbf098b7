#!/bin/sh
exec python -m sep2023_tpu invert --head lame_rho --exp-name "${1:-/tmp/sep2023/anomaly-lame-den}" --niter "${2:-100}"
