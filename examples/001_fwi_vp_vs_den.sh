#!/bin/sh
exec python -m sep2023_tpu invert --head vp_vs_rho --exp-name "${1:-/tmp/sep2023/anomaly-vp-vs-den}" --niter "${2:-100}"
