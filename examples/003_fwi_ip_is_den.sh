#!/bin/sh
exec python -m sep2023_tpu invert --head ip_is_rho --exp-name "${1:-/tmp/sep2023/anomaly-ip-is-den}" --niter "${2:-100}"
