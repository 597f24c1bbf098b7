#!/bin/sh
# Reference Main-000: 101x201 grid, 19 shots, nt=1501 observed-data generation
exec python -m sep2023_tpu forward --data-dir "${1:-/tmp/sep2023/Data}"
