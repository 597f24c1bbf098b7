"""Test configuration: force CPU with a virtual 8-device mesh (for sharding
tests) and enable float64 (for adjoint / finite-difference accuracy).

Must run before jax is imported anywhere.

SEP2023_TPU_TPU_TESTS=1 flips the suite onto the REAL TPU backend instead
(float32, no virtual mesh) for the `tpu`-marked compiled-kernel equality
tests (tests/test_tpu.py) — the on-hardware Mosaic regression gate.
"""
import os

TPU_MODE = os.environ.get("SEP2023_TPU_TPU_TESTS") == "1"

if not TPU_MODE:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    _flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not TPU_MODE:
    # The axon sitecustomize pins JAX_PLATFORMS=axon (real TPU); tests run
    # on a virtual 8-device CPU mesh, so override before the backend
    # initializes.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

# persistent compile cache: the suite's big scans recompile identically on
# every run; repeat runs (CI, review) skip those compiles
from sep2023_tpu.cli import enable_compile_cache  # noqa: E402

enable_compile_cache()


def pytest_collection_modifyitems(config, items):
    import pytest

    if TPU_MODE:
        skip = pytest.mark.skip(reason="TPU mode runs only tpu-marked tests")
        for it in items:
            if "tpu" not in it.keywords:
                it.add_marker(skip)
    else:
        skip = pytest.mark.skip(
            reason="compiled-kernel test: run with SEP2023_TPU_TPU_TESTS=1 "
                   "on real TPU hardware")
        for it in items:
            if "tpu" in it.keywords:
                it.add_marker(skip)
