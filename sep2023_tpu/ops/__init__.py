from sep2023_tpu.ops import fd, misfit, signal  # noqa: F401
