"""CLI driver pieces (geometry scaling regression, arg validation)."""
import numpy as np
import pytest

from sep2023_tpu.cli import benchmark_problem


def test_benchmark_problem_receivers_in_bounds():
    """Receiver row must stay inside the physical grid for any nz — jnp
    gathers silently clamp out-of-range indices, which produced zero data
    and a zero misfit for small test grids (regression)."""
    for nz in (51, 101, 201):
        cfg, survey, geoms, stf = benchmark_problem(nz=nz, nx=81, nt=16)
        assert survey.rec_z.max() < nz
        assert survey.rec_z.min() > 0
        assert survey.rec_x.max() < 81
        assert int(geoms.rec_z.max()) < cfg.nz - cfg.npml
        assert stf.shape == (survey.n_shots, 16)


def test_benchmark_problem_reference_shape():
    """Default workload matches the reference benchmark (Main-000): 19 shots,
    181 receivers at z=95, padded grid 165x265."""
    cfg, survey, geoms, stf = benchmark_problem()
    assert survey.n_shots == 19
    assert survey.n_rec == 181
    assert int(survey.rec_z[0]) == 95
    assert (cfg.nz, cfg.nx) == (165, 265)
    assert cfg.nt == 1501
