"""Multi-chip shot sharding on a virtual 8-device CPU mesh: the sharded
misfit/gradient must equal the single-device result (replacing the
reference's implicitly-tested multi-GPU path, Torch_Fwi.cpp:71-101)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sep2023_tpu as st
from sep2023_tpu import parallel as par
from sep2023_tpu.config import Survey
from sep2023_tpu.propagator import propagate_ad


@pytest.fixture(scope="module")
def problem():
    cfg = st.SimConfig(nz=44, nx=52, dz=20.0, dx=20.0, nt=60, dt=0.002,
                       f0=10.0, npml=8)
    vp = jnp.full(cfg.grid.shape, 3000.0)
    med = st.Medium(vp, vp / jnp.sqrt(3.0), jnp.full_like(vp, 2500.0))
    lam, mu, rho = med.lam, med.mu, med.rho

    survey = Survey(src_z=np.full(8, 4), src_x=np.arange(4, 36, 4),
                    rec_z=np.full(12, 24), rec_x=np.arange(8, 32, 2))
    geoms = par.survey_to_geoms(survey, cfg.npml, dtype=lam.dtype)
    stf = jnp.broadcast_to(jnp.asarray(st.ricker(cfg.f0, cfg.nt, cfg.dt)),
                           (8, cfg.nt))
    # observed data from a perturbed model
    obs = jax.vmap(lambda s, g: propagate_ad(
        cfg, lam * 1.05, mu, rho, s, g))(stf, geoms)
    w = jnp.ones((8,), lam.dtype)
    return cfg, lam, mu, rho, stf, geoms, obs, w


def test_sharded_matches_local(problem):
    cfg, lam, mu, rho, stf, geoms, obs, w = problem
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    mesh = par.shot_mesh(8)
    loss_sh = par.make_sharded_misfit(cfg, mesh)
    loss_lo = par.make_local_misfit(cfg)

    args = (lam, mu, rho, stf, geoms, obs, w)
    f_sh = float(jax.jit(loss_sh)(*args))
    f_lo = float(jax.jit(loss_lo)(*args))
    assert np.isclose(f_sh, f_lo, rtol=1e-10)

    g_sh = jax.jit(jax.grad(loss_sh, argnums=(0, 1, 2)))(*args)
    g_lo = jax.jit(jax.grad(loss_lo, argnums=(0, 1, 2)))(*args)
    for a, b in zip(g_sh, g_lo):
        scale = np.abs(np.asarray(b)).max() + 1e-30
        # psum tree-reduction order differs from a sequential sum
        assert np.abs(np.asarray(a - b)).max() / scale < 1e-8


def test_dd_2d_mesh_matches_local(problem):
    """Shot x spatial-domain 2-D mesh (GSPMD halo exchanges) must reproduce
    the single-device misfit and gradients."""
    cfg, lam, mu, rho, stf, geoms, obs, w = problem
    sl = lambda a: a[:4]
    stf4, geoms4, obs4, w4 = sl(stf), jax.tree.map(sl, geoms), sl(obs), sl(w)
    mesh2 = par.mesh_2d(4, 2)
    loss_dd = par.make_dd_misfit(cfg, mesh2)
    loss_lo = par.make_local_misfit(cfg)
    args = (lam, mu, rho, stf4, geoms4, obs4, w4)
    f_dd = float(jax.jit(loss_dd)(*args))
    f_lo = float(jax.jit(loss_lo)(*args))
    assert np.isclose(f_dd, f_lo, rtol=1e-9)
    g_dd = jax.jit(jax.grad(loss_dd, argnums=(0, 1, 2)))(*args)
    g_lo = jax.jit(jax.grad(loss_lo, argnums=(0, 1, 2)))(*args)
    for a, b in zip(g_dd, g_lo):
        scale = np.abs(np.asarray(b)).max() + 1e-30
        assert np.abs(np.asarray(a - b)).max() / scale < 1e-8


def test_pad_shots_zero_weight(problem):
    cfg, lam, mu, rho, stf, geoms, obs, w = problem
    # drop to 5 shots, pad back to 8: padded loss must equal the 5-shot loss
    sl = lambda a: a[:5]
    stf5, geoms5, obs5, w5 = sl(stf), jax.tree.map(sl, geoms), sl(obs), sl(w)
    stf_p, geoms_p, obs_p, w_p = par.pad_shots(stf5, geoms5, obs5, w5, 8)
    assert stf_p.shape[0] == 8 and float(jnp.sum(w_p)) == 5.0
    loss = par.make_local_misfit(cfg)
    f5 = float(loss(lam, mu, rho, stf5, geoms5, obs5, w5))
    fp = float(loss(lam, mu, rho, stf_p, geoms_p, obs_p, w_p))
    assert np.isclose(f5, fp, rtol=1e-12)
