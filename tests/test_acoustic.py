"""Acoustic propagator: forward sanity + boundary-saving adjoint vs plain AD."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sep2023_tpu as st
from sep2023_tpu.acoustic import (AcGeom, propagate_acoustic,
                                  propagate_acoustic_ad)


@pytest.fixture(scope="module")
def setup():
    cfg = st.SimConfig(nz=60, nx=70, dz=20.0, dx=20.0, nt=120, dt=0.002,
                       f0=10.0, npml=12)
    key = jax.random.PRNGKey(3)
    vp = 3000.0 + 100.0 * jax.random.normal(key, cfg.grid.shape)
    rho = jnp.full(cfg.grid.shape, 2500.0)
    lam = rho * vp ** 2
    stf = jnp.asarray(st.ricker(cfg.f0, cfg.nt, cfg.dt))
    geom = AcGeom(src_z=jnp.int32(18), src_x=jnp.int32(30),
                  rec_z=jnp.full(16, 40, jnp.int32),
                  rec_x=jnp.arange(22, 38, dtype=jnp.int32))
    return cfg, lam, rho, stf, geom


def test_forward_finite_and_absorbing(setup):
    cfg, lam, rho, stf, geom = setup
    # absorption check needs the wave to traverse and exit: run longer
    cfg_long = st.SimConfig(nz=cfg.nz, nx=cfg.nx, dz=cfg.dz, dx=cfg.dx,
                            nt=500, dt=cfg.dt, f0=cfg.f0, npml=cfg.npml)
    stf_long = jnp.asarray(st.ricker(cfg.f0, cfg_long.nt, cfg.dt))
    data = np.asarray(propagate_acoustic(cfg_long, lam, rho, stf_long, geom))
    assert data.shape == (3, 16, cfg_long.nt)
    assert np.isfinite(data).all()
    p = np.abs(data[0, 0])
    assert p[-10:].max() < 0.05 * p.max()


def test_acoustic_adjoint_matches_ad(setup):
    cfg, lam, rho, stf, geom = setup
    obs = propagate_acoustic_ad(cfg, lam * 1.03, rho, stf, geom)

    def loss(fn, lam_, rho_, stf_):
        r = obs - fn(cfg, lam_, rho_, stf_, geom)
        r = r.at[..., 0].set(0.0)
        return 0.5 * jnp.sum(r * r)

    g_cv = jax.jit(jax.grad(lambda *a: loss(propagate_acoustic, *a),
                            argnums=(0, 1, 2)))(lam, rho, stf)
    g_ad = jax.jit(jax.grad(lambda *a: loss(propagate_acoustic_ad, *a),
                            argnums=(0, 1, 2)))(lam, rho, stf)
    s = 4
    sl = (slice(cfg.npml + s, cfg.nz - cfg.npml - s),
          slice(cfg.npml + s, cfg.nx - cfg.npml - s))
    for name, a, b in zip(("lam", "rho", "stf"), g_cv, g_ad):
        if name != "stf":
            a, b = a[sl], b[sl]
        scale = np.abs(np.asarray(b)).max() + 1e-30
        rel = np.abs(np.asarray(a - b)).max() / scale
        assert rel < 1e-6, f"{name}: rel err {rel}"
