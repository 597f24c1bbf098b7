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


def test_acoustic_pallas_matches_xla():
    """Fused acoustic Pallas forward (3-field variant of the elastic kernel,
    ac_pressure.cu/ac_velocity.cu) must match propagate_acoustic."""
    import jax.numpy as jnp

    from sep2023_tpu.ops import pallas_engine as pe

    npml = 10
    cfg = st.SimConfig(nz=40 + 2 * npml, nx=56 + 2 * npml, dz=20.0, dx=20.0,
                       nt=150, dt=0.002, f0=10.0, npml=npml)
    vp = jnp.full(cfg.grid.shape, 3000.0).at[26:32, 30:44].add(250.0)
    rho = jnp.full(cfg.grid.shape, 2200.0)
    lam = (rho * vp ** 2).astype(jnp.float32)
    rho = rho.astype(jnp.float32)
    rec_z = np.full(24, 32)
    rec_x = np.arange(16, 40)
    src_z = np.array([2, 2])
    src_x = np.array([14, 40])
    stf = jnp.broadcast_to(
        jnp.asarray(st.ricker(cfg.f0, cfg.nt, cfg.dt), jnp.float32),
        (2, cfg.nt))

    rs = pe.check_row_survey(rec_z + npml, rec_x + npml)
    out = np.asarray(pe.forward_pallas_acoustic(
        cfg, rs, lam, rho, stf, src_z + npml, src_x + npml))

    geoms = AcGeom(src_z=jnp.asarray(src_z + npml, jnp.int32),
                   src_x=jnp.asarray(src_x + npml, jnp.int32),
                   rec_z=jnp.broadcast_to(
                       jnp.asarray(rec_z + npml, jnp.int32), (2, 24)),
                   rec_x=jnp.broadcast_to(
                       jnp.asarray(rec_x + npml, jnp.int32), (2, 24)))
    ref = np.asarray(jax.vmap(
        lambda s, g: propagate_acoustic(cfg, lam, rho, s, g))(
            stf, geoms)).astype(np.float32)

    assert out.shape == ref.shape == (2, 3, 24, cfg.nt)
    for c in range(3):
        scale = np.abs(ref[:, c]).max()
        rel = np.abs(out[:, c] - ref[:, c]).max() / scale
        assert rel < 2e-5, (c, rel)


def test_rtm_image_time_locality():
    """The time-derivative imaging condition (image_vel_time.cu) must focus
    energy at a velocity anomaly and carry a consistent sign there."""
    import jax.numpy as jnp

    from sep2023_tpu.imaging import rtm_image_time

    npml = 10
    cfg = st.SimConfig(nz=50 + 2 * npml, nx=60 + 2 * npml, dz=20.0, dx=20.0,
                       nt=300, dt=0.002, f0=10.0, npml=npml)
    vp_bg = jnp.full(cfg.grid.shape, 3000.0)
    az, ax = 42, 40  # anomaly center (padded indices)
    vp_tr = vp_bg.at[az - 3:az + 3, ax - 6:ax + 6].add(300.0)
    rho = jnp.full(cfg.grid.shape, 2200.0)
    geom = AcGeom(src_z=jnp.int32(npml + 2), src_x=jnp.int32(40),
                  rec_z=jnp.full(40, npml + 3, jnp.int32),
                  rec_x=jnp.arange(15, 55, dtype=jnp.int32))
    stf = jnp.asarray(st.ricker(cfg.f0, cfg.nt, cfg.dt))

    obs = propagate_acoustic(cfg, rho * vp_tr ** 2, rho, stf, geom)
    syn = propagate_acoustic(cfg, rho * vp_bg ** 2, rho, stf, geom)
    residual = obs - syn

    img = np.asarray(rtm_image_time(cfg, vp_bg, rho, stf, geom, residual))
    assert img.shape == cfg.grid.shape
    assert np.isfinite(img).all() and np.abs(img).max() > 0

    # locality: mean |image| within the anomaly box dominates the far field
    box = np.zeros(cfg.grid.shape, bool)
    box[az - 5:az + 5, ax - 8:ax + 8] = True
    interior = np.zeros(cfg.grid.shape, bool)
    interior[npml + 8:-npml - 1, npml + 1:-npml - 1] = True  # below receivers
    near = np.abs(img[box & interior]).mean()
    far = np.abs(img[interior & ~box]).mean()
    assert near > 5.0 * far

    # sign: a positive velocity anomaly imaged with residual = obs - syn
    # gives a coherent single-signed peak at the anomaly
    peak = img[az - 3:az + 3, ax - 6:ax + 6]
    dominant = np.sign(peak.ravel()[np.abs(peak).argmax()])
    assert np.sign(peak.sum()) == dominant != 0


def test_acoustic_pallas_gradient_matches_xla():
    """The fused acoustic backward (in-kernel boundary-saving adjoint, the
    counterpart of ac_*_adj.cu) must match propagate_acoustic's custom_vjp
    gradients in lam, rho and stf."""
    import jax.numpy as jnp

    from sep2023_tpu.ops import pallas_engine as pe

    npml = 10
    cfg = st.SimConfig(nz=40 + 2 * npml, nx=56 + 2 * npml, dz=20.0, dx=20.0,
                       nt=141, dt=0.002, f0=10.0, npml=npml)
    vp = jnp.full(cfg.grid.shape, 3000.0).at[28:34, 36:48].add(250.0)
    rho0 = jnp.full(cfg.grid.shape, 2200.0).astype(jnp.float32)
    lam0 = (rho0 * vp ** 2).astype(jnp.float32)
    rec_z = np.full(20, 34)
    rec_x = np.arange(14, 34)
    S = 2
    stf = jnp.broadcast_to(
        jnp.asarray(st.ricker(cfg.f0, cfg.nt, cfg.dt), jnp.float32),
        (S, cfg.nt))
    sz = jnp.asarray(np.array([2, 2]) + npml)
    sx = jnp.asarray(np.array([12, 36]) + npml)
    rzi = jnp.asarray(rec_z + npml, jnp.int32)
    rxi = jnp.asarray(rec_x + npml, jnp.int32)
    rs = pe.check_row_survey(rec_z + npml, rec_x + npml)

    obs = pe.propagate_pallas_acoustic(cfg, rs, lam0 * 1.03, rho0, stf,
                                       sz, sx)

    def loss_pl(l, r, s):
        d = obs - pe.propagate_pallas_acoustic(cfg, rs, l, r, s, sz, sx)
        return 0.5 * jnp.sum(d * d)

    def loss_xla(l, r, s):
        geoms = AcGeom(src_z=sz, src_x=sx,
                       rec_z=jnp.broadcast_to(rzi, (S, 20)),
                       rec_x=jnp.broadcast_to(rxi, (S, 20)))
        syn = jax.vmap(lambda s1, g: propagate_acoustic(cfg, l, r, s1, g))(
            s, geoms)
        d = obs - syn
        return 0.5 * jnp.sum(d * d)

    gp = jax.grad(loss_pl, argnums=(0, 1, 2))(lam0, rho0, stf)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(lam0, rho0, stf)
    sl = (slice(npml + 2, cfg.nz - npml - 2),
          slice(npml + 2, cfg.nx - npml - 2))
    for name, a, b in zip(("lam", "rho", "stf"), gp, gx):
        a, b = np.asarray(a), np.asarray(b)
        if a.shape == cfg.grid.shape:
            a, b = a[sl], b[sl]
        rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-30)
        assert rel < 5e-5, (name, rel)
