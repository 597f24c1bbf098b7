"""RTM imaging + parameterization chain rules."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sep2023_tpu as st
from sep2023_tpu import imaging
from sep2023_tpu.propagator import propagate_ad


def test_lame_to_velocity_chain_rule():
    """Chain rule must match jax.vjp through the lame map."""
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    shp = (8, 9)
    vp = 3000.0 + 100 * jax.random.normal(ks[0], shp)
    vs = 1500.0 + 50 * jax.random.normal(ks[1], shp)
    rho = 2500.0 + 100 * jax.random.normal(ks[2], shp)
    g_lam = jax.random.normal(ks[3], shp)
    g_mu = jax.random.normal(ks[4], shp)
    g_rho = jax.random.normal(ks[5], shp)

    def lame(vp_, vs_, rho_):
        return (vp_ ** 2 - 2 * vs_ ** 2) * rho_, vs_ ** 2 * rho_, rho_

    _, vjp = jax.vjp(lame, vp, vs, rho)
    ref = vjp((g_lam, g_mu, g_rho))
    got = imaging.lame_grads_to_velocity(g_lam, g_mu, g_rho, vp, vs, rho)
    for a, b in zip(got, ref):
        assert np.allclose(np.asarray(a), np.asarray(b), rtol=1e-12)


def test_rtm_image_focuses_on_reflector():
    """An RTM image from data with a reflector the background model lacks
    must light up near the reflector depth."""
    npml = 10
    cfg = st.SimConfig(nz=56 + 2 * npml, nx=72 + 2 * npml, dz=20.0, dx=20.0,
                       nt=220, dt=0.002, f0=12.0, npml=npml)
    vp_bg = jnp.full(cfg.grid.shape, 3000.0)
    vs_bg = vp_bg / jnp.sqrt(3.0)
    rho = jnp.full(cfg.grid.shape, 2500.0)
    z_refl = npml + 36
    vp_tr = vp_bg.at[z_refl:, :].add(150.0)
    vs_tr = vp_tr / jnp.sqrt(3.0)

    stf = jnp.asarray(st.ricker(cfg.f0, cfg.nt, cfg.dt))
    geom = st.ShotGeom(src_z=jnp.int32(npml + 2), src_x=jnp.int32(npml + 36),
                       rxz=jnp.float64(1.0),
                       rec_z=jnp.full(40, npml + 2, jnp.int32),
                       rec_x=jnp.arange(npml + 16, npml + 56, dtype=jnp.int32))
    lam_tr = (vp_tr ** 2 - 2 * vs_tr ** 2) * rho
    obs = propagate_ad(cfg, lam_tr, vs_tr ** 2 * rho, rho, stf, geom)

    # zero residual -> exactly zero image
    syn_bg = propagate_ad(cfg, (vp_bg ** 2 - 2 * vs_bg ** 2) * rho,
                          vs_bg ** 2 * rho, rho, stf, geom)
    img0 = np.asarray(imaging.rtm_image(cfg, vp_bg, vs_bg, rho, stf, geom,
                                        syn_bg, channels=("pr", "vx", "vz")))
    assert np.abs(img0).max() == 0.0

    img = np.asarray(imaging.rtm_image(cfg, vp_bg, vs_bg, rho, stf, geom,
                                       obs, channels=("pr", "vx", "vz")))
    prof = np.abs(img[:, npml + 10:cfg.nx - npml - 10]).mean(axis=1)
    z_peak = int(prof.argmax())
    # the image localizes the interface to within ~one wavelength
    # (vp/f0 = 250 m = 12.5 cells), smeared updip as a gradient is
    assert abs(z_peak - z_refl) < 13, (z_peak, z_refl)
    # shallow quarter carries little energy compared to the peak
    assert prof[npml:npml + 14].max() < 0.25 * prof[z_peak]
