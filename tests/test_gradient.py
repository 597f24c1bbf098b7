"""Adjoint correctness: the boundary-saving custom_vjp must reproduce plain
JAX AD through the (memory-hungry) scan, and finite differences.

This replaces the reference's missing gradient tests (the TODO at
`propagator.py:220-224` of the reference) and is the acceptance gate from
BASELINE.md: per-shot gradients to <= 1e-5 relative error in the interior.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sep2023_tpu as st
from sep2023_tpu.ops import misfit as mf
from sep2023_tpu.propagator import propagate_ad


@pytest.fixture(scope="module")
def setup():
    cfg = st.SimConfig(nz=60, nx=70, dz=20.0, dx=20.0, nt=120, dt=0.002,
                       f0=10.0, npml=12)
    key = jax.random.PRNGKey(0)
    vp = 3000.0 + 100.0 * jax.random.normal(key, cfg.grid.shape)
    vs = vp / jnp.sqrt(3.0)
    rho = jnp.full(cfg.grid.shape, 2500.0)
    med = st.Medium(vp, vs, rho)
    lam, mu = med.lam, med.mu
    stf = jnp.asarray(st.ricker(cfg.f0, cfg.nt, cfg.dt))
    geom = st.ShotGeom(src_z=jnp.int32(18), src_x=jnp.int32(30),
                       rxz=jnp.float64(1.0),
                       rec_z=jnp.full(20, 40, jnp.int32),
                       rec_x=jnp.arange(20, 40, dtype=jnp.int32))
    obs = propagate_ad(cfg, lam * 1.02, mu * 0.98, rho, stf, geom)
    return cfg, lam, mu, rho, stf, geom, obs


def _losses(cfg, geom, obs, channels):
    def loss_cv(lam, mu, rho, s):
        return mf.l2_misfit(obs, st.propagate(cfg, lam, mu, rho, s, geom),
                            channels=channels)

    def loss_ad(lam, mu, rho, s):
        return mf.l2_misfit(obs, propagate_ad(cfg, lam, mu, rho, s, geom),
                            channels=channels)

    return loss_cv, loss_ad


@pytest.mark.parametrize("channels", [("ett",), ("pr", "vx", "vz")])
def test_custom_vjp_matches_plain_ad(setup, channels):
    cfg, lam, mu, rho, stf, geom, obs = setup
    loss_cv, loss_ad = _losses(cfg, geom, obs, channels)
    g_cv = jax.jit(jax.grad(loss_cv, argnums=(0, 1, 2, 3)))(lam, mu, rho, stf)
    g_ad = jax.jit(jax.grad(loss_ad, argnums=(0, 1, 2, 3)))(lam, mu, rho, stf)
    # interior shrunk by 2: the averaging chain rules reach 1 cell past the
    # interior mask (same truncation the reference's gated atomicAdd sprays
    # have at the region edge, el_stress.cu:117-121)
    s = 2
    sl = (slice(cfg.npml + s, cfg.nz - cfg.npml - s),
          slice(cfg.npml + s, cfg.nx - cfg.npml - s))
    for name, a, b in zip(("lam", "mu", "rho", "stf"), g_cv, g_ad):
        if name != "stf":
            a, b = a[sl], b[sl]
        scale = np.abs(np.asarray(b)).max() + 1e-30
        rel = np.abs(np.asarray(a - b)).max() / scale
        assert rel < 1e-6, f"{name}: rel err {rel}"


def test_finite_difference(setup):
    """Central finite difference of the misfit along a random interior model
    perturbation must match <grad, v> to ~1e-5 relative."""
    cfg, lam, mu, rho, stf, geom, obs = setup
    loss_cv, _ = _losses(cfg, geom, obs, ("ett",))
    loss_j = jax.jit(loss_cv)
    g = jax.jit(jax.grad(loss_cv, argnums=(0, 1, 2)))(lam, mu, rho, stf)

    mz = jnp.zeros(cfg.grid.shape).at[
        cfg.npml + 2:cfg.nz - cfg.npml - 2,
        cfg.npml + 2:cfg.nx - cfg.npml - 2].set(1.0)
    key = jax.random.PRNGKey(7)
    ks = jax.random.split(key, 3)
    base = (lam, mu, rho)
    for argi, name in enumerate(("lam", "mu", "rho")):
        v = jax.random.normal(ks[argi], base[argi].shape) * mz * base[argi]
        eps = 1e-6
        hi = list(base)
        lo = list(base)
        hi[argi] = base[argi] + eps * v
        lo[argi] = base[argi] - eps * v
        fd = (loss_j(*hi, stf) - loss_j(*lo, stf)) / (2 * eps)
        dot = float(jnp.sum(g[argi] * v))
        rel = abs(float(fd) - dot) / max(abs(dot), 1e-20)
        assert rel < 1e-5, f"{name}: fd={fd} <g,v>={dot} rel={rel}"


def test_adjoint_dot_product(setup):
    """<J v, w> == <v, J^T w> for the seismogram map (lam,mu,rho,stf)->data.

    The JVP side runs through the plain-AD propagator (custom_vjp functions
    reject forward mode), the VJP side through the boundary-saving adjoint —
    so this also cross-checks the two implementations."""
    cfg, lam, mu, rho, stf, geom, obs = setup

    def f_ad(lam_, mu_, rho_, stf_):
        return propagate_ad(cfg, lam_, mu_, rho_, stf_, geom)

    def f(lam_, mu_, rho_, stf_):
        return st.propagate(cfg, lam_, mu_, rho_, stf_, geom)

    key = jax.random.PRNGKey(42)
    ks = jax.random.split(key, 5)
    v = (jax.random.normal(ks[0], lam.shape),
         jax.random.normal(ks[1], mu.shape),
         jax.random.normal(ks[2], rho.shape),
         jax.random.normal(ks[3], stf.shape))
    # restrict the model perturbations to the interior where the custom
    # adjoint is defined
    mz = jnp.zeros(cfg.grid.shape).at[
        cfg.npml + 2:cfg.nz - cfg.npml - 2,
        cfg.npml + 2:cfg.nx - cfg.npml - 2].set(1.0)
    v = (v[0] * mz, v[1] * mz, v[2] * mz, v[3])

    primal, jvp_out = jax.jvp(f_ad, (lam, mu, rho, stf), v)
    w = jax.random.normal(ks[4], primal.shape)
    _, vjp_fn = jax.vjp(f, lam, mu, rho, stf)
    vt = vjp_fn(w)
    lhs = float(jnp.sum(jvp_out * w))
    rhs = float(sum(jnp.sum(a * b) for a, b in zip(v, vt)))
    assert abs(lhs - rhs) / max(abs(lhs), 1e-20) < 1e-6


def test_misfit_value_convention(setup):
    """misfit = 0.5 * sum(res_ett^2) with sample 0 zeroed (libCUFD.cu:410-427,
    776-779)."""
    cfg, lam, mu, rho, stf, geom, obs = setup
    syn = propagate_ad(cfg, lam, mu, rho, stf, geom)
    r = np.array(obs - syn)
    r[..., 0] = 0.0
    expect = 0.5 * np.sum(r[3] ** 2)
    got = float(mf.l2_misfit(obs, syn))
    assert np.isclose(got, expect, rtol=1e-12)
