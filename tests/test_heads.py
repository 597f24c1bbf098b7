"""Parameterization heads: physics maps, mask blending, differentiability."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sep2023_tpu import heads as H
from sep2023_tpu import rock_physics as rp
from sep2023_tpu.config import Grid


@pytest.fixture
def grid():
    return Grid(nz=40, nx=56, dz=10.0, dx=10.0, npml=8)


def _init(grid, **kw):
    shp = (grid.nz_phys, grid.nx_phys)
    return {k: np.full(shp, v) for k, v in kw.items()}


def test_vp_vs_rho_formula(grid):
    init = _init(grid, vp=3000.0, vs=1500.0, rho=2500.0)
    head = H.vp_vs_rho(grid, init)
    lam, mu, rho = head.apply({k: jnp.asarray(v) for k, v in init.items()})
    assert np.allclose(lam, (3000.0 ** 2 - 2 * 1500.0 ** 2) * 2500.0)
    assert np.allclose(mu, 1500.0 ** 2 * 2500.0)
    assert lam.shape == grid.shape


def test_ip_is_rho_consistency(grid):
    """Impedance head must agree with the velocity head at IP = rho*vp."""
    vp, vs, rho = 3200.0, 1600.0, 2400.0
    h1 = H.vp_vs_rho(grid, _init(grid, vp=vp, vs=vs, rho=rho))
    h2 = H.ip_is_rho(grid, _init(grid, ip=rho * vp, **{"is": rho * vs},
                                 rho=rho))
    p1 = {k: jnp.asarray(np.full((grid.nz_phys, grid.nx_phys), v))
          for k, v in dict(vp=vp, vs=vs, rho=rho).items()}
    p2 = {k: jnp.asarray(np.full((grid.nz_phys, grid.nx_phys), v))
          for k, v in {"ip": rho * vp, "is": rho * vs, "rho": rho}.items()}
    for a, b in zip(h1.apply(p1), h2.apply(p2)):
        assert np.allclose(a, b, rtol=1e-10)


def test_vp_vs_ip_and_is_density(grid):
    vp, vs, rho = 3200.0, 1600.0, 2400.0
    h = H.vp_vs_ip(grid, _init(grid, vp=vp, vs=vs, ip=rho * vp))
    p = {k: jnp.asarray(np.full((grid.nz_phys, grid.nx_phys), v))
         for k, v in dict(vp=vp, vs=vs, ip=rho * vp).items()}
    lam, mu, r = h.apply(p)
    assert np.allclose(r, rho)
    assert np.allclose(mu, rho * vs ** 2, rtol=1e-10)
    h2 = H.vp_vs_is(grid, _init(grid, vp=vp, vs=vs, **{"is": rho * vs}))
    p2 = {k: jnp.asarray(np.full((grid.nz_phys, grid.nx_phys), v))
          for k, v in {"vp": vp, "vs": vs, "is": rho * vs}.items()}
    lam2, mu2, r2 = h2.apply(p2)
    assert np.allclose(r2, rho)
    assert np.allclose(lam2, rho * (vp ** 2 - 2 * vs ** 2), rtol=1e-10)


def test_rock_physics_ranges(grid):
    """Typical sandstone PCS values give plausible velocities."""
    for fn in (rp.pcs_to_lame_vrh, rp.pcs_to_lame_gassmann):
        lam, mu, rho = fn(jnp.asarray(0.2), jnp.asarray(0.3), jnp.asarray(0.9))
        vp = float(jnp.sqrt((lam + 2 * mu) / rho))
        vs = float(jnp.sqrt(mu / rho))
        assert 1500 < vp < 7000, (fn.__name__, vp)
        assert 800 < vs < 4500, (fn.__name__, vs)
        assert 1800 < float(rho) < 2800


def test_mask_freezes_parameters(grid):
    """Where mask = 0 the output equals the reference field and the gradient
    w.r.t. the parameter vanishes (FWI_ops.py:120-122 semantics)."""
    mask = H.default_mask(grid, freeze_top_rows=4)
    init = _init(grid, vp=3000.0, vs=1500.0, rho=2500.0)
    head = H.vp_vs_rho(grid, init, mask=mask)

    def f(vp_phys):
        lam, mu, rho = head.apply({"vp": vp_phys,
                                   "vs": jnp.asarray(init["vs"]),
                                   "rho": jnp.asarray(init["rho"])})
        return jnp.sum(lam)

    g = jax.grad(f)(jnp.asarray(init["vp"]))
    # rows frozen by the mask (top 4 physical rows) have zero gradient
    assert np.allclose(np.asarray(g)[:4, :], 0.0)
    assert np.abs(np.asarray(g)[6:, :]).min() > 0.0


def test_all_heads_constructible(grid):
    inits = {
        "vp_vs_rho": _init(grid, vp=3000.0, vs=1500.0, rho=2500.0),
        "lame_rho": _init(grid, lam=1.125e10, mu=5.625e9, rho=2500.0),
        "ip_is_rho": _init(grid, ip=7.5e6, **{"is": 3.75e6}, rho=2500.0),
        "vp_vs_ip": _init(grid, vp=3000.0, vs=1500.0, ip=7.5e6),
        "vp_vs_is": _init(grid, vp=3000.0, vs=1500.0, **{"is": 3.75e6}),
        "rock_vrh": _init(grid, phi=0.2, cc=0.3, sw=0.9),
        "rock_gassmann": _init(grid, phi=0.2, cc=0.3, sw=0.9),
    }
    assert set(inits) == set(H.HEADS)
    for name, ctor in H.HEADS.items():
        head = ctor(grid, inits[name])
        out = head.apply({k: jnp.asarray(v) for k, v in inits[name].items()})
        for arr in out:
            assert np.isfinite(np.asarray(arr)).all(), name
