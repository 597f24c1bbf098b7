"""Twin-experiment integration test: synthesize observed data from a true
model with an anomaly, invert from a smooth init with L-BFGS-B, and require
the loss to collapse and the anomaly to be recovered — the reference's
regression-by-construction strategy (notebooks 001-005)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sep2023_tpu as st
from sep2023_tpu import heads as H
from sep2023_tpu import optimize as opt
from sep2023_tpu import parallel as par
from sep2023_tpu.config import Survey


@pytest.mark.slow
def test_twin_experiment_vp_anomaly(tmp_path):
    npml = 10
    nzp, nxp = 36, 60
    cfg = st.SimConfig(nz=nzp + 2 * npml, nx=nxp + 2 * npml, dz=20.0, dx=20.0,
                       nt=240, dt=0.002, f0=10.0, npml=npml)
    grid = cfg.grid

    vp_bg = 3000.0
    vp_true = np.full((nzp, nxp), vp_bg)
    vp_true[14:22, 24:36] += 300.0  # the anomaly
    vs_true = vp_true / np.sqrt(3.0)
    rho_true = np.full((nzp, nxp), 2500.0)

    survey = Survey(src_z=np.full(4, 2), src_x=np.array([8, 22, 38, 52]),
                    rec_z=np.full(28, 32), rec_x=np.arange(16, 44))
    geoms = par.survey_to_geoms(survey, npml, dtype=jnp.float64)
    stf = jnp.broadcast_to(jnp.asarray(st.ricker(cfg.f0, cfg.nt, cfg.dt)),
                           (4, cfg.nt))

    head = H.vp_vs_rho(grid, dict(vp=vp_true, vs=vs_true, rho=rho_true),
                       mask=H.default_mask(grid, freeze_top_rows=0))
    lam_t, mu_t, rho_t = head.apply(
        {k: jnp.asarray(v) for k, v in
         dict(vp=vp_true, vs=vs_true, rho=rho_true).items()})
    obs = jax.jit(jax.vmap(lambda s, g: st.propagate(
        cfg, lam_t, mu_t, rho_t, s, g)))(stf, geoms)
    w = jnp.ones((4,), jnp.float64)

    loss_data = par.make_local_misfit(cfg, channels=("ett", "vx", "vz"))

    # invert vp only (vs, rho frozen at truth)
    def loss(params):
        lam, mu, rho = head.apply({"vp": params["vp"],
                                   "vs": jnp.asarray(vs_true),
                                   "rho": jnp.asarray(rho_true)})
        return loss_data(lam, mu, rho, stf, geoms, obs, w)

    vp0 = np.full((nzp, nxp), vp_bg)
    obj = opt.ScipyObjective(loss, {"vp": vp0},
                             bounds={"vp": (2500.0, 3800.0)})
    logger = opt.InversionLogger(str(tmp_path), obj)
    f0 = obj.fun(obj.x0)
    res = opt.lbfgsb(obj, maxiter=12, callback=logger, disp=False, iprint=-1)

    assert res.fun < 0.2 * f0, f"loss only {f0} -> {res.fun}"
    vp_inv = np.asarray(obj.unpack(res.x)["vp"])
    # anomaly recovered: mean update inside the anomaly region much larger
    # than outside
    inside = vp_inv[14:22, 24:36].mean() - vp_bg
    outside = np.abs(np.delete((vp_inv - vp_bg).ravel(),
                               np.ravel_multi_index(
                                   np.mgrid[14:22, 24:36].reshape(2, -1),
                                   vp_inv.shape))).mean()
    assert inside > 80.0, f"anomaly mean update {inside}"
    assert inside > 3.0 * outside
    # checkpointing artifacts written
    assert (tmp_path / "loss.txt").exists()
    assert len(list(tmp_path.glob("model_*.npz"))) >= 1


@pytest.mark.slow
def test_twin_experiment_three_parameter(tmp_path):
    """Simultaneous (vp, vs, rho) recovery — the reference's Main-001
    acceptance flow, not the softer vp-only variant."""
    npml = 10
    nzp, nxp = 32, 56
    cfg = st.SimConfig(nz=nzp + 2 * npml, nx=nxp + 2 * npml, dz=20.0,
                       dx=20.0, nt=220, dt=0.002, f0=10.0, npml=npml)
    grid = cfg.grid

    vp_true = np.full((nzp, nxp), 3000.0)
    vp_true[12:20, 22:34] += 300.0
    vs_true = vp_true / np.sqrt(3.0)
    rho_true = np.full((nzp, nxp), 2500.0)
    rho_true[12:20, 22:34] += 150.0

    survey = Survey(src_z=np.full(5, 2), src_x=np.array([6, 18, 28, 38, 50]),
                    rec_z=np.full(32, 28), rec_x=np.arange(12, 44))
    geoms = par.survey_to_geoms(survey, npml, dtype=jnp.float64)
    stf = jnp.broadcast_to(jnp.asarray(st.ricker(cfg.f0, cfg.nt, cfg.dt)),
                           (5, cfg.nt))

    head = H.vp_vs_rho(grid, dict(vp=vp_true, vs=vs_true, rho=rho_true),
                       mask=H.default_mask(grid, freeze_top_rows=0))
    lam_t, mu_t, rho_t = head.apply(
        {k: jnp.asarray(v) for k, v in
         dict(vp=vp_true, vs=vs_true, rho=rho_true).items()})
    obs = jax.jit(jax.vmap(lambda s, g: st.propagate(
        cfg, lam_t, mu_t, rho_t, s, g)))(stf, geoms)
    w = jnp.ones((5,), jnp.float64)

    loss_data = par.make_local_misfit(cfg, channels=("ett", "vx", "vz"))

    def loss(params):
        lam, mu, rho = head.apply(params)
        return loss_data(lam, mu, rho, stf, geoms, obs, w)

    start = {"vp": np.full((nzp, nxp), 3000.0),
             "vs": np.full((nzp, nxp), 3000.0 / np.sqrt(3.0)),
             "rho": np.full((nzp, nxp), 2500.0)}
    obj = opt.ScipyObjective(loss, start,
                             bounds={"vp": (2500.0, 3800.0),
                                     "vs": (1400.0, 2300.0),
                                     "rho": (2300.0, 2900.0)})
    f0 = obj.fun(obj.x0)
    res = opt.lbfgsb(obj, maxiter=25)
    assert res.fun < 0.15 * f0, f"loss only {f0} -> {res.fun}"

    out = obj.unpack(res.x)
    box = np.s_[12:20, 22:34]
    for name, true_m, bg in (("vp", vp_true, 3000.0),
                             ("vs", vs_true, 3000.0 / np.sqrt(3.0))):
        inv = np.asarray(out[name])
        inside = inv[box].mean() - bg
        true_in = true_m[box].mean() - bg
        assert inside > 0.35 * true_in, (name, inside, true_in)


@pytest.mark.slow
def test_bound_active_optimizers_agree(tmp_path):
    """scipy L-BFGS-B (active sets) vs the on-device projected L-BFGS on a
    BOUND-ACTIVE FWI problem: the vp upper bound is set below the true
    anomaly, so the solution rides the bound; both optimizers must land on
    it and agree."""
    npml = 8
    nzp, nxp = 24, 40
    cfg = st.SimConfig(nz=nzp + 2 * npml, nx=nxp + 2 * npml, dz=20.0,
                       dx=20.0, nt=160, dt=0.002, f0=10.0, npml=npml)
    grid = cfg.grid
    vp_true = np.full((nzp, nxp), 3000.0)
    vp_true[9:15, 15:25] += 300.0
    vs_true = vp_true / np.sqrt(3.0)
    rho_true = np.full((nzp, nxp), 2500.0)

    survey = Survey(src_z=np.full(3, 2), src_x=np.array([8, 20, 32]),
                    rec_z=np.full(24, 20), rec_x=np.arange(8, 32))
    geoms = par.survey_to_geoms(survey, npml, dtype=jnp.float64)
    stf = jnp.broadcast_to(jnp.asarray(st.ricker(cfg.f0, cfg.nt, cfg.dt)),
                           (3, cfg.nt))
    head = H.vp_vs_rho(grid, dict(vp=vp_true, vs=vs_true, rho=rho_true),
                       mask=H.default_mask(grid, freeze_top_rows=0))
    lam_t, mu_t, rho_t = head.apply(
        {k: jnp.asarray(v) for k, v in
         dict(vp=vp_true, vs=vs_true, rho=rho_true).items()})
    obs = jax.jit(jax.vmap(lambda s, g: st.propagate(
        cfg, lam_t, mu_t, rho_t, s, g)))(stf, geoms)
    w = jnp.ones((3,), jnp.float64)
    loss_data = par.make_local_misfit(cfg, channels=("ett", "vx", "vz"))

    vp_hi = 3150.0  # BELOW the 3300 m/s anomaly: bound must go active

    def loss(params, stf_, obs_):
        lam, mu, rho = head.apply({"vp": params["vp"],
                                   "vs": jnp.asarray(vs_true),
                                   "rho": jnp.asarray(rho_true)})
        return loss_data(lam, mu, rho, stf_, geoms, obs_, w)

    start = {"vp": np.full((nzp, nxp), 3000.0)}
    bounds = {"vp": (2700.0, vp_hi)}

    obj = opt.ScipyObjective(loss, start, bounds=bounds, aux=(stf, obs))
    res = opt.lbfgsb(obj, maxiter=15)
    vp_sc = np.asarray(obj.unpack(res.x)["vp"])

    params_od, hist = opt.lbfgs_on_device(loss, start, 15, bounds=bounds,
                                          aux=(stf, obs))
    vp_od = np.asarray(params_od["vp"])

    # both respect the box ...
    assert vp_sc.max() <= vp_hi + 1e-6 and vp_od.max() <= vp_hi + 1e-6
    # ... both drive the anomaly onto the active bound ...
    box = np.s_[9:15, 15:25]
    assert vp_sc[box].mean() > 3100.0, vp_sc[box].mean()
    assert vp_od[box].mean() > 3100.0, vp_od[box].mean()
    # ... and agree inside the anomaly to a few percent (projected L-BFGS
    # is an approximation of the true active-set method)
    rel = np.abs(vp_od[box] - vp_sc[box]).mean() / (vp_hi - 3000.0)
    assert rel < 0.15, rel
