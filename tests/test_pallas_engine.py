"""Fused Pallas engine vs XLA engine (interpret mode on CPU; the same kernel
compiles via Mosaic on real TPU — cross-checked by bench.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sep2023_tpu as st
from sep2023_tpu import parallel
from sep2023_tpu.config import Survey
from sep2023_tpu.ops import pallas_engine as pe


def test_check_row_survey():
    assert pe.check_row_survey(np.full(5, 7), np.arange(3, 8)) == \
        pe.RowSurvey(7, 3, 5)
    assert pe.check_row_survey(np.array([7, 8]), np.array([3, 4])) is None
    assert pe.check_row_survey(np.array([7, 7]), np.array([3, 5])) is None


def test_pallas_matches_xla_engine():
    npml = 10
    cfg = st.SimConfig(nz=44 + 2 * npml, nx=60 + 2 * npml, dz=20.0, dx=20.0,
                       nt=260, dt=0.002, f0=10.0, npml=npml)
    vp, vs = 3000.0, 3000.0 / np.sqrt(3.0)
    vp_a = jnp.full(cfg.grid.shape, vp).at[30:38, 40:52].add(250.0)
    med = st.Medium(vp_a, vp_a / jnp.sqrt(3.0),
                    jnp.full(cfg.grid.shape, 2500.0))
    lam = med.lam.astype(jnp.float32)
    mu = med.mu.astype(jnp.float32)
    rho = med.rho.astype(jnp.float32)

    survey = Survey(src_z=np.array([2, 2]), src_x=np.array([14, 40]),
                    rec_z=np.full(24, 38), rec_x=np.arange(16, 40))
    geoms = parallel.survey_to_geoms(survey, npml, dtype=jnp.float32)
    stf = jnp.broadcast_to(
        jnp.asarray(st.ricker(cfg.f0, cfg.nt, cfg.dt), jnp.float32),
        (2, cfg.nt))

    rs = pe.check_row_survey(survey.rec_z + npml, survey.rec_x + npml)
    out = np.asarray(pe.forward_pallas(
        cfg, rs, lam, mu, rho, stf, survey.src_z + npml,
        survey.src_x + npml, survey.src_rxz))

    fwd = jax.jit(lambda *a: jax.vmap(
        lambda s, g: st.propagate(cfg, a[0], a[1], a[2], s, g))(a[3], a[4]))
    ref = np.asarray(fwd(lam, mu, rho, stf, geoms)).astype(np.float32)

    assert out.shape == ref.shape
    for c in range(4):
        scale = np.abs(ref[:, c]).max()
        rel = np.abs(out[:, c] - ref[:, c]).max() / scale
        assert rel < 2e-5, (c, rel)


def test_pallas_misfit_shot_chunking():
    """make_pallas_misfit must give identical loss/grads regardless of
    shot_chunk (the strip-memory bound)."""
    from sep2023_tpu import parallel as par

    npml = 10
    cfg = st.SimConfig(nz=40 + 2 * npml, nx=56 + 2 * npml, dz=20.0, dx=20.0,
                       nt=100, dt=0.002, f0=10.0, npml=npml)
    vp = jnp.full(cfg.grid.shape, 3000.0)
    med = st.Medium(vp, vp / jnp.sqrt(3.0), jnp.full(cfg.grid.shape, 2500.0))
    lam = med.lam.astype(jnp.float32)
    mu = med.mu.astype(jnp.float32)
    rho = med.rho.astype(jnp.float32)
    survey = Survey(src_z=np.full(4, 2), src_x=np.array([10, 20, 30, 40]),
                    rec_z=np.full(12, 30), rec_x=np.arange(14, 26))
    stf = jnp.broadcast_to(
        jnp.asarray(st.ricker(cfg.f0, cfg.nt, cfg.dt), jnp.float32),
        (4, cfg.nt))
    rs = pe.check_row_survey(survey.rec_z + npml, survey.rec_x + npml)
    obs = pe.forward_pallas(cfg, rs, lam * 1.02, mu, rho, stf,
                            survey.src_z + npml, survey.src_x + npml,
                            survey.src_rxz)
    w = jnp.ones((4,), jnp.float32)
    l_all = par.make_pallas_misfit(cfg, survey)
    l_chk = par.make_pallas_misfit(cfg, survey, shot_chunk=2)
    args = (lam, mu, rho, stf, obs, w)
    assert np.isclose(float(l_all(*args)), float(l_chk(*args)), rtol=1e-6)
    g1 = jax.grad(l_all)(*args)
    g2 = jax.grad(l_chk)(*args)
    scale = np.abs(np.asarray(g1)).max()
    assert np.abs(np.asarray(g1 - g2)).max() / scale < 1e-6


def test_pallas_matches_xla_nontrivial_rxz():
    """Anisotropic source moment ratio (rxz != 1, the crosswell borehole
    source of utilities.cu:537) must agree across engines."""
    npml = 10
    cfg = st.SimConfig(nz=40 + 2 * npml, nx=56 + 2 * npml, dz=20.0, dx=20.0,
                       nt=120, dt=0.002, f0=10.0, npml=npml)
    vp = jnp.full(cfg.grid.shape, 3000.0)
    med = st.Medium(vp, vp / jnp.sqrt(3.0), jnp.full(cfg.grid.shape, 2500.0))
    lam = med.lam.astype(jnp.float32)
    mu = med.mu.astype(jnp.float32)
    rho = med.rho.astype(jnp.float32)
    survey = Survey(src_z=np.array([12]), src_x=np.array([28]),
                    rec_z=np.full(16, 30), rec_x=np.arange(14, 30),
                    src_rxz=np.array([3.0]))
    geoms = parallel.survey_to_geoms(survey, npml, dtype=jnp.float32)
    stf = jnp.broadcast_to(
        jnp.asarray(st.ricker(cfg.f0, cfg.nt, cfg.dt), jnp.float32),
        (1, cfg.nt))
    rs = pe.check_row_survey(survey.rec_z + npml, survey.rec_x + npml)
    out = np.asarray(pe.forward_pallas(
        cfg, rs, lam, mu, rho, stf, survey.src_z + npml,
        survey.src_x + npml, survey.src_rxz))
    ref = np.asarray(jax.vmap(lambda s, g: st.propagate(
        cfg, lam, mu, rho, s, g))(stf, geoms)).astype(np.float32)
    for c in range(4):
        scale = np.abs(ref[:, c]).max()
        assert np.abs(out[:, c] - ref[:, c]).max() / scale < 2e-5


def test_pallas_gradient_matches_xla_engine():
    """The in-kernel boundary-saving adjoint (propagate_pallas) must match
    the XLA engine's custom_vjp gradients (both f32, interpret mode)."""
    from sep2023_tpu.ops import misfit as mf

    npml = 10
    # nt=141: (nt-1) % STRIP_CHUNK != 0 — regression for the strip-buffer
    # sizing (a partial final chunk once wrote past the buffer)
    cfg = st.SimConfig(nz=40 + 2 * npml, nx=56 + 2 * npml, dz=20.0, dx=20.0,
                       nt=141, dt=0.002, f0=10.0, npml=npml)
    vp_a = jnp.full(cfg.grid.shape, 3000.0).at[28:34, 36:48].add(250.0)
    med = st.Medium(vp_a, vp_a / jnp.sqrt(3.0),
                    jnp.full(cfg.grid.shape, 2500.0))
    lam = med.lam.astype(jnp.float32)
    mu = med.mu.astype(jnp.float32)
    rho = med.rho.astype(jnp.float32)
    survey = Survey(src_z=np.array([2, 2]), src_x=np.array([12, 36]),
                    rec_z=np.full(20, 34), rec_x=np.arange(14, 34))
    geoms = parallel.survey_to_geoms(survey, npml, dtype=jnp.float32)
    stf = jnp.broadcast_to(
        jnp.asarray(st.ricker(cfg.f0, cfg.nt, cfg.dt), jnp.float32),
        (2, cfg.nt))
    rs = pe.check_row_survey(survey.rec_z + npml, survey.rec_x + npml)
    sz = jnp.asarray(survey.src_z + npml)
    sx = jnp.asarray(survey.src_x + npml)
    rz = jnp.asarray(survey.src_rxz)

    obs = pe.forward_pallas(cfg, rs, lam * 1.03, mu, rho, stf, sz, sx, rz)

    def loss_pal(l, m, r, s):
        return mf.l2_misfit(obs, pe.propagate_pallas(
            cfg, rs, l, m, r, s, sz, sx, rz))

    def loss_xla(l, m, r, s):
        syn = jax.vmap(lambda si, g: st.propagate(cfg, l, m, r, si, g))(
            s, geoms)
        return mf.l2_misfit(obs, syn)

    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3))(lam, mu, rho, stf)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(lam, mu, rho, stf)
    m = 2
    sl = (slice(npml + m, cfg.nz - npml - m),
          slice(npml + m, cfg.nx - npml - m))
    for name, a, b in zip(("lam", "mu", "rho", "stf"), g_pal, g_xla):
        if name != "stf":
            a, b = a[sl], b[sl]
        scale = np.abs(np.asarray(b)).max() + 1e-30
        rel = np.abs(np.asarray(a - b)).max() / scale
        assert rel < 5e-4, (name, rel)


def _mini_medium(cfg, dtype=jnp.float32):
    vp_a = jnp.full(cfg.grid.shape, 3000.0).at[26:32, 30:44].add(220.0)
    med = st.Medium(vp_a, vp_a / jnp.sqrt(3.0),
                    jnp.full(cfg.grid.shape, 2500.0))
    return (med.lam.astype(dtype), med.mu.astype(dtype),
            med.rho.astype(dtype))


def _xla_fwd(cfg, lam, mu, rho, stf, geoms):
    f = jax.jit(lambda *a: jax.vmap(
        lambda s, g: st.propagate(cfg, a[0], a[1], a[2], s, g))(a[3], a[4]))
    return np.asarray(f(lam, mu, rho, stf, geoms)).astype(np.float32)


def _assert_close(out, ref, tol, grad=False):
    for c in range(4):
        scale = np.abs(ref[:, c]).max()
        if scale == 0:
            continue
        rel = np.abs(out[:, c] - ref[:, c]).max() / scale
        assert rel < tol, (c, rel)


def test_pallas_ezz_channel_matches_xla():
    """Vertical-fiber strain recording (recording_ezz, utilities.cu:620-641)
    on the fused engine."""
    npml = 10
    cfg = st.SimConfig(nz=40 + 2 * npml, nx=56 + 2 * npml, dz=20.0, dx=20.0,
                       nt=120, dt=0.002, f0=10.0, npml=npml,
                       das_channel="ezz")
    lam, mu, rho = _mini_medium(cfg)
    survey = Survey(src_z=np.array([2, 2]), src_x=np.array([14, 40]),
                    rec_z=np.full(20, 32), rec_x=np.arange(16, 36))
    geoms = parallel.survey_to_geoms(survey, npml, dtype=jnp.float32)
    stf = jnp.broadcast_to(
        jnp.asarray(st.ricker(cfg.f0, cfg.nt, cfg.dt), jnp.float32),
        (2, cfg.nt))
    plan = pe.plan_fast_path(cfg, survey.rec_z + npml, survey.rec_x + npml)
    assert plan is not None and not plan.transposed
    out = np.asarray(pe.propagate_pallas_plan(
        plan, lam, mu, rho, stf, jnp.asarray(survey.src_z + npml),
        jnp.asarray(survey.src_x + npml), jnp.asarray(survey.src_rxz)))
    ref = _xla_fwd(cfg, lam, mu, rho, stf, geoms)
    _assert_close(out, ref, 2e-5)


def test_pallas_column_survey_transposed_matches_xla():
    """Borehole / crosswell column receivers (constant x, contiguous z) run
    on the transposed grid — incl. a nontrivial source moment ratio, whose
    transposed source is stf*rxz with ratio 1/rxz."""
    npml = 10
    cfg = st.SimConfig(nz=40 + 2 * npml, nx=56 + 2 * npml, dz=20.0, dx=10.0,
                       nt=120, dt=0.002, f0=10.0, npml=npml)
    lam, mu, rho = _mini_medium(cfg)
    survey = Survey(src_z=np.array([6, 20]), src_x=np.array([6, 6]),
                    rec_z=np.arange(8, 34), rec_x=np.full(26, 48),
                    src_rxz=np.array([1.0, 3.0]))
    geoms = parallel.survey_to_geoms(survey, npml, dtype=jnp.float32)
    stf = jnp.broadcast_to(
        jnp.asarray(st.ricker(cfg.f0, cfg.nt, cfg.dt), jnp.float32),
        (2, cfg.nt))
    plan = pe.plan_fast_path(cfg, survey.rec_z + npml, survey.rec_x + npml)
    assert plan is not None and plan.transposed
    out = np.asarray(pe.propagate_pallas_plan(
        plan, lam, mu, rho, stf, jnp.asarray(survey.src_z + npml),
        jnp.asarray(survey.src_x + npml), jnp.asarray(survey.src_rxz)))
    ref = _xla_fwd(cfg, lam, mu, rho, stf, geoms)
    _assert_close(out, ref, 2e-5)


def _arc_fiber_problem():
    from sep2023_tpu import das

    npml = 10
    cfg = st.SimConfig(nz=40 + 2 * npml, nx=56 + 2 * npml, dz=10.0, dx=10.0,
                       nt=120, dt=0.001, f0=15.0, npml=npml,
                       das_channel="weighted")
    cable = das.arc_fiber(80.0, 2.0 / np.pi, center=(260.0, 200.0, 0.0))
    rec_z, rec_x, das_w = das.cable_to_receivers(cable, cfg.dx, cfg.dz)
    survey = Survey(src_z=np.array([2, 2]), src_x=np.array([14, 40]),
                    rec_z=rec_z, rec_x=rec_x)
    stf = jnp.broadcast_to(
        jnp.asarray(st.ricker(cfg.f0, cfg.nt, cfg.dt), jnp.float32),
        (2, cfg.nt))
    return cfg, survey, das_w, stf, npml


def test_pallas_weighted_curved_fiber_matches_xla():
    """The paper's DAS acquisition: a curved fiber with per-point (exx, exz,
    ezz) directional sensitivity weights (elasticSolver.py:269-276) — runs on
    the fused engine as a K-layer fiber survey (duplicate x-lanes along the
    arc) and must match the XLA engine, forward and gradient."""
    cfg, survey, das_w, stf, npml = _arc_fiber_problem()
    lam, mu, rho = _mini_medium(cfg)
    geoms = st.ShotGeom(
        src_z=jnp.asarray(survey.src_z + npml, jnp.int32),
        src_x=jnp.asarray(survey.src_x + npml, jnp.int32),
        rxz=jnp.asarray(survey.src_rxz, jnp.float32),
        rec_z=jnp.broadcast_to(jnp.asarray(survey.rec_z + npml, jnp.int32),
                               (2, survey.n_rec)),
        rec_x=jnp.broadcast_to(jnp.asarray(survey.rec_x + npml, jnp.int32),
                               (2, survey.n_rec)),
        das_w=jnp.broadcast_to(jnp.asarray(das_w, jnp.float32),
                               (2, *das_w.shape)))

    plan = pe.plan_fast_path(cfg, survey.rec_z + npml, survey.rec_x + npml,
                             das_w=das_w)
    assert plan is not None
    assert isinstance(plan.rs, pe.FiberSurvey) and plan.rs.n_layers >= 2

    sz = jnp.asarray(survey.src_z + npml)
    sx = jnp.asarray(survey.src_x + npml)
    rz = jnp.asarray(survey.src_rxz, jnp.float32)
    out = np.asarray(pe.propagate_pallas_plan(
        plan, lam, mu, rho, stf, sz, sx, rz))
    ref = _xla_fwd(cfg, lam, mu, rho, stf, geoms)
    _assert_close(out, ref, 3e-5)

    # gradient equality through an ett-channel L2 loss
    obs = jnp.asarray(ref * 1.01)

    def loss_p(lam_):
        syn = pe.propagate_pallas_plan(plan, lam_, mu, rho, stf, sz, sx, rz)
        r = (obs - syn)[:, 3]
        return 0.5 * jnp.sum(r * r)

    def loss_x(lam_):
        syn = jax.vmap(lambda s, g: st.propagate(cfg, lam_, mu, rho, s, g))(
            stf, geoms)
        r = (obs - syn)[:, 3]
        return 0.5 * jnp.sum(r * r)

    g_p = np.asarray(jax.grad(loss_p)(lam))
    g_x = np.asarray(jax.grad(loss_x)(lam))
    scale = np.abs(g_x).max()
    assert np.abs(g_p - g_x).max() / scale < 5e-4


def test_compact_backward_matches_full(monkeypatch):
    """The compact backward variant (raw lam/mu/rho inputs, staggered
    averaging recomputed inside the differentiated step, 3 gradient planes)
    must match the full variant — the VMEM diet that covers Main-004
    rock-physics grids on the fused engine."""
    npml = 10
    cfg = st.SimConfig(nz=40 + 2 * npml, nx=56 + 2 * npml, dz=20.0, dx=20.0,
                       nt=100, dt=0.002, f0=10.0, npml=npml)
    lam, mu, rho = _mini_medium(cfg)
    survey = Survey(src_z=np.array([2]), src_x=np.array([24]),
                    rec_z=np.full(20, 32), rec_x=np.arange(16, 36))
    stf = jnp.broadcast_to(
        jnp.asarray(st.ricker(cfg.f0, cfg.nt, cfg.dt), jnp.float32),
        (1, cfg.nt))
    rs = pe.check_row_survey(survey.rec_z + npml, survey.rec_x + npml)
    sz = jnp.asarray(survey.src_z + npml)
    sx = jnp.asarray(survey.src_x + npml)
    rz = jnp.asarray(survey.src_rxz, jnp.float32)
    obs = pe.propagate_pallas(cfg, rs, lam * 1.02, mu, rho, stf, sz, sx, rz)

    def loss(lam_, mu_, rho_, stf_):
        syn = pe.propagate_pallas(cfg, rs, lam_, mu_, rho_, stf_, sz, sx, rz)
        r = obs - syn
        return 0.5 * jnp.sum(r * r)

    grads = {}
    for mode in (False, True):
        monkeypatch.setattr(pe, "_use_compact", lambda c, k=1, _m=mode: _m)
        grads[mode] = [np.asarray(g) for g in
                       jax.grad(loss, argnums=(0, 1, 2, 3))(lam, mu, rho,
                                                            stf)]
    # the compact spray crosses the interior-mask edge one cell differently
    # (chained in-kernel per step vs masked-then-chained); compare eroded
    sl = (slice(npml + 1, cfg.nz - npml - 1),
          slice(npml + 1, cfg.nx - npml - 1))
    for i, name in enumerate(("d_lam", "d_mu", "d_rho", "d_stf")):
        a, b = grads[False][i], grads[True][i]
        if a.ndim == 2 and a.shape == cfg.grid.shape:
            a, b = a[sl], b[sl]
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-30)
        assert rel < 5e-5, (name, rel)


def test_stencil_transposes_are_exact(monkeypatch):
    """<g, D f> == <D^T g, f> for the four stencils and their closed-form
    transposes (the phase-split backward's manual hops).  pltpu.roll has no
    out-of-kernel CPU lowering; jnp.roll is semantically identical."""
    monkeypatch.setattr(pe, "_roll", lambda a, s, ax: jnp.roll(a, s, ax))
    key = jax.random.PRNGKey(0)
    f = jax.random.normal(key, (24, 40))
    g = jax.random.normal(jax.random.PRNGKey(1), (24, 40))
    pairs = [(pe._dz_minus, pe._dz_minus_t), (pe._dz_plus, pe._dz_plus_t),
             (pe._dx_minus, pe._dx_minus_t), (pe._dx_plus, pe._dx_plus_t)]
    for D, Dt in pairs:
        lhs = float(jnp.vdot(g, D(f)))
        rhs = float(jnp.vdot(Dt(g), f))
        assert abs(lhs - rhs) < 1e-10 * (abs(lhs) + 1e-30), (D.__name__,)
        # and the closed form equals jax.vjp of the forward stencil
        via_vjp = jax.vjp(D, f)[1](g)[0]
        np.testing.assert_allclose(np.asarray(Dt(g)), np.asarray(via_vjp),
                                   rtol=1e-12)


def test_phased_backward_matches_monolithic_vjp(monkeypatch):
    """The phase-split adjoint (reusing the reconstruction's stencil diffs,
    manual transpose hops) must reproduce the monolithic step-vjp oracle.
    lam/mu/stf agree to f32 rounding; rho's buoyancy products consume the
    velocity-phase diffs, where the phased path uses the CARRIED t+1
    stresses (exact) while the monolithic vjp recomputes them from the
    reconstructed state (PML-invalid) — so rho is compared on the eroded
    interior where both reconstructions are exact."""
    npml = 10
    cfg = st.SimConfig(nz=40 + 2 * npml, nx=56 + 2 * npml, dz=20.0, dx=20.0,
                       nt=120, dt=0.002, f0=10.0, npml=npml)
    lam, mu, rho = _mini_medium(cfg)
    survey = Survey(src_z=np.array([6]), src_x=np.array([24]),
                    rec_z=np.full(20, 32), rec_x=np.arange(16, 36))
    stf = jnp.broadcast_to(
        jnp.asarray(st.ricker(cfg.f0, cfg.nt, cfg.dt), jnp.float32),
        (1, cfg.nt))
    rs = pe.check_row_survey(survey.rec_z + npml, survey.rec_x + npml)
    sz = jnp.asarray(survey.src_z + npml)
    sx = jnp.asarray(survey.src_x + npml)
    rz = jnp.asarray(survey.src_rxz, jnp.float32)
    obs = pe.propagate_pallas(cfg, rs, lam * 1.02, mu, rho, stf, sz, sx, rz)

    def loss(lam_, mu_, rho_, stf_):
        syn = pe.propagate_pallas(cfg, rs, lam_, mu_, rho_, stf_, sz, sx, rz)
        r = obs - syn
        return 0.5 * jnp.sum(r * r)

    grads = {}
    for impl in ("phased", "vjp"):
        monkeypatch.setenv("SEP2023_TPU_BWD", impl)
        grads[impl] = [np.asarray(g) for g in
                       jax.grad(loss, argnums=(0, 1, 2, 3))(lam, mu, rho,
                                                            stf)]
    sl = (slice(npml + 2, cfg.nz - npml - 2),
          slice(npml + 2, cfg.nx - npml - 2))
    for i, name in enumerate(("d_lam", "d_mu", "d_rho", "d_stf")):
        a, b = grads["phased"][i], grads["vjp"][i]
        if a.ndim == 2 and a.shape == cfg.grid.shape:
            a, b = a[sl], b[sl]
        rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-30)
        assert rel < 2e-5, (name, rel)


def test_vmem_gates_match_measured_boundary():
    """The engine-selection gates encode MEASURED pass/fail points on a v5e
    chip (100 MiB scoped-VMEM limit): 528x704 padded runs fused (compact),
    560x720 fails Mosaic compilation and must fall back to the XLA engine;
    465x640 runs the faster full variant; the reference workloads use the
    full variant."""
    mk = lambda nz, nx: st.SimConfig(nz=nz, nx=nx, dz=10.0, dx=10.0,
                                     nt=2001, dt=0.001, f0=15.0, npml=32)
    # reference benchmark + rock physics: full variant
    for nz, nx in ((165, 265), (265, 385)):
        cfg = mk(nz, nx)
        assert pe.grad_vmem_fits(cfg) and not pe._use_compact(cfg), (nz, nx)
    # beyond reference: full at 465x640, compact at 528x704
    assert pe.grad_vmem_fits(mk(465, 640))
    assert not pe._use_compact(mk(465, 640))
    assert pe.grad_vmem_fits(mk(528, 704))
    assert pe._use_compact(mk(528, 704))
    # past the measured Mosaic failure point: XLA fallback
    assert not pe.grad_vmem_fits(mk(560, 720))


def test_pallas_adjoint_dot_product():
    """Direct adjoint identity for BOTH fused engines: <d, J s> == <J^T d, s>
    where J is the linearization of the propagator in the source wavelet
    (exact for the stf argument — the dynamics are linear in the source)."""
    npml = 10
    cfg = st.SimConfig(nz=36 + 2 * npml, nx=48 + 2 * npml, dz=20.0, dx=20.0,
                       nt=90, dt=0.002, f0=10.0, npml=npml)
    lam, mu, rho = _mini_medium(cfg)
    rec_z = np.full(12, 28)
    rec_x = np.arange(14, 26)
    rs = pe.check_row_survey(rec_z + npml, rec_x + npml)
    sz = jnp.asarray([npml + 4])
    sx = jnp.asarray([npml + 20])
    rz = jnp.asarray([1.0], jnp.float32)
    key = jax.random.PRNGKey(7)
    s = jax.random.normal(key, (1, cfg.nt), jnp.float32)
    d = jax.random.normal(jax.random.PRNGKey(8), (1, 4, 12, cfg.nt),
                          jnp.float32)

    # elastic: forward is linear in stf, so J s = F(s) and J^T d via vjp
    F = lambda s_: pe.propagate_pallas(cfg, rs, lam, mu, rho, s_, sz, sx, rz)
    lhs = float(jnp.vdot(d, F(s)))
    _, vjp = jax.vjp(F, s)
    rhs = float(jnp.vdot(vjp(d)[0], s))
    assert abs(lhs - rhs) < 5e-5 * abs(lhs), (lhs, rhs)

    # acoustic
    lam_ac = (rho * 3000.0 ** 2).astype(jnp.float32)
    Fa = lambda s_: pe.propagate_pallas_acoustic(cfg, rs, lam_ac, rho, s_,
                                                 sz, sx)
    da = d[:, :3]
    lhs = float(jnp.vdot(da, Fa(s)))
    _, vjpa = jax.vjp(Fa, s)
    rhs = float(jnp.vdot(vjpa(da)[0], s))
    assert abs(lhs - rhs) < 5e-5 * abs(lhs), (lhs, rhs)


def test_pallas_gradient_finite_differences():
    """Central finite differences on the fused-engine misfit: the in-kernel
    phase-split adjoint against raw numerics (no oracle involved)."""
    from sep2023_tpu.ops import misfit as mf

    npml = 10
    cfg = st.SimConfig(nz=32 + 2 * npml, nx=40 + 2 * npml, dz=20.0, dx=20.0,
                       nt=80, dt=0.002, f0=10.0, npml=npml)
    lam, mu, rho = _mini_medium(cfg)
    rec_z = np.full(10, 26)
    rec_x = np.arange(12, 22)
    rs = pe.check_row_survey(rec_z + npml, rec_x + npml)
    sz = jnp.asarray([npml + 4])
    sx = jnp.asarray([npml + 18])
    rz = jnp.asarray([1.0], jnp.float32)
    stf = jnp.asarray(st.ricker(cfg.f0, cfg.nt, cfg.dt),
                      jnp.float32)[None]
    obs = pe.propagate_pallas(cfg, rs, lam * 1.02, mu, rho, stf, sz, sx, rz)

    def loss(l):
        return mf.l2_misfit(obs, pe.propagate_pallas(cfg, rs, l, mu, rho,
                                                     stf, sz, sx, rz))

    g = np.asarray(jax.grad(loss)(lam))
    # probe the 3 largest-gradient interior cells with central differences
    gi = np.abs(g).copy()
    gi[:npml + 3] = 0; gi[-npml - 3:] = 0
    gi[:, :npml + 3] = 0; gi[:, -npml - 3:] = 0
    for _ in range(3):
        z, x = np.unravel_index(np.argmax(gi), gi.shape)
        gi[z, x] = 0
        h = 3e-4 * float(lam[z, x])
        lp = lam.at[z, x].add(h)
        lm = lam.at[z, x].add(-h)
        fd = (float(loss(lp)) - float(loss(lm))) / (2 * h)
        rel = abs(fd - g[z, x]) / (abs(g[z, x]) + 1e-30)
        assert rel < 2e-2, (z, x, fd, g[z, x], rel)


def test_dense_areal_grid_via_max_layers(monkeypatch):
    """A dense multi-row receiver spread (6 rows x 10 lanes — an areal
    grid) exceeds the default 4-layer fiber cap, but SEP2023_TPU_MAX_LAYERS
    keeps it on the fast engine (recording cost scales with K; every loss
    builder inherits the knob through plan_fast_path)."""
    from sep2023_tpu import parallel as par

    npml = 10
    cfg = st.SimConfig(nz=40 + 2 * npml, nx=56 + 2 * npml, dz=20.0,
                       dx=20.0, nt=100, dt=0.002, f0=10.0, npml=npml)
    vp = jnp.full(cfg.grid.shape, 3000.0)
    med = st.Medium(vp, vp / jnp.sqrt(3.0), jnp.full(cfg.grid.shape, 2500.0))
    lam, mu, rho = (med.lam.astype(jnp.float32), med.mu.astype(jnp.float32),
                    med.rho.astype(jnp.float32))
    zz, xx = np.meshgrid(np.arange(22, 28), np.arange(14, 24),
                         indexing="ij")
    survey = Survey(src_z=np.array([2]), src_x=np.array([28]),
                    rec_z=zz.ravel(), rec_x=xx.ravel())
    assert pe.plan_fast_path(cfg, survey.rec_z + npml,
                             survey.rec_x + npml) is None  # default cap
    monkeypatch.setenv("SEP2023_TPU_MAX_LAYERS", "8")
    plan = pe.plan_fast_path(cfg, survey.rec_z + npml, survey.rec_x + npml)
    assert plan is not None and pe._n_layers(plan.rs) == 6

    stf = jnp.broadcast_to(
        jnp.asarray(st.ricker(cfg.f0, cfg.nt, cfg.dt), jnp.float32),
        (1, cfg.nt))
    geoms = par.survey_to_geoms(survey, npml, dtype=jnp.float32)
    ref = jax.vmap(lambda s, g: st.propagate(cfg, lam, mu, rho, s, g))(
        stf, geoms).astype(jnp.float32)
    sz = jnp.asarray(survey.src_z + npml)
    sx = jnp.asarray(survey.src_x + npml)
    rxz = jnp.asarray(survey.src_rxz)
    out = pe.propagate_pallas_plan(plan, lam, mu, rho, stf, sz, sx, rxz)
    assert float(jnp.abs(ref).max()) > 1e-3
    for c in range(4):
        num = np.abs(np.asarray(out)[:, c] - np.asarray(ref)[:, c]).max()
        assert num < 2e-5 * np.abs(np.asarray(ref)[:, c]).max(), c

    obs = ref * 1.05

    def loss_x(l, m, r, s):
        syn = jax.vmap(lambda si, g: st.propagate(cfg, l, m, r, si, g))(
            s, geoms)
        return jnp.sum((syn.astype(jnp.float32) - obs) ** 2)

    w = jnp.ones((1,), jnp.float32)
    fn = lambda o, s: jnp.sum((s - o) ** 2)
    g_pl = jax.grad(lambda *a: par.make_pallas_misfit(
        cfg, survey, misfit_fn=fn)(*a, obs, w))(lam, mu, rho, stf)
    g_x = jax.grad(loss_x)(lam, mu, rho, stf)
    scale = np.abs(np.asarray(g_x)).max() + 1e-30
    assert np.abs(np.asarray(g_pl - g_x)).max() / scale < 5e-4
