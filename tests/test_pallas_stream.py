"""Streamed Pallas engine (ops/pallas_stream.py) vs the XLA oracle.

All tests force SEP2023_TPU_STREAM_T=16 so even the tiny test grids split
into several z-tiles — exercising the halo reads, tile-interior writes,
strip-band ownership guards and the recording ownership window.  Kernels run
in interpret mode on CPU; the same megasteps compile via Mosaic on TPU
(bench.py / the tpu-marked suite)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sep2023_tpu as st
from sep2023_tpu import parallel
from sep2023_tpu.config import Survey
from sep2023_tpu.ops import pallas_engine as pe
from sep2023_tpu.ops import pallas_stream as ps


@pytest.fixture(autouse=True)
def _small_tiles(monkeypatch):
    monkeypatch.setenv("SEP2023_TPU_STREAM_T", "16")


@pytest.fixture(autouse=True)
def _free_compiled_programs():
    """XLA:CPU segfaults inside backend_compile once ~20 of this module's
    large streamed-scan programs have accumulated in one process (crash
    frames: backend_compile_and_load; the failing POSITION moves with the
    compile history and every test passes standalone — a cumulative
    JIT-code/resource exhaustion, not a specific program; reproduced with
    the persistent compile cache on AND off).  Dropping the jit caches
    after each test frees the compiled executables and keeps the resident
    footprint bounded; only this module pays the (intra-module) recompile
    cost."""
    yield
    jax.clear_caches()


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


def _assert_close(out, ref, tol):
    for c in range(4):
        scale = np.abs(ref[:, c]).max()
        if scale == 0:
            continue
        rel = np.abs(out[:, c] - ref[:, c]).max() / scale
        assert rel < tol, (c, rel)


def test_streamed_forward_and_gradient_match_xla():
    """Row survey across 4 z-tiles: streamed forward and the full streamed
    boundary-saving gradient (lam, mu, rho, stf) against the XLA engine."""
    npml = 10
    cfg = st.SimConfig(nz=44 + 2 * npml, nx=60 + 2 * npml, dz=20.0, dx=20.0,
                       nt=120, dt=0.002, f0=10.0, npml=npml)
    assert ps._layout(cfg)[1] >= 4  # multiple tiles
    lam, mu, rho = _mini_medium(cfg)
    survey = Survey(src_z=np.array([2, 30]), src_x=np.array([14, 40]),
                    rec_z=np.full(24, 38), rec_x=np.arange(16, 40))
    geoms = parallel.survey_to_geoms(survey, npml, dtype=jnp.float32)
    stf = jnp.broadcast_to(
        jnp.asarray(st.ricker(cfg.f0, cfg.nt, cfg.dt), jnp.float32),
        (2, cfg.nt))
    rs = pe.check_row_survey(survey.rec_z + npml, survey.rec_x + npml)
    sz = jnp.asarray(survey.src_z + npml)
    sx = jnp.asarray(survey.src_x + npml)
    rxz = jnp.asarray(survey.src_rxz)

    out = np.asarray(ps.propagate_pallas_streamed(
        cfg, rs, lam, mu, rho, stf, sz, sx, rxz))
    ref = _xla_fwd(cfg, lam, mu, rho, stf, geoms)
    _assert_close(out, ref, 3e-5)

    obs = jnp.asarray(_xla_fwd(cfg, lam * 1.03, mu * 0.98, rho, stf, geoms))

    def loss_s(lam_, mu_, rho_, stf_):
        syn = ps.propagate_pallas_streamed(cfg, rs, lam_, mu_, rho_, stf_,
                                           sz, sx, rxz)
        return jnp.sum((syn - obs) ** 2)

    def loss_x(lam_, mu_, rho_, stf_):
        syn = jax.vmap(lambda s, g: st.propagate(cfg, lam_, mu_, rho_,
                                                 s, g))(stf_, geoms)
        return jnp.sum((syn.astype(jnp.float32) - obs) ** 2)

    gs = jax.grad(loss_s, argnums=(0, 1, 2, 3))(lam, mu, rho, stf)
    gx = jax.grad(loss_x, argnums=(0, 1, 2, 3))(lam, mu, rho, stf)
    for name, a, b in zip(("lam", "mu", "rho", "stf"), gs, gx):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.abs(a - b).max() / np.abs(b).max()
        assert rel < 5e-4, (name, rel)


def test_streamed_weighted_curved_fiber_matches_xla():
    """The paper's DAS acquisition (curved fiber, K-layer FiberSurvey,
    directional sensitivity weights) on the STREAMED engine, forced through
    the plan dispatch: forward + lam gradient vs XLA."""
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
    assert isinstance(plan.rs, pe.FiberSurvey) and plan.rs.n_layers >= 2

    sz = jnp.asarray(survey.src_z + npml)
    sx = jnp.asarray(survey.src_x + npml)
    rz = jnp.asarray(survey.src_rxz, jnp.float32)
    out = np.asarray(ps.propagate_pallas_streamed(
        plan.cfg, plan.rs, lam, mu, rho, stf, sz, sx, rz))
    ref = _xla_fwd(cfg, lam, mu, rho, stf, geoms)
    _assert_close(out, ref, 3e-5)

    obs = jnp.asarray(ref * 1.01)

    def loss_p(lam_):
        syn = ps.propagate_pallas_streamed(plan.cfg, plan.rs, lam_, mu, rho,
                                           stf, sz, sx, rz)
        r = (obs - syn)[:, 3]
        return 0.5 * jnp.sum(r * r)

    def loss_x(lam_):
        syn = jax.vmap(lambda s, g: st.propagate(cfg, lam_, mu, rho, s, g))(
            stf, geoms)
        r = (obs - syn)[:, 3]
        return 0.5 * jnp.sum(r * r)

    g_p = np.asarray(jax.grad(loss_p)(lam))
    g_x = np.asarray(jax.grad(loss_x)(lam))
    assert np.abs(g_p - g_x).max() / np.abs(g_x).max() < 5e-4


def test_streamed_transposed_column_survey(monkeypatch):
    """Borehole column receivers through the plan dispatch with the streamed
    engine forced (SEP2023_TPU_ENGINE=stream): the transposition wrapper
    (model swapaxes, stf*rxz source rescale, channel swap) must route
    through the streamed custom_vjp identically."""
    monkeypatch.setenv("SEP2023_TPU_ENGINE", "stream")
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
    assert pe.plan_engine_name(plan) == "streamed Pallas"
    out = np.asarray(pe.propagate_pallas_plan(
        plan, lam, mu, rho, stf, jnp.asarray(survey.src_z + npml),
        jnp.asarray(survey.src_x + npml), jnp.asarray(survey.src_rxz)))
    ref = _xla_fwd(cfg, lam, mu, rho, stf, geoms)
    _assert_close(out, ref, 3e-5)


def test_grad_dispatch_picks_streamed_past_vmem_gate(monkeypatch):
    """plan dispatch: inside the measured VMEM gates the fused kernel runs;
    on a Marmousi-scale grid `grad_vmem_fits` fails and the dispatcher
    selects the streamed engine instead of the XLA fallback.  The
    module-wide SEP2023_TPU_STREAM_T=16 pin is REMOVED here so the layout
    assertions exercise the PRODUCTION _budget_rows/_select_layout path."""
    monkeypatch.delenv("SEP2023_TPU_STREAM_T", raising=False)
    small = st.SimConfig(nz=165, nx=265, dz=20.0, dx=20.0, nt=100, dt=0.002,
                         f0=10.0, npml=32)
    big = st.SimConfig(nz=814, nx=2064, dz=10.0, dx=10.0, nt=100, dt=0.001,
                       f0=10.0, npml=32)
    rs = pe.RowSurvey(rec_row=60, rec_x0=40, n_rec=100)
    assert pe.grad_vmem_fits(small)
    assert not pe.grad_vmem_fits(big)
    assert pe._grad_prop(small, rs) is pe.propagate_pallas
    assert pe._grad_prop(big, rs) is ps.propagate_pallas_streamed
    # streamed layout at Marmousi scale through the PRODUCTION budget:
    # multi-tile, full coverage, hazard window respected.  Since the
    # round-4 split-band generalization the band-compact PsiPlan fits this
    # shape even under the Kb=2 temporal-blocking budget (the bottom psi
    # band straddles the last tile boundary; round 3's single-owner gate
    # structurally excluded every admissible T here) — pin compact psi +
    # the staged material stream so a layout change is loud (the
    # _mats_compute AUTO rule only enables the raw-material stream on
    # full-plane layouts).
    T, n_tiles, nz_ext, nxp, plan = ps._layout_plan(big)
    assert n_tiles >= 2 and n_tiles * T >= big.nz and nxp >= big.nx
    assert T >= ps.PAD  # multi-tile pipeline hazard-window requirement
    assert plan is not None and not ps._mats_compute(big)
    # the bottom band is genuinely split: >= 2 tiles extract slot 1 rows
    mats, exts, clears = ps._z_band_copies(plan, n_tiles, T, T + 2 * ps.PAD)
    bot_owners = [ti for ti in range(n_tiles)
                  if any(s == 1 for s, *_ in exts[ti])]
    assert len(bot_owners) >= 2


@pytest.mark.parametrize("nz,npml,T", [
    (814, 32, 88), (96, 24, 80), (96, 24, 48), (72, 8, 40), (72, 8, 16),
    (560, 32, 104), (165, 32, 64), (96, 24, 96), (40, 8, 40), (48, 24, 16),
])
def test_z_band_copies_cover_and_align(nz, npml, T):
    """_z_band_copies invariants for arbitrary tilings: every band-slot row
    is extracted by EXACTLY one tile (disjoint cover), materialization
    covers each tile's full window overlap, every offset/height is a
    multiple of 8 (Mosaic provable alignment), and clears[ti] equals tile
    ti-1's materialized rows."""
    cfg = st.SimConfig(nz=nz, nx=260, dz=10.0, dx=10.0, nt=50, dt=0.001,
                       f0=10.0, npml=npml)
    nxp = ps._pad128(cfg.nx)
    n_tiles = -(-nz // T)
    nz_ext = ps.PAD + n_tiles * T + ps.PAD
    plan = ps.PsiPlan(cfg, T, n_tiles, nz_ext, nxp)
    E = T + 2 * ps.PAD
    mats, exts, clears = ps._z_band_copies(plan, n_tiles, T, E)
    bands = {0: (ps.PAD, ps.PAD + plan.ZB), 1: (plan.B0, plan.B0 + plan.ZB)}
    for s, (b0, b1) in bands.items():
        got = np.zeros(b1 - b0, np.int32)
        for ti in range(n_tiles):
            w0 = ti * T
            i1 = w0 + E if ti == n_tiles - 1 else w0 + ps.PAD + T
            for s_, win_lo, slot_lo, rows in exts[ti]:
                if s_ != s:
                    continue
                assert win_lo % 8 == 0 and slot_lo % 8 == 0 and rows % 8 == 0
                # stores stay inside the tile's valid (interior/last-halo)
                # rows and inside the slot
                assert win_lo >= ps.PAD or ti == 0
                assert w0 + win_lo + rows <= i1
                assert slot_lo + rows <= plan.ZB
                got[slot_lo:slot_lo + rows] += 1
            for s_, win_lo, slot_lo, rows in mats[ti]:
                if s_ != s:
                    continue
                assert win_lo % 8 == 0 and slot_lo % 8 == 0 and rows % 8 == 0
                assert 0 <= win_lo and win_lo + rows <= E
                # window overlap is exactly [max(w0,b0), min(w0+E,b1))
                assert w0 + win_lo == max(w0, b0)
                assert w0 + win_lo + rows == min(w0 + E, b1)
        assert (got == 1).all(), (s, got)
    for ti in range(1, n_tiles):
        assert clears[ti] == [(lo, r) for (_, lo, _, r) in mats[ti - 1]]


def test_streamed_acoustic_matches_xla():
    """Acoustic streamed engine (3-field megasteps) vs the XLA acoustic
    oracle: forward and (lam, rho, stf) gradient across multiple tiles."""
    from sep2023_tpu.acoustic import AcGeom, propagate_acoustic

    npml = 10
    cfg = st.SimConfig(nz=44 + 2 * npml, nx=60 + 2 * npml, dz=20.0, dx=20.0,
                       nt=120, dt=0.002, f0=10.0, npml=npml)
    vp = jnp.full(cfg.grid.shape, 3000.0).at[30:38, 40:52].add(250.0)
    rho = jnp.full(cfg.grid.shape, 2500.0, jnp.float32)
    lam = (rho * vp ** 2).astype(jnp.float32)
    survey = Survey(src_z=np.array([2, 30]), src_x=np.array([14, 40]),
                    rec_z=np.full(24, 38), rec_x=np.arange(16, 40))
    rs = pe.check_row_survey(survey.rec_z + npml, survey.rec_x + npml)
    sz = jnp.asarray(survey.src_z + npml)
    sx = jnp.asarray(survey.src_x + npml)
    stf = jnp.broadcast_to(
        jnp.asarray(st.ricker(cfg.f0, cfg.nt, cfg.dt), jnp.float32),
        (2, cfg.nt))
    ac = AcGeom(src_z=sz.astype(jnp.int32), src_x=sx.astype(jnp.int32),
                rec_z=jnp.broadcast_to(
                    jnp.asarray(survey.rec_z + npml, jnp.int32), (2, 24)),
                rec_x=jnp.broadcast_to(
                    jnp.asarray(survey.rec_x + npml, jnp.int32), (2, 24)))

    out = np.asarray(ps.propagate_pallas_acoustic_streamed(
        cfg, rs, lam, rho, stf, sz, sx))
    f = jax.jit(lambda *a: jax.vmap(
        lambda s, g: propagate_acoustic(cfg, a[0], a[1], s, g))(a[2], a[3]))
    ref = np.asarray(f(lam, rho, stf, ac)).astype(np.float32)
    assert out.shape == ref.shape
    for c in range(3):
        rel = np.abs(out[:, c] - ref[:, c]).max() / np.abs(ref[:, c]).max()
        assert rel < 3e-5, (c, rel)

    obs = jnp.asarray(ref * 1.02)

    def loss_s(lam_, rho_, stf_):
        syn = ps.propagate_pallas_acoustic_streamed(cfg, rs, lam_, rho_,
                                                    stf_, sz, sx)
        return jnp.sum((syn - obs) ** 2)

    def loss_x(lam_, rho_, stf_):
        syn = jax.vmap(lambda s, g: propagate_acoustic(cfg, lam_, rho_,
                                                       s, g))(stf_, ac)
        return jnp.sum((syn.astype(jnp.float32) - obs) ** 2)

    gs = jax.grad(loss_s, argnums=(0, 1, 2))(lam, rho, stf)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(lam, rho, stf)
    for name, a, b in zip(("lam", "rho", "stf"), gs, gx):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.abs(a - b).max() / np.abs(b).max()
        assert rel < 5e-4, (name, rel)


def test_acoustic_auto_dispatch(monkeypatch):
    """propagate_pallas_acoustic_auto: fused inside the VMEM gate, streamed
    when forced / past it — both equal (exercised through the dispatcher)."""
    npml = 10
    cfg = st.SimConfig(nz=40 + 2 * npml, nx=56 + 2 * npml, dz=20.0, dx=20.0,
                       nt=80, dt=0.002, f0=10.0, npml=npml)
    vp = jnp.full(cfg.grid.shape, 3000.0)
    rho = jnp.full(cfg.grid.shape, 2500.0, jnp.float32)
    lam = (rho * vp ** 2).astype(jnp.float32)
    survey = Survey(src_z=np.array([2]), src_x=np.array([24]),
                    rec_z=np.full(20, 32), rec_x=np.arange(16, 36))
    rs = pe.check_row_survey(survey.rec_z + npml, survey.rec_x + npml)
    sz = jnp.asarray(survey.src_z + npml)
    sx = jnp.asarray(survey.src_x + npml)
    stf = jnp.broadcast_to(
        jnp.asarray(st.ricker(cfg.f0, cfg.nt, cfg.dt), jnp.float32),
        (1, cfg.nt))
    assert pe.ac_grad_vmem_fits(cfg)
    a = np.asarray(pe.propagate_pallas_acoustic_auto(
        cfg, rs, lam, rho, stf, sz, sx))
    monkeypatch.setenv("SEP2023_TPU_ENGINE", "stream")
    b = np.asarray(pe.propagate_pallas_acoustic_auto(
        cfg, rs, lam, rho, stf, sz, sx))
    assert np.abs(a - b).max() / np.abs(a).max() < 2e-5


def test_forward_plan_dispatch_equality(monkeypatch):
    """forward_pallas_plan (data generation) must give identical data
    whichever engine the dispatch picks."""
    npml = 10
    cfg = st.SimConfig(nz=40 + 2 * npml, nx=56 + 2 * npml, dz=20.0, dx=20.0,
                       nt=80, dt=0.002, f0=10.0, npml=npml)
    lam, mu, rho = _mini_medium(cfg)
    survey = Survey(src_z=np.array([2]), src_x=np.array([24]),
                    rec_z=np.full(20, 32), rec_x=np.arange(16, 36))
    plan = pe.plan_fast_path(cfg, survey.rec_z + npml, survey.rec_x + npml)
    stf = jnp.broadcast_to(
        jnp.asarray(st.ricker(cfg.f0, cfg.nt, cfg.dt), jnp.float32),
        (1, cfg.nt))
    args = (lam, mu, rho, stf, jnp.asarray(survey.src_z + npml),
            jnp.asarray(survey.src_x + npml), jnp.asarray(survey.src_rxz))
    a = np.asarray(pe.forward_pallas_plan(plan, *args))   # fused (fits)
    assert pe.fwd_vmem_fits(cfg)
    monkeypatch.setenv("SEP2023_TPU_ENGINE", "stream")
    b = np.asarray(pe.forward_pallas_plan(plan, *args))   # forced streamed
    assert np.abs(a - b).max() / np.abs(a).max() < 2e-5


def _stream_grads(cfg, rs, lam, mu, rho, stf, sz, sx, rxz, obs):
    def loss(lam_, mu_, rho_, stf_):
        syn = ps.propagate_pallas_streamed(cfg, rs, lam_, mu_, rho_, stf_,
                                           sz, sx, rxz)
        return jnp.sum((syn - obs) ** 2)

    return jax.grad(loss, argnums=(0, 1, 2, 3))(lam, mu, rho, stf)


@pytest.mark.parametrize("T_env,want_tiles", [("40", 2), ("80", 1)])
def test_stream_compact_psi_matches_full_planes(monkeypatch, T_env,
                                                want_tiles):
    """Band-compact CPML psi storage (PsiPlan) vs full-plane streaming:
    identical forward data and gradients.  Exact by construction — psi
    recursions are pointwise, the in-band values coincide, and out-of-band
    values are zero (primal) or provably inert (adjoint psi), so both paths
    perform the same in-band arithmetic (verified bitwise on an eager
    megastep during development; under jit the two differently-shaped scan
    programs pick up ~1e-25-relative XLA fusion noise, hence the tight but
    nonzero tolerances).  Covers multi-tile (bands in different tiles + the
    tile-1 stale-band clear) and single-tile (overlap-tolerant band
    placement).

    MATS is pinned to the staged stream on BOTH legs: _mats_compute
    auto-enables the raw-material in-kernel derivation only on FULL-plane
    layouts, so without the pin the NOCOMPACT reference leg silently
    switches numerics (accumulated-ULP different by design) and the
    comparison stops isolating psi compactness.  K is pinned to 1 for the
    same reason: temporal blocking (default K=3 since round 3) recomputes
    halo sub-steps, whose compiler-fusion noise (~2e-7 rel, the class
    test_stream_temporal_blocking_matches_k1 documents) would swamp this
    test's near-bitwise tolerance."""
    monkeypatch.setenv("SEP2023_TPU_STREAM_MATS", "stage")
    monkeypatch.setenv("SEP2023_TPU_STREAM_K", "1")
    monkeypatch.setenv("SEP2023_TPU_STREAM_KB", "1")
    monkeypatch.setenv("SEP2023_TPU_STREAM_T", T_env)
    npml = 8
    cfg = st.SimConfig(nz=72, nx=60, dz=20.0, dx=20.0, nt=90, dt=0.002,
                       f0=10.0, npml=npml)
    T, n_tiles, _, _, plan = ps._layout_plan(cfg)
    assert plan is not None and n_tiles == want_tiles
    lam, mu, rho = _mini_medium(cfg)
    survey = Survey(src_z=np.array([3, 40]), src_x=np.array([14, 30]),
                    rec_z=np.full(20, 50), rec_x=np.arange(12, 32))
    rs = pe.check_row_survey(survey.rec_z + 0, survey.rec_x + 0)
    stf = jnp.broadcast_to(
        jnp.asarray(st.ricker(cfg.f0, cfg.nt, cfg.dt), jnp.float32),
        (2, cfg.nt))
    sz = jnp.asarray(survey.src_z)
    sx = jnp.asarray(survey.src_x)
    rxz = jnp.asarray(survey.src_rxz)

    out_c = np.asarray(ps.propagate_pallas_streamed(
        cfg, rs, lam, mu, rho, stf, sz, sx, rxz))
    obs = jnp.asarray(out_c) * 1.1 + 0.05 * float(np.abs(out_c).max())
    g_c = _stream_grads(cfg, rs, lam, mu, rho, stf, sz, sx, rxz, obs)

    monkeypatch.setenv("SEP2023_TPU_STREAM_NOCOMPACT", "1")
    assert ps._layout_plan(cfg)[4] is None
    out_f = np.asarray(ps.propagate_pallas_streamed(
        cfg, rs, lam, mu, rho, stf, sz, sx, rxz))
    g_f = _stream_grads(cfg, rs, lam, mu, rho, stf, sz, sx, rxz, obs)

    assert np.abs(out_c - out_f).max() <= 1e-10 * np.abs(out_f).max()
    for name, a, b in zip(("lam", "mu", "rho", "stf"), g_c, g_f):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() <= 3e-8 * max(np.abs(b).max(), 1e-30), name


@pytest.mark.parametrize("T_env,want_tiles", [("40", 2), ("80", 1)])
def test_ac_stream_compact_psi_matches_full_planes(monkeypatch, T_env,
                                                   want_tiles):
    """Acoustic twin of test_stream_compact_psi_matches_full_planes: the
    3-field megasteps with band-compact psi (2 z + 2 x planes) vs full-plane
    streaming — identical data and (lam, rho, stf) gradients.  MATS pinned
    to the staged stream and K pinned to 1 on both legs (see the elastic
    twin's docstring)."""
    monkeypatch.setenv("SEP2023_TPU_STREAM_MATS", "stage")
    monkeypatch.setenv("SEP2023_TPU_STREAM_K", "1")
    monkeypatch.setenv("SEP2023_TPU_STREAM_KB", "1")
    monkeypatch.setenv("SEP2023_TPU_STREAM_T", T_env)
    npml = 8
    cfg = st.SimConfig(nz=72, nx=60, dz=20.0, dx=20.0, nt=90, dt=0.002,
                       f0=10.0, npml=npml)
    T, n_tiles, _, _, plan = ps._layout_plan(cfg)
    assert plan is not None and n_tiles == want_tiles
    vp = jnp.full(cfg.grid.shape, 3000.0).at[30:38, 24:40].add(250.0)
    rho = jnp.full(cfg.grid.shape, 2500.0, jnp.float32)
    lam = (rho * vp ** 2).astype(jnp.float32)
    survey = Survey(src_z=np.array([12, 40]), src_x=np.array([14, 30]),
                    rec_z=np.full(20, 50), rec_x=np.arange(12, 32))
    rs = pe.check_row_survey(survey.rec_z + 0, survey.rec_x + 0)
    sz = jnp.asarray(survey.src_z)
    sx = jnp.asarray(survey.src_x)
    stf = jnp.broadcast_to(
        jnp.asarray(st.ricker(cfg.f0, cfg.nt, cfg.dt), jnp.float32),
        (2, cfg.nt))

    def grads(obs):
        def loss(lam_, rho_, stf_):
            syn = ps.propagate_pallas_acoustic_streamed(cfg, rs, lam_, rho_,
                                                        stf_, sz, sx)
            return jnp.sum((syn - obs) ** 2)

        return jax.grad(loss, argnums=(0, 1, 2))(lam, rho, stf)

    out_c = np.asarray(ps.propagate_pallas_acoustic_streamed(
        cfg, rs, lam, rho, stf, sz, sx))
    obs = jnp.asarray(out_c) * 1.1 + 0.05 * float(np.abs(out_c).max())
    g_c = grads(obs)

    monkeypatch.setenv("SEP2023_TPU_STREAM_NOCOMPACT", "1")
    assert ps._layout_plan(cfg)[4] is None
    out_f = np.asarray(ps.propagate_pallas_acoustic_streamed(
        cfg, rs, lam, rho, stf, sz, sx))
    g_f = grads(obs)

    assert np.abs(out_c - out_f).max() <= 1e-10 * np.abs(out_f).max()
    for name, a, b in zip(("lam", "rho", "stf"), g_c, g_f):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() <= 1e-7 * max(np.abs(b).max(), 1e-30), name


@pytest.mark.parametrize("K,Kb,fwd_tol,grad_tol", [
    ("1", "1", 1e-9, 2e-6), ("2", "2", 2e-6, 1e-5)])
def test_stream_compact_split_band(monkeypatch, K, Kb, fwd_tol, grad_tol):
    """SPLIT psi bands: npml=24 (zb=24, ZB=32) on nz=96 with T=80 puts the
    bottom band (buffer rows [88, 120)) across BOTH tiles' interiors —
    tile 0 extracts slot rows [0, 8), the last tile [8, 32) — the layout
    class round 3's single-owner gates rejected (and the one Marmousi
    compact+Kb=2 needs).  Compact vs the FUSED engine: forward bitwise at
    K=1 (tight tol), both within blocking-recompute noise at K=Kb=2.
    MATS pinned to the staged stream so both engines use the precomputed
    staggered material fields (bitwise-comparable forward).

    TOOLCHAIN CANARY — rerun on real TPU after any jax/jaxlib/Pallas bump:
    split-band hazard freedom relies on VMEM pallas operands getting
    DISTINCT in/out copies under input_output_aliases (the alias is XLA
    buffer donation, not an in-kernel identity — _psi_materialize
    docstring).  If a toolchain upgrade ever makes aliased VMEM operands
    true in-place views, tile i's band extraction would leak into tile
    i+1's materialization and this K>1 multi-tile bitwise comparison is
    the test that catches it (test_tpu_streamed_multitile_compact_gradient
    exercises the aliased compact path on real hardware)."""
    monkeypatch.setenv("SEP2023_TPU_STREAM_MATS", "stage")
    monkeypatch.setenv("SEP2023_TPU_STREAM_K", K)
    monkeypatch.setenv("SEP2023_TPU_STREAM_KB", Kb)
    monkeypatch.setenv("SEP2023_TPU_STREAM_T", "80")
    cfg = st.SimConfig(nz=96, nx=60, dz=20.0, dx=20.0, nt=110, dt=0.002,
                       f0=10.0, npml=24)
    T, n_tiles, _, _, plan = ps._layout_plan(cfg)
    assert plan is not None and n_tiles == 2
    _, exts, _ = ps._z_band_copies(plan, n_tiles, T, T + 2 * ps.PAD)
    assert (any(s == 1 for s, *_ in exts[0])
            and any(s == 1 for s, *_ in exts[1]))   # genuinely split
    lam, mu, rho = _mini_medium(cfg)
    lam = lam.at[40:52, 28:40].mul(1.15)
    survey = Survey(src_z=np.array([28, 60]), src_x=np.array([30, 32]),
                    rec_z=np.full(14, 36), rec_x=np.arange(26, 40))
    rs = pe.check_row_survey(survey.rec_z + 0, survey.rec_x + 0)
    stf = jnp.broadcast_to(
        jnp.asarray(st.ricker(cfg.f0, cfg.nt, cfg.dt), jnp.float32),
        (2, cfg.nt))
    sz = jnp.asarray(survey.src_z)
    sx = jnp.asarray(survey.src_x)
    rxz = jnp.asarray(survey.src_rxz)

    out_s = np.asarray(ps.propagate_pallas_streamed(
        cfg, rs, lam, mu, rho, stf, sz, sx, rxz))
    out_p = np.asarray(pe.propagate_pallas(
        cfg, rs, lam, mu, rho, stf, sz, sx, rxz))
    assert np.abs(out_s - out_p).max() <= fwd_tol * np.abs(out_p).max()

    obs = jnp.asarray(out_p) * 1.1 + 0.05 * float(np.abs(out_p).max())
    g_s = _stream_grads(cfg, rs, lam, mu, rho, stf, sz, sx, rxz, obs)

    def loss_p(lam_, mu_, rho_, stf_):
        syn = pe.propagate_pallas(cfg, rs, lam_, mu_, rho_, stf_,
                                  sz, sx, rxz)
        return jnp.sum((syn - obs) ** 2)

    g_p = jax.grad(loss_p, argnums=(0, 1, 2, 3))(lam, mu, rho, stf)
    for name, a, b in zip(("lam", "mu", "rho", "stf"), g_s, g_p):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() <= grad_tol * max(np.abs(b).max(),
                                                     1e-30), name


def test_ac_stream_compact_split_band(monkeypatch):
    """Acoustic twin of test_stream_compact_split_band (same split-band
    layout), K=Kb=2, vs the fused acoustic engine."""
    monkeypatch.setenv("SEP2023_TPU_STREAM_MATS", "stage")
    monkeypatch.setenv("SEP2023_TPU_STREAM_K", "2")
    monkeypatch.setenv("SEP2023_TPU_STREAM_KB", "2")
    monkeypatch.setenv("SEP2023_TPU_STREAM_T", "80")
    cfg = st.SimConfig(nz=96, nx=60, dz=20.0, dx=20.0, nt=110, dt=0.002,
                       f0=10.0, npml=24)
    T, n_tiles, _, _, plan = ps._layout_plan(cfg)
    assert plan is not None and n_tiles == 2
    vp = jnp.full(cfg.grid.shape, 3000.0).at[40:52, 28:40].add(250.0)
    rho = jnp.full(cfg.grid.shape, 2500.0, jnp.float32)
    lam = (rho * vp ** 2).astype(jnp.float32)
    survey = Survey(src_z=np.array([28, 60]), src_x=np.array([30, 32]),
                    rec_z=np.full(14, 36), rec_x=np.arange(26, 40))
    rs = pe.check_row_survey(survey.rec_z + 0, survey.rec_x + 0)
    stf = jnp.broadcast_to(
        jnp.asarray(st.ricker(cfg.f0, cfg.nt, cfg.dt), jnp.float32),
        (2, cfg.nt))
    sz = jnp.asarray(survey.src_z)
    sx = jnp.asarray(survey.src_x)

    out_s = np.asarray(ps.propagate_pallas_acoustic_streamed(
        cfg, rs, lam, rho, stf, sz, sx))
    out_p = np.asarray(pe.propagate_pallas_acoustic(
        cfg, rs, lam, rho, stf, sz, sx))
    assert np.abs(out_s - out_p).max() <= 2e-6 * np.abs(out_p).max()

    obs = jnp.asarray(out_p) * 1.1 + 0.05 * float(np.abs(out_p).max())

    def grads(prop):
        def loss(lam_, rho_, stf_):
            syn = prop(cfg, rs, lam_, rho_, stf_, sz, sx)
            return jnp.sum((syn - obs) ** 2)

        return jax.grad(loss, argnums=(0, 1, 2))(lam, rho, stf)

    g_s = grads(ps.propagate_pallas_acoustic_streamed)
    g_p = grads(pe.propagate_pallas_acoustic)
    for name, a, b in zip(("lam", "rho", "stf"), g_s, g_p):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() <= 1e-5 * max(np.abs(b).max(),
                                                 1e-30), name


@pytest.mark.parametrize("K", ["2", "3"])
def test_stream_temporal_blocking_matches_k1(monkeypatch, K):
    """Temporally blocked megasteps (K leapfrog sub-steps per tile sweep,
    _stream_K) vs the plain K=1 scan: identical forward data and matching
    gradients.  nt-1 = 89 is divisible by neither K, so the ghost-step
    padding path (zero-amplitude steps appended, reversed by the backward,
    recordings trimmed) is exercised too.  T=24 forces several z-tiles, so
    sub-step halo values are computed in-tile rather than reloaded — the
    same arithmetic on the same inputs, so only compiler-fusion ULP noise
    separates the programs (measured 1.7e-7 rel on the forward; a halo
    bug would be O(1))."""
    monkeypatch.setenv("SEP2023_TPU_STREAM_T", "24")
    monkeypatch.setenv("SEP2023_TPU_STREAM_K", "1")
    npml = 8
    cfg = st.SimConfig(nz=72, nx=60, dz=20.0, dx=20.0, nt=90, dt=0.002,
                       f0=10.0, npml=npml)
    assert ps._layout(cfg)[1] >= 3
    lam, mu, rho = _mini_medium(cfg)
    survey = Survey(src_z=np.array([3, 40]), src_x=np.array([14, 30]),
                    rec_z=np.full(20, 50), rec_x=np.arange(12, 32))
    rs = pe.check_row_survey(survey.rec_z + 0, survey.rec_x + 0)
    stf = jnp.broadcast_to(
        jnp.asarray(st.ricker(cfg.f0, cfg.nt, cfg.dt), jnp.float32),
        (2, cfg.nt))
    sz = jnp.asarray(survey.src_z)
    sx = jnp.asarray(survey.src_x)
    rxz = jnp.asarray(survey.src_rxz)

    out_1 = np.asarray(ps.propagate_pallas_streamed(
        cfg, rs, lam, mu, rho, stf, sz, sx, rxz))
    obs = jnp.asarray(out_1) * 1.1 + 0.05 * float(np.abs(out_1).max())
    g_1 = _stream_grads(cfg, rs, lam, mu, rho, stf, sz, sx, rxz, obs)

    monkeypatch.setenv("SEP2023_TPU_STREAM_K", K)
    assert ps._stream_K(cfg) == int(K)
    out_k = np.asarray(ps.propagate_pallas_streamed(
        cfg, rs, lam, mu, rho, stf, sz, sx, rxz))
    g_k = _stream_grads(cfg, rs, lam, mu, rho, stf, sz, sx, rxz, obs)

    assert np.abs(out_k - out_1).max() <= 1e-6 * np.abs(out_1).max()
    for name, a, b in zip(("lam", "mu", "rho", "stf"), g_k, g_1):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() <= 1e-5 * max(np.abs(b).max(), 1e-30), name


@pytest.mark.parametrize("J,compact", [("2", True), ("3", True),
                                       ("2", False)])
def test_stream_ring_sweeps_match_j1(monkeypatch, J, compact):
    """Ring-pipelined megastep grouping (_stream_J: J megasteps per kernel
    invocation, the 2-slot DMA pipeline wrapping across sweeps) vs the
    J=1 scan — identical forward data, matching gradients.  nt-1 = 72 is
    a multiple of every padding unit in play (lcm over J in {1,2,3} of
    lcm(3J_f, 2J_b) = 6/12/18), so the ghost-step count is identical and
    the runs are arithmetic-identical: the forward is asserted (near)
    bitwise.  T=16 gives >= 4 tiles on 72 rows (the ring-safety gate);
    n_tiles = 5 is ODD, exercising the cross-sweep slot-parity wrap
    (_ring_slot).  Covers both the compact-psi plan (sweeps > 0
    materialize from the psi OUTPUT refs + _psi_ring_fix halo copy-down)
    and the full-plane layout (psi rides the state pipeline)."""
    if not compact:
        monkeypatch.setenv("SEP2023_TPU_STREAM_NOCOMPACT", "1")
    npml = 8
    cfg = st.SimConfig(nz=72, nx=60, dz=20.0, dx=20.0, nt=73, dt=0.002,
                      f0=10.0, npml=npml)
    T, n_tiles = ps._layout(cfg)[:2]
    assert n_tiles == 5 and (ps._layout_plan(cfg)[4] is not None) == compact
    lam, mu, rho = _mini_medium(cfg)
    survey = Survey(src_z=np.array([3, 40]), src_x=np.array([14, 30]),
                    rec_z=np.full(20, 50), rec_x=np.arange(12, 32))
    rs = pe.check_row_survey(survey.rec_z + 0, survey.rec_x + 0)
    stf = jnp.broadcast_to(
        jnp.asarray(st.ricker(cfg.f0, cfg.nt, cfg.dt), jnp.float32),
        (2, cfg.nt))
    sz = jnp.asarray(survey.src_z)
    sx = jnp.asarray(survey.src_x)
    rxz = jnp.asarray(survey.src_rxz)

    out_1 = np.asarray(ps.propagate_pallas_streamed(
        cfg, rs, lam, mu, rho, stf, sz, sx, rxz))
    obs = jnp.asarray(out_1) * 1.1 + 0.05 * float(np.abs(out_1).max())
    g_1 = _stream_grads(cfg, rs, lam, mu, rho, stf, sz, sx, rxz, obs)

    monkeypatch.setenv("SEP2023_TPU_STREAM_J", J)
    monkeypatch.setenv("SEP2023_TPU_STREAM_JB", J)
    assert ps._stream_J(cfg) == int(J) == ps._stream_J(cfg, bwd=True)
    out_j = np.asarray(ps.propagate_pallas_streamed(
        cfg, rs, lam, mu, rho, stf, sz, sx, rxz))
    g_j = _stream_grads(cfg, rs, lam, mu, rho, stf, sz, sx, rxz, obs)

    assert np.abs(out_j - out_1).max() <= 1e-7 * np.abs(out_1).max()
    for name, a, b in zip(("lam", "mu", "rho", "stf"), g_j, g_1):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() <= 1e-5 * max(np.abs(b).max(),
                                                 1e-30), name


def test_stream_ring_gate_needs_four_tiles(monkeypatch):
    """J > 1 silently degrades to 1 when the layout has < 4 tiles: the
    ring wrap prefetch of tile 0's window is only provably clear of
    in-flight output DMAs past that count (see _stream_J)."""
    monkeypatch.setenv("SEP2023_TPU_STREAM_J", "3")
    monkeypatch.setenv("SEP2023_TPU_STREAM_JB", "2")
    npml = 8
    cfg = st.SimConfig(nz=72, nx=60, dz=20.0, dx=20.0, nt=73, dt=0.002,
                      f0=10.0, npml=npml)
    assert ps._layout(cfg)[1] >= 4
    assert ps._stream_J(cfg) == 3 and ps._stream_J(cfg, bwd=True) == 2
    assert ps._pad_unit(cfg, save_strips=True) == 36   # lcm(3*3, 2*2)
    monkeypatch.setenv("SEP2023_TPU_STREAM_T", "40")   # 2 tiles
    assert ps._layout(cfg)[1] == 2
    assert ps._stream_J(cfg) == 1 and ps._stream_J(cfg, bwd=True) == 1
    assert ps._pad_unit(cfg, save_strips=True) == 6


def test_stream_deep_pad_temporal_blocking(monkeypatch):
    """SEP2023_TPU_STREAM_PAD deepens the tile halo so temporal blocking
    can go past PAD=16's K<=3/Kb<=2: at PAD=32 a K=5 forward (4K+1=21 <=
    32 valid-row shrink) with the default Kb=min(K, PAD//8)=4 backward
    must reproduce the PAD=16, K=1 run — same recordings, same gradients
    (halo sub-step values are recomputed in-tile; PAD only moves WHERE
    the recomputation happens, never what is stored).  T=40 >= PAD keeps
    the pipeline hazard window adjacent-only (3 z-tiles on nz=120).
    Receivers sit 16 rows under the deep source so real signal arrives
    well inside nt (asserted): with out-of-reach receivers the recordings
    are round-off noise and the gradient comparison tests nothing."""
    npml = 8
    cfg = st.SimConfig(nz=120, nx=60, dz=20.0, dx=20.0, nt=90, dt=0.002,
                       f0=10.0, npml=npml)
    lam, mu, rho = _mini_medium(cfg)
    survey = Survey(src_z=np.array([3, 60]), src_x=np.array([14, 30]),
                    rec_z=np.full(20, 76), rec_x=np.arange(12, 32))
    rs = pe.check_row_survey(survey.rec_z + 0, survey.rec_x + 0)
    stf = jnp.broadcast_to(
        jnp.asarray(st.ricker(cfg.f0, cfg.nt, cfg.dt), jnp.float32),
        (2, cfg.nt))
    sz = jnp.asarray(survey.src_z)
    sx = jnp.asarray(survey.src_x)
    rxz = jnp.asarray(survey.src_rxz)

    monkeypatch.setenv("SEP2023_TPU_STREAM_T", "40")
    monkeypatch.setenv("SEP2023_TPU_STREAM_K", "1")
    out_1 = np.asarray(ps.propagate_pallas_streamed(
        cfg, rs, lam, mu, rho, stf, sz, sx, rxz))
    assert np.abs(out_1).max() > 1e-8  # real arrivals, not round-off noise
    obs = jnp.asarray(out_1) * 1.1 + 0.05 * float(np.abs(out_1).max())
    g_1 = _stream_grads(cfg, rs, lam, mu, rho, stf, sz, sx, rxz, obs)

    monkeypatch.setattr(ps, "PAD", 32)
    monkeypatch.setenv("SEP2023_TPU_STREAM_K", "5")
    assert ps._stream_K(cfg) == 5 and ps._stream_K_bwd(cfg) == 4
    assert ps._layout(cfg)[:2] == (40, 3)
    out_k = np.asarray(ps.propagate_pallas_streamed(
        cfg, rs, lam, mu, rho, stf, sz, sx, rxz))
    g_k = _stream_grads(cfg, rs, lam, mu, rho, stf, sz, sx, rxz, obs)

    assert np.abs(out_k - out_1).max() <= 1e-6 * np.abs(out_1).max()
    for name, a, b in zip(("lam", "mu", "rho", "stf"), g_k, g_1):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() <= 1e-5 * max(np.abs(b).max(), 1e-30), name


def test_stream_gm_vmem_matches_default(monkeypatch):
    """SEP2023_TPU_STREAM_GM=vmem keeps the 5-plane material-gradient
    accumulator VMEM-resident (direct in-place accumulation, no gm
    DMAs): gradients must be identical to the streamed default, with and
    without temporal blocking (the accumulate runs per megastep in both
    paths; tile interiors are disjoint)."""
    npml = 8
    cfg = st.SimConfig(nz=120, nx=60, dz=20.0, dx=20.0, nt=90, dt=0.002,
                       f0=10.0, npml=npml)
    lam, mu, rho = _mini_medium(cfg)
    survey = Survey(src_z=np.array([3, 60]), src_x=np.array([14, 30]),
                    rec_z=np.full(20, 76), rec_x=np.arange(12, 32))
    rs = pe.check_row_survey(survey.rec_z + 0, survey.rec_x + 0)
    stf = jnp.broadcast_to(
        jnp.asarray(st.ricker(cfg.f0, cfg.nt, cfg.dt), jnp.float32),
        (2, cfg.nt))
    sz = jnp.asarray(survey.src_z)
    sx = jnp.asarray(survey.src_x)
    rxz = jnp.asarray(survey.src_rxz)

    monkeypatch.setenv("SEP2023_TPU_STREAM_T", "40")
    out_1 = np.asarray(ps.propagate_pallas_streamed(
        cfg, rs, lam, mu, rho, stf, sz, sx, rxz))
    assert np.abs(out_1).max() > 1e-8
    obs = jnp.asarray(out_1) * 1.1 + 0.05 * float(np.abs(out_1).max())

    for K in ("1", "2"):
        monkeypatch.setenv("SEP2023_TPU_STREAM_K", K)
        monkeypatch.delenv("SEP2023_TPU_STREAM_GM", raising=False)
        g_d = _stream_grads(cfg, rs, lam, mu, rho, stf, sz, sx, rxz, obs)
        monkeypatch.setenv("SEP2023_TPU_STREAM_GM", "vmem")
        assert ps._gm_vmem()
        g_v = _stream_grads(cfg, rs, lam, mu, rho, stf, sz, sx, rxz, obs)
        for name, a, b in zip(("lam", "mu", "rho", "stf"), g_v, g_d):
            a, b = np.asarray(a), np.asarray(b)
            assert np.abs(a - b).max() <= 1e-7 * max(np.abs(b).max(),
                                                     1e-30), (K, name)
    monkeypatch.delenv("SEP2023_TPU_STREAM_GM", raising=False)


def test_stream_mats_compute_matches_default(monkeypatch):
    """SEP2023_TPU_STREAM_MATS=compute streams RAW (lam, mu, rho) planes
    and derives the staggered fields in-kernel from an (E+8)-row
    edge-replicated window: forward recordings and gradients must match
    the default 5-plane derived stream across multi-tile layouts and
    temporal blocking.  The derived VALUES are bitwise identical at every
    physical cell (verified directly when this was built), but inlining
    the derivation changes XLA's fusion/fma choices inside the update
    chain, so the evolved state accumulates ULP-class rounding (measured
    ~5e-7 relative after 90 steps, growing ~sqrt(nt)) — the gates are
    accumulated-ULP, not bitwise."""
    npml = 8
    cfg = st.SimConfig(nz=120, nx=60, dz=20.0, dx=20.0, nt=90, dt=0.002,
                       f0=10.0, npml=npml)
    lam, mu, rho = _mini_medium(cfg)
    survey = Survey(src_z=np.array([3, 60]), src_x=np.array([14, 30]),
                    rec_z=np.full(20, 76), rec_x=np.arange(12, 32))
    rs = pe.check_row_survey(survey.rec_z + 0, survey.rec_x + 0)
    stf = jnp.broadcast_to(
        jnp.asarray(st.ricker(cfg.f0, cfg.nt, cfg.dt), jnp.float32),
        (2, cfg.nt))
    sz = jnp.asarray(survey.src_z)
    sx = jnp.asarray(survey.src_x)
    rxz = jnp.asarray(survey.src_rxz)

    monkeypatch.setenv("SEP2023_TPU_STREAM_T", "40")
    out_d = np.asarray(ps.propagate_pallas_streamed(
        cfg, rs, lam, mu, rho, stf, sz, sx, rxz))
    assert np.abs(out_d).max() > 1e-8
    obs = jnp.asarray(out_d) * 1.1 + 0.05 * float(np.abs(out_d).max())

    for K in ("1", "2"):
        monkeypatch.setenv("SEP2023_TPU_STREAM_K", K)
        monkeypatch.setenv("SEP2023_TPU_STREAM_MATS", "stage")
        assert not ps._mats_compute(cfg)
        out_0 = np.asarray(ps.propagate_pallas_streamed(
            cfg, rs, lam, mu, rho, stf, sz, sx, rxz))
        g_0 = _stream_grads(cfg, rs, lam, mu, rho, stf, sz, sx, rxz, obs)
        monkeypatch.setenv("SEP2023_TPU_STREAM_MATS", "compute")
        assert ps._mats_compute(cfg)
        out_c = np.asarray(ps.propagate_pallas_streamed(
            cfg, rs, lam, mu, rho, stf, sz, sx, rxz))
        g_c = _stream_grads(cfg, rs, lam, mu, rho, stf, sz, sx, rxz, obs)
        assert np.abs(out_c - out_0).max() <= 1e-6 * np.abs(out_0).max(), K
        for name, a, b in zip(("lam", "mu", "rho", "stf"), g_c, g_0):
            a, b = np.asarray(a), np.asarray(b)
            assert np.abs(a - b).max() <= 1e-5 * max(np.abs(b).max(),
                                                     1e-30), (K, name)
    monkeypatch.delenv("SEP2023_TPU_STREAM_MATS", raising=False)


def test_ac_stream_mats_compute_matches_default(monkeypatch):
    """Acoustic twin of test_stream_mats_compute_matches_default: raw
    (lam, rho) 2-plane stream with in-kernel buoyancy derivation."""
    npml = 8
    cfg = st.SimConfig(nz=120, nx=60, dz=20.0, dx=20.0, nt=90, dt=0.002,
                       f0=10.0, npml=npml)
    vp = jnp.full(cfg.grid.shape, 3000.0).at[50:66, 24:40].add(250.0)
    rho = jnp.full(cfg.grid.shape, 2500.0, jnp.float32)
    lam = (rho * vp ** 2).astype(jnp.float32)
    survey = Survey(src_z=np.array([12, 60]), src_x=np.array([14, 30]),
                    rec_z=np.full(20, 76), rec_x=np.arange(12, 32))
    rs = pe.check_row_survey(survey.rec_z + 0, survey.rec_x + 0)
    sz = jnp.asarray(survey.src_z)
    sx = jnp.asarray(survey.src_x)
    stf = jnp.broadcast_to(
        jnp.asarray(st.ricker(cfg.f0, cfg.nt, cfg.dt), jnp.float32),
        (2, cfg.nt))

    def grads(obs):
        def loss(lam_, rho_, stf_):
            syn = ps.propagate_pallas_acoustic_streamed(cfg, rs, lam_, rho_,
                                                        stf_, sz, sx)
            return jnp.sum((syn - obs) ** 2)

        return jax.grad(loss, argnums=(0, 1, 2))(lam, rho, stf)

    monkeypatch.setenv("SEP2023_TPU_STREAM_T", "40")
    monkeypatch.setenv("SEP2023_TPU_STREAM_MATS", "stage")
    assert not ps._mats_compute(cfg)
    out_0 = np.asarray(ps.propagate_pallas_acoustic_streamed(
        cfg, rs, lam, rho, stf, sz, sx))
    assert np.abs(out_0).max() > 1e-8
    obs = jnp.asarray(out_0) * 1.1 + 0.05 * float(np.abs(out_0).max())
    g_0 = grads(obs)

    monkeypatch.setenv("SEP2023_TPU_STREAM_MATS", "compute")
    assert ps._mats_compute(cfg)
    out_c = np.asarray(ps.propagate_pallas_acoustic_streamed(
        cfg, rs, lam, rho, stf, sz, sx))
    g_c = grads(obs)
    assert np.abs(out_c - out_0).max() <= 1e-7 * np.abs(out_0).max()
    for name, a, b in zip(("lam", "rho", "stf"), g_c, g_0):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() <= 1e-6 * max(np.abs(b).max(),
                                                 1e-30), name
    monkeypatch.delenv("SEP2023_TPU_STREAM_MATS", raising=False)


def test_mats_compute_requires_spare_lanes(monkeypatch):
    """_mats_compute falls back to the default stream when nx fills the
    lane tile exactly (the x+1 lane roll would wrap)."""
    monkeypatch.setenv("SEP2023_TPU_STREAM_MATS", "compute")
    cfg_ok = st.SimConfig(nz=64, nx=60, dz=20.0, dx=20.0, nt=10, dt=0.002,
                          f0=10.0, npml=8)
    cfg_full = st.SimConfig(nz=64, nx=128, dz=20.0, dx=20.0, nt=10,
                            dt=0.002, f0=10.0, npml=8)
    assert ps._mats_compute(cfg_ok)
    assert not ps._mats_compute(cfg_full)
    monkeypatch.delenv("SEP2023_TPU_STREAM_MATS", raising=False)


def test_ac_stream_gm_vmem_matches_default(monkeypatch):
    """Acoustic twin of test_stream_gm_vmem_matches_default: the
    VMEM-resident 3-plane (lam, byca, bycb) gradient accumulator must
    match the HBM-streamed default, with and without temporal blocking."""
    npml = 8
    cfg = st.SimConfig(nz=120, nx=60, dz=20.0, dx=20.0, nt=90, dt=0.002,
                       f0=10.0, npml=npml)
    vp = jnp.full(cfg.grid.shape, 3000.0).at[50:66, 24:40].add(250.0)
    rho = jnp.full(cfg.grid.shape, 2500.0, jnp.float32)
    lam = (rho * vp ** 2).astype(jnp.float32)
    survey = Survey(src_z=np.array([12, 60]), src_x=np.array([14, 30]),
                    rec_z=np.full(20, 76), rec_x=np.arange(12, 32))
    rs = pe.check_row_survey(survey.rec_z + 0, survey.rec_x + 0)
    sz = jnp.asarray(survey.src_z)
    sx = jnp.asarray(survey.src_x)
    stf = jnp.broadcast_to(
        jnp.asarray(st.ricker(cfg.f0, cfg.nt, cfg.dt), jnp.float32),
        (2, cfg.nt))

    def grads(obs):
        def loss(lam_, rho_, stf_):
            syn = ps.propagate_pallas_acoustic_streamed(cfg, rs, lam_, rho_,
                                                        stf_, sz, sx)
            return jnp.sum((syn - obs) ** 2)

        return jax.grad(loss, argnums=(0, 1, 2))(lam, rho, stf)

    monkeypatch.setenv("SEP2023_TPU_STREAM_T", "40")
    out_1 = np.asarray(ps.propagate_pallas_acoustic_streamed(
        cfg, rs, lam, rho, stf, sz, sx))
    assert np.abs(out_1).max() > 1e-8
    obs = jnp.asarray(out_1) * 1.1 + 0.05 * float(np.abs(out_1).max())

    for K in ("1", "2"):
        monkeypatch.setenv("SEP2023_TPU_STREAM_K", K)
        monkeypatch.delenv("SEP2023_TPU_STREAM_GM", raising=False)
        g_d = grads(obs)
        monkeypatch.setenv("SEP2023_TPU_STREAM_GM", "vmem")
        assert ps._gm_vmem()
        g_v = grads(obs)
        for name, a, b in zip(("lam", "rho", "stf"), g_v, g_d):
            a, b = np.asarray(a), np.asarray(b)
            assert np.abs(a - b).max() <= 1e-7 * max(np.abs(b).max(),
                                                     1e-30), (K, name)
    monkeypatch.delenv("SEP2023_TPU_STREAM_GM", raising=False)


def test_ac_stream_deep_pad_temporal_blocking(monkeypatch):
    """Acoustic twin of test_stream_deep_pad_temporal_blocking: PAD=32
    with K=5 forward / Kb=4 backward matches the PAD=16 K=1 run on a
    3-tile grid with reachable receivers."""
    npml = 8
    cfg = st.SimConfig(nz=120, nx=60, dz=20.0, dx=20.0, nt=90, dt=0.002,
                       f0=10.0, npml=npml)
    vp = jnp.full(cfg.grid.shape, 3000.0).at[50:66, 24:40].add(250.0)
    rho = jnp.full(cfg.grid.shape, 2500.0, jnp.float32)
    lam = (rho * vp ** 2).astype(jnp.float32)
    survey = Survey(src_z=np.array([12, 60]), src_x=np.array([14, 30]),
                    rec_z=np.full(20, 76), rec_x=np.arange(12, 32))
    rs = pe.check_row_survey(survey.rec_z + 0, survey.rec_x + 0)
    sz = jnp.asarray(survey.src_z)
    sx = jnp.asarray(survey.src_x)
    stf = jnp.broadcast_to(
        jnp.asarray(st.ricker(cfg.f0, cfg.nt, cfg.dt), jnp.float32),
        (2, cfg.nt))

    def grads(obs):
        def loss(lam_, rho_, stf_):
            syn = ps.propagate_pallas_acoustic_streamed(cfg, rs, lam_, rho_,
                                                        stf_, sz, sx)
            return jnp.sum((syn - obs) ** 2)

        return jax.grad(loss, argnums=(0, 1, 2))(lam, rho, stf)

    monkeypatch.setenv("SEP2023_TPU_STREAM_T", "40")
    monkeypatch.setenv("SEP2023_TPU_STREAM_K", "1")
    out_1 = np.asarray(ps.propagate_pallas_acoustic_streamed(
        cfg, rs, lam, rho, stf, sz, sx))
    assert np.abs(out_1).max() > 1e-8  # real arrivals, not round-off noise
    obs = jnp.asarray(out_1) * 1.1 + 0.05 * float(np.abs(out_1).max())
    g_1 = grads(obs)

    monkeypatch.setattr(ps, "PAD", 32)
    monkeypatch.setenv("SEP2023_TPU_STREAM_K", "5")
    assert ps._stream_K(cfg) == 5 and ps._stream_K_bwd(cfg) == 4
    out_k = np.asarray(ps.propagate_pallas_acoustic_streamed(
        cfg, rs, lam, rho, stf, sz, sx))
    g_k = grads(obs)

    assert np.abs(out_k - out_1).max() <= 1e-6 * np.abs(out_1).max()
    for name, a, b in zip(("lam", "rho", "stf"), g_k, g_1):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() <= 1e-5 * max(np.abs(b).max(), 1e-30), name


def test_ac_stream_temporal_blocking_matches_k1(monkeypatch):
    """Acoustic twin of test_stream_temporal_blocking_matches_k1 (K=2,
    ghost-step padding, multi-tile in-tile halo recomputation)."""
    monkeypatch.setenv("SEP2023_TPU_STREAM_T", "24")
    npml = 8
    cfg = st.SimConfig(nz=72, nx=60, dz=20.0, dx=20.0, nt=90, dt=0.002,
                       f0=10.0, npml=npml)
    vp = jnp.full(cfg.grid.shape, 3000.0).at[30:38, 24:40].add(250.0)
    rho = jnp.full(cfg.grid.shape, 2500.0, jnp.float32)
    lam = (rho * vp ** 2).astype(jnp.float32)
    survey = Survey(src_z=np.array([12, 40]), src_x=np.array([14, 30]),
                    rec_z=np.full(20, 50), rec_x=np.arange(12, 32))
    rs = pe.check_row_survey(survey.rec_z + 0, survey.rec_x + 0)
    sz = jnp.asarray(survey.src_z)
    sx = jnp.asarray(survey.src_x)
    stf = jnp.broadcast_to(
        jnp.asarray(st.ricker(cfg.f0, cfg.nt, cfg.dt), jnp.float32),
        (2, cfg.nt))

    def grads(obs):
        def loss(lam_, rho_, stf_):
            syn = ps.propagate_pallas_acoustic_streamed(cfg, rs, lam_, rho_,
                                                        stf_, sz, sx)
            return jnp.sum((syn - obs) ** 2)

        return jax.grad(loss, argnums=(0, 1, 2))(lam, rho, stf)

    monkeypatch.setenv("SEP2023_TPU_STREAM_K", "1")
    out_1 = np.asarray(ps.propagate_pallas_acoustic_streamed(
        cfg, rs, lam, rho, stf, sz, sx))
    obs = jnp.asarray(out_1) * 1.1 + 0.05 * float(np.abs(out_1).max())
    g_1 = grads(obs)

    monkeypatch.setenv("SEP2023_TPU_STREAM_K", "2")
    out_k = np.asarray(ps.propagate_pallas_acoustic_streamed(
        cfg, rs, lam, rho, stf, sz, sx))
    g_k = grads(obs)

    assert np.abs(out_k - out_1).max() <= 1e-6 * np.abs(out_1).max()
    for name, a, b in zip(("lam", "rho", "stf"), g_k, g_1):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() <= 1e-5 * max(np.abs(b).max(), 1e-30), name


def test_ac_stream_ring_sweeps_match_j1(monkeypatch):
    """Acoustic twin of test_stream_ring_sweeps_match_j1: ring-sweep
    megastep grouping vs the J=1 scan (compact plan, 5 tiles via the
    autouse T=16, nt-1 = 72 a multiple of both padding units)."""
    npml = 8
    cfg = st.SimConfig(nz=72, nx=60, dz=20.0, dx=20.0, nt=73, dt=0.002,
                       f0=10.0, npml=npml)
    assert ps._layout(cfg)[1] == 5
    vp = jnp.full(cfg.grid.shape, 3000.0).at[30:38, 24:40].add(250.0)
    rho = jnp.full(cfg.grid.shape, 2500.0, jnp.float32)
    lam = (rho * vp ** 2).astype(jnp.float32)
    survey = Survey(src_z=np.array([12, 40]), src_x=np.array([14, 30]),
                    rec_z=np.full(20, 50), rec_x=np.arange(12, 32))
    rs = pe.check_row_survey(survey.rec_z + 0, survey.rec_x + 0)
    sz = jnp.asarray(survey.src_z)
    sx = jnp.asarray(survey.src_x)
    stf = jnp.broadcast_to(
        jnp.asarray(st.ricker(cfg.f0, cfg.nt, cfg.dt), jnp.float32),
        (2, cfg.nt))

    def grads(obs):
        def loss(lam_, rho_, stf_):
            syn = ps.propagate_pallas_acoustic_streamed(cfg, rs, lam_, rho_,
                                                        stf_, sz, sx)
            return jnp.sum((syn - obs) ** 2)

        return jax.grad(loss, argnums=(0, 1, 2))(lam, rho, stf)

    out_1 = np.asarray(ps.propagate_pallas_acoustic_streamed(
        cfg, rs, lam, rho, stf, sz, sx))
    obs = jnp.asarray(out_1) * 1.1 + 0.05 * float(np.abs(out_1).max())
    g_1 = grads(obs)

    monkeypatch.setenv("SEP2023_TPU_STREAM_J", "3")
    monkeypatch.setenv("SEP2023_TPU_STREAM_JB", "3")
    out_j = np.asarray(ps.propagate_pallas_acoustic_streamed(
        cfg, rs, lam, rho, stf, sz, sx))
    g_j = grads(obs)

    assert np.abs(out_j - out_1).max() <= 1e-7 * np.abs(out_1).max()
    for name, a, b in zip(("lam", "rho", "stf"), g_j, g_1):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() <= 1e-5 * max(np.abs(b).max(), 1e-30), name


def test_ring_aware_layout_rebalance(monkeypatch):
    """Compiled-backend layout selection prefers ring-capable ~96-row
    tiles when the balanced compact layout would have < 4 tiles (fill-
    dominated, ring gated off): 560 rows -> 6x96 instead of 2x280
    (measured +16% gradient on chip); big grids (many tiles already) and
    interpret mode (CPU tests) keep the balanced choice.  Pure layout
    math — no kernels run."""
    monkeypatch.delenv("SEP2023_TPU_STREAM_T", raising=False)
    cfg = st.SimConfig(nz=560, nx=720, dz=10.0, dx=10.0, nt=101, dt=0.001,
                       f0=10.0, npml=32)
    T, n = ps._select_layout(cfg)[:2]
    assert n <= 2   # interpret mode: balanced (fewest tiles)

    monkeypatch.setattr(ps.eng, "_interpret", lambda: False)
    T, n = ps._select_layout(cfg)[:2]
    assert (T, n) == (96, 6)
    assert ps._stream_J(cfg) == 3          # ring now active by default

    cfg_big = st.SimConfig(nz=814, nx=2064, dz=10.0, dx=10.0, nt=101,
                           dt=0.001, f0=10.0, npml=32)
    T2, n2 = ps._select_layout(cfg_big)[:2]
    assert (T2, n2) == (88, 10)            # unchanged: already many tiles

    cfg_small = st.SimConfig(nz=120, nx=200, dz=10.0, dx=10.0, nt=101,
                             dt=0.001, f0=10.0, npml=24)
    T3, n3 = ps._select_layout(cfg_small)[:2]
    assert n3 <= 2                         # too short for 4x(>=72) tiles
