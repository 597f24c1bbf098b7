"""Signal ops: band-pass filter, taper window, spectral source estimation,
cross-correlation misfit, snapshots, survey tools."""
import jax.numpy as jnp
import numpy as np
import pytest

import sep2023_tpu as st
from sep2023_tpu import survey_tools
from sep2023_tpu.ops import misfit as mf
from sep2023_tpu.ops import signal as sg
from sep2023_tpu.propagator import propagate_snapshots


def test_bandpass_passes_and_rejects():
    nt, dt = 2048, 0.002
    t = np.arange(nt) * dt
    # bin-aligned frequencies (k = f*nt*dt integer) to avoid leakage skew
    lo = np.sin(2 * np.pi * (20 / (nt * dt)) * t)    # ~4.9 Hz, passband
    hi = np.sin(2 * np.pi * (256 / (nt * dt)) * t)   # 62.5 Hz, stopband
    corners = (1.0, 3.0, 20.0, 40.0)
    out_lo = np.asarray(sg.bandpass(jnp.asarray(lo), dt, corners))
    out_hi = np.asarray(sg.bandpass(jnp.asarray(hi), dt, corners))
    assert np.abs(out_lo).max() > 0.9
    assert np.abs(out_hi).max() < 0.02


def test_bandpass_amplitude_shape():
    H = np.asarray(sg.bandpass_amplitude(1000, 0.002, 1.0, 3.0, 20.0, 40.0))
    freq = np.fft.rfftfreq(1000, 0.002)
    assert np.allclose(H[(freq > 3.0) & (freq < 20.0)], 1.0)
    assert np.allclose(H[freq >= 40.0], 0.0)
    assert np.all((H >= 0) & (H <= 1.0 + 1e-12))


def test_taper_window():
    w = np.asarray(sg.taper_window(1000, 0.002, win_start=100, win_end=800,
                                   ratio=0.02))
    assert w[0] == 0.0
    assert np.allclose(w[150:750], 1.0)
    assert w[950] == 0.0


def test_source_update_recovers_scale_and_shift():
    """Wiener filter must recover a pure amplitude scaling of the source."""
    nt, dt = 500, 0.002
    s = st.ricker(10.0, nt, dt, amp=1.0)
    syn = np.stack([np.roll(s, k) for k in (5, 9, 13)])
    obs = 2.5 * syn
    W = sg.source_update_filter(jnp.asarray(obs), jnp.asarray(syn))
    s_new = np.asarray(sg.apply_source_filter(jnp.asarray(s), W))
    # exact scaling except in zero-energy bands suppressed by the Wiener eps
    assert np.abs(s_new - 2.5 * s).max() < 1e-3 * np.abs(s).max()


def test_xcorr_misfit_zero_at_match():
    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.normal(size=(4, 6, 100)))
    assert float(mf.normalized_crosscorr_misfit(d, d)) < 1e-10
    assert float(mf.normalized_crosscorr_misfit(d, 2.0 * d)) < 1e-10  # amplitude-blind
    d2 = jnp.asarray(rng.normal(size=(4, 6, 100)))
    assert float(mf.normalized_crosscorr_misfit(d, d2)) > 0.1


def test_snapshots():
    cfg = st.SimConfig(nz=50, nx=60, dz=20.0, dx=20.0, nt=101, dt=0.002,
                       f0=10.0, npml=10)
    vp = jnp.full(cfg.grid.shape, 3000.0)
    med = st.Medium(vp, vp / jnp.sqrt(3.0), jnp.full_like(vp, 2500.0))
    stf = jnp.asarray(st.ricker(cfg.f0, cfg.nt, cfg.dt))
    geom = st.ShotGeom(src_z=jnp.int32(20), src_x=jnp.int32(30),
                       rxz=jnp.float64(1.0),
                       rec_z=jnp.full(3, 30, jnp.int32),
                       rec_x=jnp.arange(25, 28, dtype=jnp.int32))
    data, snaps = propagate_snapshots(cfg, med.lam, med.mu, med.rho, stf,
                                      geom, save_every=10)
    assert snaps.vx.shape == (10, cfg.nz, cfg.nx)
    energy = np.asarray(jnp.sum(snaps.szz ** 2, axis=(1, 2)))
    assert energy[2] > 0  # wave exists after source onset


def test_vs_bounds_from_cloud():
    cloud = np.array([[1500.0, 3000.0, 5000.0],   # vp line
                      [900.0, 1900.0, 3100.0],    # vs high
                      [500.0, 1200.0, 2200.0]])   # vs low
    vp_img = np.array([[2000.0, 4000.0]])
    lo, hi = survey_tools.vs_bounds_from_cloud(vp_img, cloud)
    assert lo.shape == vp_img.shape
    assert np.all(lo < hi)
    assert np.all(hi <= vp_img / np.sqrt(2.0) - 1.0 + 1e-9)


def test_energy_trace_weights():
    rng = np.random.default_rng(0)
    obs = rng.normal(size=(3, 8, 50))
    obs[:, 2] *= 100.0  # one hot trace per shot
    w = survey_tools.energy_trace_weights(obs)
    assert w.shape == (3, 8)
    assert np.allclose(w.mean(), 1.0)
    assert (w[:, 2] < w[:, 0]).all()  # loud traces downweighted


def test_compute_rxz():
    vp = np.full((50, 60), 3000.0)
    vs = vp / np.sqrt(3.0)
    rxz = survey_tools.compute_rxz(vp, vs, [10, 20], [30, 40])
    # vp^2/(vp^2-2vs^2) with vs=vp/sqrt(3) -> 3.0
    assert np.allclose(rxz, 3.0, rtol=1e-6)


def test_dynamic_bandpass_matches_static():
    """make_preprocessed_l2(dynamic_bandpass=True) fed the precomputed
    amplitude response must equal the static filter_corners build — the
    invariant that lets multiscale stages share one compiled executable."""
    import jax
    import jax.numpy as jnp

    from sep2023_tpu.ops import misfit as mf
    from sep2023_tpu.ops import signal as sg

    nt, dt = 120, 0.002
    corners = (0.0, 1e-4, 2.0, 4.5)
    key = jax.random.PRNGKey(3)
    obs = jax.random.normal(key, (4, 9, nt))
    syn = jax.random.normal(jax.random.PRNGKey(4), (4, 9, nt))

    static = mf.make_preprocessed_l2(dt=dt, filter_corners=corners)
    dynamic = mf.make_preprocessed_l2(dt=dt, dynamic_bandpass=True)
    H = sg.bandpass_amplitude(nt, dt, *corners)
    a = float(static(obs, syn))
    b = float(dynamic(obs, syn, H))
    assert abs(a - b) < 1e-9 * abs(a)
    ga = jax.grad(lambda s: static(obs, s))(syn)
    gb = jax.grad(lambda s: dynamic(obs, s, H))(syn)
    assert float(jnp.abs(ga - gb).max()) < 1e-12 * float(jnp.abs(ga).max())


def test_check_reach_flags_unreachable_shots():
    """check_reach: a shot whose nearest receiver lies beyond
    vp_max*(nt-1)*dt is flagged (its traces are round-off noise and its
    misfit silently zero); a reachable shot is not.  Warns by default."""
    from sep2023_tpu.config import Survey

    cfg = st.SimConfig(nz=120, nx=60, dz=20.0, dx=20.0, nt=90, dt=0.002,
                       f0=10.0, npml=8)
    # reach = 3000 * 89 * 0.002 = 534 m = ~27 cells
    survey = Survey(src_z=np.array([3, 60]), src_x=np.array([14, 30]),
                    rec_z=np.full(20, 100), rec_x=np.arange(12, 32))
    with pytest.warns(UserWarning, match="cannot reach"):
        bad = survey_tools.check_reach(cfg, survey, 3000.0)
    assert bad == [0, 1]  # rows 97 / 40 below the sources: both out of reach

    survey2 = Survey(src_z=np.array([3, 60]), src_x=np.array([14, 30]),
                     rec_z=np.full(20, 76), rec_x=np.arange(12, 32))
    assert survey_tools.check_reach(cfg, survey2, 3000.0) == [0]
    assert survey_tools.check_reach(cfg, survey2, 3000.0, warn=False) == [0]

    # ragged per-shot spreads: (S, R) rec arrays take the per-shot row
    survey3 = Survey(src_z=np.array([3, 60]), src_x=np.array([14, 30]),
                     rec_z=np.stack([np.full(20, 20), np.full(20, 100)]),
                     rec_x=np.stack([np.arange(12, 32)] * 2))
    assert survey_tools.check_reach(cfg, survey3, 3000.0, warn=False) == [1]
