"""CLI driver pieces (geometry scaling regression, arg validation)."""
import numpy as np
import pytest

from sep2023_tpu.cli import benchmark_problem


def test_benchmark_problem_receivers_in_bounds():
    """Receiver row must stay inside the physical grid for any nz — jnp
    gathers silently clamp out-of-range indices, which produced zero data
    and a zero misfit for small test grids (regression)."""
    for nz in (51, 101, 201):
        cfg, survey, geoms, stf = benchmark_problem(nz=nz, nx=81, nt=16)
        assert survey.rec_z.max() < nz
        assert survey.rec_z.min() > 0
        assert survey.rec_x.max() < 81
        assert int(geoms.rec_z.max()) < cfg.nz - cfg.npml
        assert stf.shape == (survey.n_shots, 16)


def test_benchmark_problem_reference_shape():
    """Default workload matches the reference benchmark (Main-000): 19 shots,
    181 receivers at z=95, padded grid 165x265."""
    cfg, survey, geoms, stf = benchmark_problem()
    assert survey.n_shots == 19
    assert survey.n_rec == 181
    assert int(survey.rec_z[0]) == 95
    assert (cfg.nz, cfg.nx) == (165, 265)
    assert cfg.nt == 1501


import os

import jax
import numpy as np

from sep2023_tpu import cli
from sep2023_tpu.config import Survey

# tiny twin-experiment workload: 3 shots, 28 receivers, 80 steps
TINY = ["--nz", "28", "--nx", "48", "--nt", "80", "--npml", "8",
        "--niter", "2", "--x64"]


def _hist(exp):
    h = np.loadtxt(os.path.join(exp, "Results", "loss.txt"), ndmin=2)
    return h[:, 1]


def test_invert_sharded_trajectory_matches_single(tmp_path):
    """The production `invert` path sharded over the CPU mesh must produce
    the same L-BFGS-B loss trajectory as single-device — the reference's
    --ngpu invariance (Torch_Fwi.cpp:71-101), now default-on."""
    e1 = str(tmp_path / "one")
    em = str(tmp_path / "mesh")
    cli.main(["invert", *TINY, "--exp-name", e1, "--n-devices", "1"])
    assert jax.device_count() >= 3
    cli.main(["invert", *TINY, "--exp-name", em])  # auto: 3-device mesh
    h1, hm = _hist(e1), _hist(em)
    assert len(h1) == len(hm) >= 2
    np.testing.assert_allclose(h1, hm, rtol=1e-6)
    assert hm[-1] < hm[0]  # and the twin experiment converges


def test_invert_xcorr_with_energy_weights(tmp_path):
    """Twin experiment under the normalized cross-correlation misfit
    (if_cross_misfit) with 1/energy trace balancing converges; --save-mat
    writes reference-format .mat snapshots alongside (Main-001:144-150)."""
    e = str(tmp_path / "xc")
    cli.main(["invert", *TINY, "--exp-name", e, "--n-devices", "1",
              "--misfit", "xcorr", "--energy-weights", "--save-mat"])
    h = _hist(e)
    assert h[-1] < h[0]
    from scipy.io import loadmat
    rdir = os.path.join(e, "Results")
    mats = sorted(f for f in os.listdir(rdir) if f.endswith(".mat"))
    assert any(f.startswith("model_") for f in mats)
    assert any(f.startswith("grad_") for f in mats)
    m = loadmat(os.path.join(rdir, mats[-1]))
    npz = np.load(os.path.join(rdir, mats[-1].replace(".mat", ".npz")))
    for k in npz.files:
        np.testing.assert_array_equal(np.asarray(m[k]), npz[k])


def test_generate_data_roundtrip_and_resume(tmp_path):
    """--generate_data -> Shot_*.bin -> invert loads them (the reference's
    two-invocation workflow); --resume continues from the last snapshot."""
    e = str(tmp_path / "rt")
    d = str(tmp_path / "data")
    cli.main(["invert", *TINY, "--exp-name", e, "--data-dir", d,
              "--generate_data"])
    assert os.path.exists(os.path.join(d, "Shot_pr0.bin"))
    # the reference's two-file config side channel is exported alongside
    from sep2023_tpu.config import sim_config_from_json
    cfg = sim_config_from_json(os.path.join(d, "para_file.json"))
    assert (cfg.nt, cfg.npml) == (80, 8)
    sv = Survey.from_json(os.path.join(d, "survey_file.json"))
    assert sv.n_shots == 3
    # full reference workflow: run the inversion STRAIGHT off the exported
    # para_file.json (grid/survey/data_dir all come from the JSON pair)
    e2 = str(tmp_path / "fromjson")
    cli.main(["invert", "--para-json", os.path.join(d, "para_file.json"),
              "--niter", "2", "--x64", "--exp-name", e2, "--n-devices", "1"])
    h2 = _hist(e2)
    assert h2[-1] < h2[0]
    cli.main(["invert", *TINY, "--exp-name", e, "--data-dir", d,
              "--n-devices", "1"])
    n0 = len(_hist(e))
    cli.main(["invert", *TINY, "--exp-name", e, "--data-dir", d,
              "--n-devices", "1", "--resume"])
    h = _hist(e)
    assert len(h) > n0                 # appended iterations
    assert h[n0] <= h[0] * (1 + 1e-9)  # resumed from the optimized model


def test_invert_stf_joint_source_inversion(tmp_path):
    """--invert-stf adds the wavelets to the parameter set (via the d_stf
    adjoint gradient) and still reduces the misfit."""
    e = str(tmp_path / "stf")
    cli.main(["invert", *TINY, "--exp-name", e, "--n-devices", "1",
              "--invert-stf"])
    h = _hist(e)
    assert h[-1] < h[0]
    snaps = sorted(os.listdir(os.path.join(e, "Results")))
    latest = [s for s in snaps if s.startswith("model_")][-1]
    with np.load(os.path.join(e, "Results", latest)) as z:
        assert "stf" in z.files and z["stf"].shape == (3, 80)


def test_survey_json_per_trace_conditioning(tmp_path, capsys):
    """A reference-schema survey_file.json with per-trace windows/weights and
    per-shot src_weights drives invert through the per-trace loss path
    (Src_Rec.cu:145-200)."""
    S, R = 3, 28
    survey = Survey(src_z=np.ones(S), src_x=np.array([10, 20, 30]),
                    rec_z=np.full(R, 22), rec_x=np.arange(10, 38),
                    win_start=np.zeros((S, R)),
                    win_end=np.full((S, R), 79.0),
                    trace_weights=np.ones((S, R)),
                    src_weights=np.array([1.0, 0.5, 1.0]))
    sj = str(tmp_path / "survey.json")
    survey.to_json(sj)
    e = str(tmp_path / "pt")
    cli.main(["invert", *TINY, "--exp-name", e, "--n-devices", "1",
              "--survey-json", sj])
    out = capsys.readouterr().out
    assert "per-trace windows/weights active" in out
    assert _hist(e)[-1] < _hist(e)[0]


def test_invert_multiscale_with_src_update(tmp_path, capsys):
    """Frequency-continuation stages with in-loop Wiener source
    re-estimation at each stage (if_src_update) run end-to-end."""
    e = str(tmp_path / "ms")
    cli.main(["invert", *TINY[:-3], "--niter", "6", "--x64",
              "--exp-name", e, "--n-devices", "1", "--multiscale",
              "--src-update"])
    out = capsys.readouterr().out
    assert "multiscale stage 6/6" in out
    assert out.count("source wavelets re-estimated") == 6
    # stages that converge in 0 iterations skip the scipy callback, so the
    # history can be shorter than the stage count — but never empty
    assert len(_hist(e)) >= 1


def test_invert_multiscale_sharded(tmp_path):
    """Multiscale (dynamic band-pass as a per-shot trace_aux array) composed
    with the default-on shot mesh: the (S, nfreq) response must shard
    alongside the padded shot axis."""
    e = str(tmp_path / "mss")
    cli.main(["invert", *TINY[:-3], "--niter", "6", "--x64",
              "--exp-name", e, "--multiscale"])  # auto: 3-device mesh
    h = _hist(e)
    assert len(h) >= 1 and np.isfinite(h).all()


@pytest.mark.parametrize("physics", ["acoustic", "elastic"])
def test_rtm_driver_images_reflector(tmp_path, physics):
    """`rtm` (the standalone CLI's adjoint-imaging flow, main.cu:322+)
    must localize a reflector the smooth background lacks — under both the
    acoustic time-derivative and the elastic zero-lag conditions."""
    out = str(tmp_path / "img.npz")
    cli.main(["rtm", "--physics", physics, "--nz", "40", "--nx", "56",
              "--nt", "350", "--npml", "8", "--out", out])
    with np.load(out) as z:
        img, muted, z_refl = z["image"], z["image_muted"], int(z["z_reflector"])
        comp, illum = z["image_compensated"], z["illumination"]
    assert np.isfinite(img).all() and np.abs(img).max() > 0
    prof = np.abs(muted[8:-8, 8:-8]).mean(axis=1)
    assert abs(int(prof.argmax()) - z_refl) <= 4, (prof.argmax(), z_refl)

    # TRUE illumination compensation (per-cell source energy, not a scalar
    # rescale): energy decays away from the near-surface sources, so
    # dividing by it must RAISE the deep reflector's amplitude relative to
    # the shallow section
    core = np.s_[8:-8, 16:-16]
    ill = illum[core]
    assert np.isfinite(illum).all() and ill.min() >= 0 and ill.max() > 0
    assert ill[:6].mean() > ill[-6:].mean()  # shallow > deep energy
    shallow = np.s_[10:z_refl - 8]
    deep = np.s_[z_refl - 3:z_refl + 4]
    mute_rows = np.abs(muted[8:-8, 16:-16]).mean(axis=1)
    comp_rows = np.abs((comp * (np.abs(muted) > 0))[8:-8, 16:-16]).mean(axis=1)
    ratio_raw = mute_rows[deep].max() / (mute_rows[shallow].mean() + 1e-30)
    ratio_comp = comp_rows[deep].max() / (comp_rows[shallow].mean() + 1e-30)
    assert ratio_comp > ratio_raw, (ratio_comp, ratio_raw)


def test_custom_bands_schedule(tmp_path, capsys):
    """--bands configures the multiscale corner schedule (Main-001:46-51):
    a 2-stage custom schedule runs exactly 2 band stages and converges."""
    e = str(tmp_path / "bands")
    cli.main(["invert", *TINY[:-3], "--niter", "4", "--x64",
              "--exp-name", e, "--n-devices", "1",
              "--bands", "0,1e-4,2,4;0,1e-4,2,8"])
    out = capsys.readouterr().out
    assert "multiscale stage 2/2" in out
    assert "band (0.0, 0.0001, 2.0, 8.0)" in out
    h = _hist(e)
    assert len(h) >= 1 and np.isfinite(h).all()
    # a malformed schedule fails loudly
    import pytest as _pytest
    with _pytest.raises(SystemExit):
        cli.main(["invert", *TINY, "--exp-name", e, "--bands", "1,2,3"])


def test_scalar_window_changes_misfit(tmp_path):
    """--win (the para if_win scalar taper, utilities.cu:790-884) must
    change the recorded loss trajectory vs the unwindowed run."""
    e1 = str(tmp_path / "nowin")
    e2 = str(tmp_path / "win")
    base = ["invert", *TINY, "--n-devices", "1"]
    cli.main([*base, "--exp-name", e1])
    cli.main([*base, "--exp-name", e2, "--win", "0,60"])
    h1, h2 = _hist(e1), _hist(e2)
    assert np.isfinite(h2).all() and h2[0] > 0
    assert abs(h1[0] - h2[0]) / h1[0] > 1e-3  # the window really applies


def test_src_weight_semantics(tmp_path):
    """Per-shot src_weight scales the RESIDUAL (utilities.cu:838): doubling
    every weight must quadruple the initial misfit (misfit ∝ w²)."""
    import json

    def survey_json(path, wgt):
        d = {"nShots": 2}
        for i, sx in enumerate((14, 30)):
            d[f"shot{i}"] = {"z_src": 1, "x_src": sx, "nrec": 20,
                             "z_rec": [24] * 20,
                             "x_rec": list(range(12, 32)),
                             "src_weight": wgt}
        with open(path, "w") as fp:
            json.dump(d, fp)

    s1 = str(tmp_path / "s1.json")
    s2 = str(tmp_path / "s2.json")
    survey_json(s1, 1.0)
    survey_json(s2, 2.0)
    base = ["invert", *TINY[:-3], "--niter", "1", "--x64",
            "--n-devices", "1"]
    e1, e2 = str(tmp_path / "w1"), str(tmp_path / "w2")
    cli.main([*base, "--exp-name", e1, "--survey-json", s1])
    cli.main([*base, "--exp-name", e2, "--survey-json", s2])
    h1, h2 = _hist(e1), _hist(e2)
    assert abs(h2[0] / h1[0] - 4.0) < 1e-6, (h1[0], h2[0])


def test_forward_driver_writes_reference_data(tmp_path, capsys):
    """`forward` (Main-000): generates observed data, reports throughput,
    and exports the reference-schema Shot_*.bin + para/survey JSON pair —
    for both physics modes."""
    d = str(tmp_path / "fdata")
    cli.main(["forward", "--nz", "28", "--nx", "48", "--nt", "60",
              "--npml", "8", "--data-dir", d])
    out = capsys.readouterr().out
    assert "GCell/s" in out
    assert os.path.exists(os.path.join(d, "Shot_ett0.bin"))
    from sep2023_tpu.config import Survey, sim_config_from_json
    cfg = sim_config_from_json(os.path.join(d, "para_file.json"))
    sv = Survey.from_json(os.path.join(d, "survey_file.json"))
    raw = np.fromfile(os.path.join(d, "Shot_pr0.bin"), np.float32)
    assert raw.size == sv.n_rec * cfg.nt
    assert np.isfinite(raw).all() and np.abs(raw).max() > 0

    da = str(tmp_path / "fdata_ac")
    cli.main(["forward", "--nz", "28", "--nx", "48", "--nt", "60",
              "--npml", "8", "--data-dir", da, "--physics", "acoustic"])
    raw = np.fromfile(os.path.join(da, "Shot_pr0.bin"), np.float32)
    assert np.isfinite(raw).all() and np.abs(raw).max() > 0


def test_invert_ragged_survey_json(tmp_path, capsys):
    """End-to-end invert from a survey file with HETEROGENEOUS per-shot
    spreads (Src_Rec.cu:87-116): the live mask activates the per-trace
    loss and the inversion converges."""
    import json

    d = {"nShots": 3}
    for i, (sx, n) in enumerate(((10, 20), (20, 28), (30, 24))):
        d[f"shot{i}"] = {"z_src": 1, "x_src": sx, "nrec": n,
                         "z_rec": [22] * n,
                         "x_rec": list(range(10, 10 + n))}
    sj = str(tmp_path / "ragged.json")
    with open(sj, "w") as fp:
        json.dump(d, fp)
    e = str(tmp_path / "rg")
    cli.main(["invert", *TINY, "--exp-name", e, "--n-devices", "1",
              "--survey-json", sj])
    out = capsys.readouterr().out
    assert "incl. ragged live mask" in out
    h = _hist(e)
    assert h[-1] < h[0]


def test_para_json_filter_becomes_band_stage(tmp_path, capsys):
    """A para_file.json `filter` entry (Parameter.cpp:139-177) runs one
    band-passed stage."""
    import json

    from sep2023_tpu.config import sim_config_to_json
    # generate data + config pair first
    e = str(tmp_path / "pf")
    dd = str(tmp_path / "Data")
    cli.main(["invert", *TINY, "--exp-name", e, "--data-dir", dd,
              "--generate_data"])
    pf = str(tmp_path / "Data" / "para_file.json")
    with open(pf) as fp:
        pd = json.load(fp)
    pd["filter"] = [0.0, 1e-4, 2.0, 9.0]
    with open(pf, "w") as fp:
        json.dump(pd, fp)
    cli.main(["invert", "--para-json", pf, "--niter", "2", "--x64",
              "--exp-name", e, "--n-devices", "1"])
    out = capsys.readouterr().out
    assert "band-pass from para filter" in out
    assert "band (0.0, 0.0001, 2.0, 9.0)" in out
    assert len(_hist(e)) >= 1
