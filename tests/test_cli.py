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
    assert np.isfinite(img).all() and np.abs(img).max() > 0
    prof = np.abs(muted[8:-8, 8:-8]).mean(axis=1)
    assert abs(int(prof.argmax()) - z_refl) <= 4, (prof.argmax(), z_refl)
