"""High-level ElasticPropagator facade (the reference's propagator.py API)."""
import numpy as np
import pytest

from sep2023_tpu.api import ElasticPropagator, Model
from sep2023_tpu.config import Survey


@pytest.fixture(scope="module")
def setup():
    nz, nx = 36, 52
    vp = np.full((nz, nx), 3000.0)
    vp[20:28, 20:36] += 250.0
    vs = vp / np.sqrt(3.0)
    rho = np.full((nz, nx), 2500.0)
    model = Model(nx=nx, nz=nz, dx=20.0, dz=20.0, nt=200, dt=0.002,
                  nPml=10, vp=vp, vs=vs, rho=rho)
    survey = Survey(src_z=np.array([2, 2]), src_x=np.array([12, 40]),
                    rec_z=np.full(20, 30), rec_x=np.arange(14, 34))
    return model, survey, vp, vs, rho


def test_apply_forward(setup):
    model, survey, vp, vs, rho = setup
    prop = ElasticPropagator(model, survey)
    data = prop.apply_forward()
    assert data.shape == (2, 4, 20, 200)
    assert np.isfinite(data).all()
    assert np.abs(data).max() > 0


def test_apply_gradient(setup):
    model, survey, vp, vs, rho = setup
    prop = ElasticPropagator(model, survey)
    obs = prop.apply_forward()

    init = Model(**{**model.__dict__, "vp": np.full_like(vp, 3000.0),
                    "vs": np.full_like(vs, 3000.0 / np.sqrt(3.0))})
    out = prop.apply_gradient(init, obs, channels=("ett", "vx", "vz"))
    assert out["misfit"] > 0
    assert out["grad_vp"].shape == vp.shape
    assert out["grad_stf"].shape == (2, model.nt)
    # gradient concentrates around the anomaly region
    g = np.abs(out["grad_vp"])
    assert g[18:30, 18:38].max() > 0
    for k in ("grad_vp", "grad_vs", "grad_rho", "grad_stf"):
        assert np.isfinite(out[k]).all()

    # gradient with the true model and its own data is ~zero
    out0 = prop.apply_gradient(model, obs)
    assert out0["misfit"] < 1e-12 * max(out["misfit"], 1.0)


def test_apply_gradient_sharded_matches_local(setup):
    """apply_gradient(n_devices=2) must reproduce the single-device result
    (the reference's ngpu argument; 2 shots over 2 mesh devices)."""
    model, survey, vp, vs, rho = setup
    prop = ElasticPropagator(model, survey)
    obs = prop.apply_forward()
    init = Model(**{**model.__dict__, "vp": np.full_like(vp, 3000.0),
                    "vs": np.full_like(vs, 3000.0 / np.sqrt(3.0))})
    out1 = prop.apply_gradient(init, obs, channels=("ett",), n_devices=1)
    out2 = prop.apply_gradient(init, obs, channels=("ett",), n_devices=2)
    assert np.isclose(out1["misfit"], out2["misfit"], rtol=1e-5)
    for k in ("grad_vp", "grad_vs", "grad_rho", "grad_stf"):
        a, b = out1[k], out2[k]
        assert a.shape == b.shape
        scale = np.abs(a).max() + 1e-30
        assert np.abs(a - b).max() / scale < 5e-5, k  # f32 psum order
