"""Neural-network model reparameterization through the propagator.

The reference's TorchFWI layer exists to make the solver compose with
nn.Module parameterizations ("integration of FWI with neural networks",
reference README; the 7 heads of FWI_ops.py are the shipped instance).
Here that composability is jax.grad through the custom_vjp propagator:
examples/neural_reparam_fwi.py trains a deep-image-prior-style decoder
CNN against the waveform misfit.  This test drives it on a tiny grid."""
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

import sep2023_tpu as st
from sep2023_tpu import models, parallel

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))


def test_cnn_reparameterized_fwi_converges():
    from neural_reparam_fwi import invert_nn, make_decoder

    nz, nx, npml = 40, 56, 8
    cfg = st.SimConfig(nz=nz + 2 * npml, nx=nx + 2 * npml, dz=20.0,
                       dx=20.0, nt=140, dt=0.002, f0=10.0, npml=npml)
    vp_t = np.full((nz, nx), 3000.0)
    vp_t[18:26, 20:36] += 250.0
    vp_bg = models.smooth(vp_t, 8.0)
    src_x = np.array([10, 28, 46])
    survey = st.Survey(src_z=np.full(3, 2), src_x=src_x,
                       rec_z=np.full(20, 24), rec_x=np.arange(12, 32))
    stf = jnp.broadcast_to(
        jnp.asarray(st.ricker(cfg.f0, cfg.nt, cfg.dt), jnp.float32),
        (3, cfg.nt))

    # the decoder crops its 4-multiple upsample to odd sizes exactly
    _, apply = make_decoder(nz - 1, nx - 3)
    p0, _ = make_decoder(nz - 1, nx - 3)
    assert apply(p0).shape == (nz - 1, nx - 3)

    rho = 2500.0
    gen = parallel.make_forward(cfg, survey)
    vp_pad = jnp.asarray(st.medium.pad_model_np(vp_t, npml), jnp.float32)
    vs_pad = vp_pad / jnp.sqrt(3.0)
    rr = jnp.full(cfg.grid.shape, rho, jnp.float32)
    obs = gen((vp_pad ** 2 - 2 * vs_pad ** 2) * rr, vs_pad ** 2 * rr, rr,
              stf)
    assert float(jnp.abs(obs).max()) > 1e-3  # receivers in wave reach

    _, losses = invert_nn(cfg, survey, vp_bg, rho, stf, obs, n_steps=12,
                          lr=4e-3, width=8)
    assert np.all(np.isfinite(losses))
    assert losses[-1] < 0.7 * losses[0], losses
