"""Marmousi-scale twin-experiment FWI on the streamed Pallas engine.

A 750x2000-cell (7.5 km x 20 km at dz=dx=10 m) overthrust-style model —
814x2064 padded, far past the fused engine's VMEM range — inverted
end-to-end on one chip: observed data from the true model, L-BFGS-B from a
smoothed init, gradients through the grid-size-independent streamed
backward (ops/pallas_stream.py).

Run:  python examples/marmousi_scale.py [outdir] [n_iters]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import sep2023_tpu as st
from sep2023_tpu import models, optimize, parallel
from sep2023_tpu.config import Survey
from sep2023_tpu.ops import pallas_engine as pe
from sep2023_tpu.ops import pallas_stream as ps


def main(outdir="scratch/marmousi_scale", n_iters=3, nz=750, nx=2000,
         nt=2001, n_shots=24, npml=32):
    """Defaults are the Marmousi-scale TPU run; the smaller overrides let
    the same machinery smoke-test on CPU (interpret mode)."""
    os.makedirs(outdir, exist_ok=True)
    n_iters, nz, nx, nt, n_shots = (int(v) for v in
                                    (n_iters, nz, nx, nt, n_shots))
    dh = 10.0
    dt = 0.001                    # 2 s window (receivers at 0.6 nz ~ 1.5 s out)
    cfg = st.SimConfig(nz=nz + 2 * npml, nx=nx + 2 * npml, dz=dh, dx=dh,
                       nt=nt, dt=dt, f0=6.0, npml=npml)
    print(f"grid {cfg.nz}x{cfg.nx} padded, nt={nt}; "
          f"fused gradient fits: {pe.grad_vmem_fits(cfg)}; "
          f"streamed layout {ps._layout(cfg)}", flush=True)

    vp_t = models.overthrust_vp(nz, nx, v_top=2600.0, v_step=300.0)
    vp_0 = models.smooth(vp_t, 24.0)
    pad = lambda m: jnp.asarray(st.medium.pad_model_np(m, npml), jnp.float32)
    # rho is built from the scalar INSIDE the traced losses (a closed-over
    # device plane would compile in as a constant — CLAUDE.md JAX rules)
    rho_c = 2300.0
    rho = jnp.full(cfg.grid.shape, rho_c, jnp.float32)
    cfg.check_stability(float(vp_t.max()))

    # 24 shots across the top, receivers on a deep row (DAS-style)
    src_x = np.linspace(40, nx - 40, n_shots).astype(np.int64)
    rec_row = int(0.6 * nz)
    survey = Survey(src_z=np.full(len(src_x), 2), src_x=src_x,
                    rec_z=np.full(nx - 40, rec_row),
                    rec_x=np.arange(20, nx - 20))
    stf = jnp.broadcast_to(
        jnp.asarray(st.ricker(cfg.f0, nt, dt), jnp.float32),
        (len(src_x), nt))
    w = jnp.ones((len(src_x),), jnp.float32)

    def to_lame(vp_pad):
        vs_pad = vp_pad / jnp.sqrt(3.0)
        rr = jnp.full(cfg.grid.shape, rho_c, vp_pad.dtype)  # in-trace
        return ((vp_pad ** 2 - 2 * vs_pad ** 2) * rr, vs_pad ** 2 * rr)

    print("generating observed data (production forward builder) ...",
          flush=True)
    t0 = time.time()
    gen = ps.tpu_jit(parallel.make_forward(cfg, survey, use_pallas=True,
                                           shot_chunk=4))
    lam_t, mu_t = to_lame(pad(vp_t))
    obs = jax.block_until_ready(gen(lam_t, mu_t, rho, stf))
    print(f"  {len(src_x)} shots in {time.time()-t0:.1f}s (incl. compile)",
          flush=True)

    # shot_chunk=2 bounds the streamed boundary-strip residents (~1.9 GB
    # per in-flight shot at this nt) via the custom-vjp gradient
    # accumulator (parallel._chunked_sum; auto_shot_chunk picks 3 for this
    # shape) — the production path; unchunked 24-shot residuals would
    # exceed HBM
    data_loss = parallel.make_pallas_misfit(cfg, survey, shot_chunk=2)

    def loss(params, stf_, obs_):
        vp_pad = jnp.pad(jnp.asarray(params["vp"], jnp.float32), npml,
                         mode="edge")
        lam, mu = to_lame(vp_pad)
        rr = jnp.full(cfg.grid.shape, rho_c, jnp.float32)
        return data_loss(lam, mu, rr, stf_, obs_, w)

    obj = optimize.ScipyObjective(loss, {"vp": vp_0}, aux=(stf, obs))
    t0 = time.time()
    f0 = obj.fun(obj.x0)   # cached — minimize's first evaluation reuses it
    res = optimize.lbfgsb(obj, maxiter=int(n_iters))
    vp_out = obj.unpack(res.x)["vp"]
    err0 = np.abs(vp_0 - vp_t).mean()
    err1 = np.abs(np.asarray(vp_out) - vp_t).mean()
    np.savez(os.path.join(outdir, "marmousi_scale.npz"),
             vp_true=vp_t, vp_init=vp_0, vp_out=np.asarray(vp_out))
    print(f"misfit {f0:.4e} -> {res.fun:.4e} after {res.nit} iterations "
          f"({obj.n_evals} evals, {time.time()-t0:.0f}s); "
          f"mean |vp err| {err0:.1f} -> {err1:.1f} m/s", flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
