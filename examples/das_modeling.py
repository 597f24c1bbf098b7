"""DAS modeling walk-through — the DAS_Waveform_Modeling notebook flows:

1. analytical DAS gauge-length responses for fibers of varying curvature and
   quadrature order (Fig-2-3-Analytical-DAS-Waveform.ipynb)
2. numerical solver vs analytical 2D solution (000-Solver-Benchmark.ipynb)
3. wavefield snapshots (the CPU solver's save_wavefield)

Run:  python examples/das_modeling.py [outdir]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

import sep2023_tpu as st
from sep2023_tpu import analytic, das
from sep2023_tpu.propagator import propagate_snapshots


def quadrature_study():
    vp, vs, rho, f0, M0 = 3000.0, 1500.0, 2500.0, 25.0, 1e15
    M = np.eye(3)
    print("DAS quadrature-convergence study (max rel error vs 21-pt):")
    for gl in (10.0, 20.0, 50.0):
        for r_gl, name in ((1.0 / np.pi, "curvy"), (2.0 / np.pi, "medium"),
                           (1e10 / np.pi, "straight")):
            cable = das.arc_fiber(gl, r_gl, center=(120.0, 140.0, 100.0))
            kw = dict(tmin=0.0, tmax=0.3, dt=0.002, f0=f0, M0=M0, M=M)
            full = das.das_response(vp, vs, rho, gl, cable, 21, (0, 0, 0), **kw)
            errs = []
            for nq in (1, 3, 7):
                r = das.das_response(vp, vs, rho, gl, cable, nq, (0, 0, 0), **kw)
                errs.append(np.abs(r - full).max() / np.abs(full).max())
            print(f"  GL={gl:5.1f} {name:9s}: nq=1 {errs[0]:.3f}  "
                  f"nq=3 {errs[1]:.3f}  nq=7 {errs[2]:.3f}")


def solver_vs_analytic(outdir):
    npml = 24
    cfg = st.SimConfig(nz=160 + 2 * npml, nx=240 + 2 * npml, dz=10.0,
                       dx=10.0, nt=700, dt=0.001, f0=10.0, npml=npml)
    vp = jnp.full(cfg.grid.shape, 4000.0)
    med = st.Medium(vp, vp / jnp.sqrt(3.0), jnp.full_like(vp, 2500.0))
    geom = st.ShotGeom(src_z=jnp.int32(npml + 30), src_x=jnp.int32(npml + 60),
                       rxz=jnp.float32(1.0),
                       rec_z=jnp.array([npml + 110], jnp.int32),
                       rec_x=jnp.array([npml + 160], jnp.int32))
    stf = jnp.asarray(st.ricker(cfg.f0, cfg.nt, cfg.dt, amp=1.0), jnp.float32)
    data, snaps = propagate_snapshots(cfg, med.lam, med.mu, med.rho, stf,
                                      geom, save_every=25)
    n = data.shape[-1]
    t = np.arange(n) * cfg.dt
    U = analytic.displacement_2d(4000.0, 4000.0 / np.sqrt(3.0), 2500.0,
                                 1000.0, 800.0, t, cfg.f0, 1e16, np.eye(3))
    c = np.corrcoef(np.asarray(data[2, 0]), -U[2][:n])[0, 1]
    print(f"numerical vz vs analytical Uz correlation: {c:.4f}")
    np.savez(f"{outdir}/solver_vs_analytic.npz", data=np.asarray(data),
             analytic=U, snaps_vz=np.asarray(snaps.vz))
    print(f"saved traces + wavefield movie to {outdir}/solver_vs_analytic.npz")


if __name__ == "__main__":
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp"
    os.makedirs(outdir, exist_ok=True)
    quadrature_study()
    solver_vs_analytic(outdir)
