"""Time-reversed wavefield reconstruction stability — SURVEY.md hard part
(2): the backward sweep reconstructs the forward field from the final state
plus boundary strips; integrating all the way back, the field at t=0 must
return to (near) zero in the interior, despite the CPML region being
excluded and re-injected (el_stress.cu:92, libCUFD.cu:553-582)."""
import jax
import jax.numpy as jnp
import numpy as np

import sep2023_tpu as st
from sep2023_tpu import propagator as P


def test_reconstruction_returns_to_zero():
    npml = 12
    cfg = st.SimConfig(nz=60 + 2 * npml, nx=80 + 2 * npml, dz=15.0, dx=15.0,
                       nt=700, dt=0.0015, f0=12.0, npml=npml)
    key = jax.random.PRNGKey(5)
    vp = 3000.0 + 150.0 * jax.random.normal(key, cfg.grid.shape)
    med = st.Medium(vp, vp / jnp.sqrt(3.0), jnp.full(cfg.grid.shape, 2500.0))
    lam, mu, rho = med.lam, med.mu, med.rho
    stf = jnp.asarray(st.ricker(cfg.f0, cfg.nt, cfg.dt))
    geom = st.ShotGeom(src_z=jnp.int32(npml + 8), src_x=jnp.int32(npml + 30),
                       rxz=jnp.float64(1.0),
                       rec_z=jnp.full(8, npml + 40, jnp.int32),
                       rec_x=jnp.arange(npml + 20, npml + 28,
                                        dtype=jnp.int32))

    data, final, bnds = P._forward(cfg, lam, mu, rho, stf, geom,
                                   save_bnd=True)
    mat = st.material_fields(lam, mu, rho)
    cp, mask_f, mask_i = P._consts(cfg, lam.dtype)
    cp = jax.tree.map(jnp.asarray, cp)

    # reconstruction-only reverse sweep (the primal half of _propagate_bwd)
    def rbody(f, xs):
        bnd, amp = xs
        f = P._velocity_reverse(f, mat, mask_i, cfg)
        f = P.Fields(vz=P._inject_strips(f.vz, bnd.vz, cfg),
                     vx=P._inject_strips(f.vx, bnd.vx, cfg),
                     szz=f.szz, sxx=f.sxx, sxz=f.sxz)
        szz, sxx = P._add_source(f.szz, f.sxx, amp, geom, cfg, sign=-1.0)
        f = P.Fields(f.vz, f.vx, szz, sxx, f.sxz)
        f = P._stress_reverse(f, mat, mask_i, cfg)
        f = P.Fields(vz=f.vz, vx=f.vx,
                     szz=P._inject_strips(f.szz, bnd.szz, cfg),
                     sxx=P._inject_strips(f.sxx, bnd.sxx, cfg),
                     sxz=P._inject_strips(f.sxz, bnd.sxz, cfg))
        return f, None

    f0, _ = jax.lax.scan(rbody, final.f, (bnds, stf[:cfg.nt - 1]),
                         reverse=True)

    # peak stress scale during the run (from pr recordings)
    scale = float(jnp.abs(data[0]).max())
    zi, xi = cfg.grid.interior_slices()
    for name, arr in zip(("szz", "sxx", "sxz"), (f0.szz, f0.sxx, f0.sxz)):
        resid = float(jnp.abs(arr[zi, xi]).max())
        assert resid < 1e-6 * scale, (name, resid, scale)
