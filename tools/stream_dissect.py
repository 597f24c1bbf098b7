"""Dissect the streamed megastep's wall time on the real TPU.

Runs the streamed forward (and optionally the gradient) at the
560x720-padded benchmark shape under each SEP2023_TPU_STREAM_DEBUG mode:

    ''            full kernel
    'nostep'      DMA pipeline only (physics skipped)
    'noin'        compute + output stream (input DMAs skipped)
    'noout'       compute + input stream (output DMAs skipped)
    'noin,noout'  compute only

The debug modes produce GARBAGE numerics by design — this is a timing
instrument, not a correctness path.  Comparing the wall times tells whether
the kernel is compute-bound, stream-bound, or losing time to serialization
(e.g. full ~= noin + nostep would mean the input stream never overlaps
compute), which decides what to optimize next.

Usage:  python tools/stream_dissect.py [--grad] [--nz 560 --nx 720 --nt 1001]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_mode(mode, args):
    os.environ["SEP2023_TPU_STREAM_DEBUG"] = mode
    import jax
    import jax.numpy as jnp
    import sep2023_tpu as st
    from sep2023_tpu.ops import pallas_engine as pe
    from sep2023_tpu.ops import pallas_stream as ps
    from bench import _time_pipelined

    nz_p, nx_p, nt_s = args.nz, args.nx, args.nt
    cfg = st.SimConfig(nz=nz_p, nx=nx_p, dz=10.0, dx=10.0, nt=nt_s,
                       dt=0.001, f0=10.0, npml=32)
    rs = pe.RowSurvey(rec_row=nz_p - 44, rec_x0=42, n_rec=nx_p - 84)
    vp = jnp.full((nz_p, nx_p), 3000.0, jnp.float32)
    lam = (vp ** 2 / 3.0 * 2200.0).astype(jnp.float32)
    mu = lam
    rho = jnp.full((nz_p, nx_p), 2200.0, jnp.float32)
    stf = jnp.broadcast_to(
        jnp.asarray(st.ricker(cfg.f0, nt_s, cfg.dt), jnp.float32), (1, nt_s))
    sz = jnp.asarray([33])
    sx = jnp.asarray([nx_p // 2])
    rxz = jnp.ones((1,), jnp.float32)
    cells = nz_p * nx_p * (nt_s - 1)

    out = {}
    fwd = ps.tpu_jit(lambda l, m, r, s: ps.forward_pallas_streamed(
        cfg, rs, l, m, r, s, sz, sx, rxz))
    t, _ = _time_pipelined(fwd, lam, mu, rho, stf, depth=3)
    out["fwd_s"] = round(t, 4)
    out["fwd_gcell"] = round(cells / t / 1e9, 3)

    if args.grad:
        def loss(l, m, r, s):
            syn = ps.propagate_pallas_streamed(cfg, rs, l, m, r, s, sz, sx,
                                               rxz)
            return 0.5 * jnp.sum(syn * syn)

        g = ps.tpu_jit(jax.grad(loss, argnums=(0, 1, 2)))
        t, _ = _time_pipelined(g, lam, mu, rho, stf, depth=2)
        out["grad_s"] = round(t, 4)
        out["grad_gcell"] = round(cells / t / 1e9, 3)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grad", action="store_true")
    ap.add_argument("--nz", type=int, default=560)
    ap.add_argument("--nx", type=int, default=720)
    ap.add_argument("--nt", type=int, default=1001)
    ap.add_argument("--modes", default=",".join(
        ["full", "nostep", "noin", "noout", "noin+noout"]))
    args = ap.parse_args()

    results = {}
    for label in args.modes.split(","):
        mode = "" if label == "full" else label.replace("+", ",")
        t0 = time.time()
        try:
            results[label] = run_mode(mode, args)
        except Exception as e:  # debug modes feed the TPU garbage on purpose
            results[label] = {"error": f"{type(e).__name__}: {str(e)[:160]}"}
        results[label]["build_s"] = round(time.time() - t0, 1)
        print(json.dumps({label: results[label]}), flush=True)
    print(json.dumps({"shape": [args.nz, args.nx, args.nt],
                      "dissection": results}))


if __name__ == "__main__":
    main()
