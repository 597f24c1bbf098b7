"""A/B the ring-sweep megastep grouping (_stream_J) on the real TPU.

Measures the streamed elastic forward and gradient at a given shape for
each (J_fwd, J_bwd) pair.  J amortizes the per-invocation pipeline
fill/drain (the blocking tile-0 prime + last-tile drain, ~9% of the
backward at 814x2064 — docs/PERF.md §6) without touching the VMEM tile
budget; its cost is J-fold kernel code (Mosaic compile time and
scheduling risk), so this sweep is the decider.

Usage:  python tools/stream_jsweep.py [--nz 814 --nx 2064 --nt 1001]
            [--pairs 1x1,2x2,2x3,3x3] [--fwd-only]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_pair(jf, jb, args):
    os.environ["SEP2023_TPU_STREAM_J"] = str(jf)
    os.environ["SEP2023_TPU_STREAM_JB"] = str(jb)
    import jax
    import jax.numpy as jnp
    import sep2023_tpu as st
    from sep2023_tpu.ops import pallas_engine as pe
    from sep2023_tpu.ops import pallas_stream as ps
    from bench import _time_pipelined

    nz_p, nx_p, nt = args.nz, args.nx, args.nt
    cfg = st.SimConfig(nz=nz_p, nx=nx_p, dz=10.0, dx=10.0, nt=nt,
                       dt=0.001, f0=10.0, npml=32)
    rs = pe.RowSurvey(rec_row=nz_p - 44, rec_x0=42, n_rec=nx_p - 84)
    vp = jnp.full((nz_p, nx_p), 3000.0, jnp.float32)
    lam = (vp ** 2 / 3.0 * 2200.0).astype(jnp.float32)
    mu = lam
    rho = jnp.full((nz_p, nx_p), 2200.0, jnp.float32)
    stf = jnp.broadcast_to(
        jnp.asarray(st.ricker(cfg.f0, nt, cfg.dt), jnp.float32), (1, nt))
    sz = jnp.asarray([33])
    sx = jnp.asarray([nx_p // 2])
    rxz = jnp.ones((1,), jnp.float32)
    cells = nz_p * nx_p * (nt - 1)

    out = {"layout": ps._layout(cfg)[:2]}
    t0 = time.time()
    fwd = ps.tpu_jit(lambda l, m, r, s: ps.forward_pallas_streamed(
        cfg, rs, l, m, r, s, sz, sx, rxz))
    t, r0 = _time_pipelined(fwd, lam, mu, rho, stf, depth=3)
    out["fwd_compile_s"] = round(time.time() - t0 - t * 4, 1)
    out["fwd_gcell"] = round(cells / t / 1e9, 3)
    out["fwd_sum"] = float(jnp.sum(jnp.abs(r0)))

    if not args.fwd_only:
        def loss(l, m, r, s):
            syn = ps.propagate_pallas_streamed(cfg, rs, l, m, r, s, sz,
                                               sx, rxz)
            return 0.5 * jnp.sum(syn * syn)

        t0 = time.time()
        g = ps.tpu_jit(jax.grad(loss, argnums=(0, 1, 2)))
        t, r1 = _time_pipelined(g, lam, mu, rho, stf, depth=2)
        out["grad_compile_s"] = round(time.time() - t0 - t * 3, 1)
        out["grad_gcell"] = round(cells / t / 1e9, 3)
        out["grad_sum"] = float(sum(jnp.sum(jnp.abs(x)) for x in r1))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nz", type=int, default=814)
    ap.add_argument("--nx", type=int, default=2064)
    ap.add_argument("--nt", type=int, default=1001)
    ap.add_argument("--pairs", default="1x1,2x2,2x3")
    ap.add_argument("--fwd-only", action="store_true")
    args = ap.parse_args()

    results = {}
    for pair in args.pairs.split(","):
        jf, jb = (int(v) for v in pair.split("x"))
        t0 = time.time()
        try:
            results[pair] = run_pair(jf, jb, args)
        except Exception as e:
            results[pair] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
        results[pair]["wall_s"] = round(time.time() - t0, 1)
        print(json.dumps({pair: results[pair]}), flush=True)
    print(json.dumps({"shape": [args.nz, args.nx, args.nt],
                      "jsweep": results}))


if __name__ == "__main__":
    main()
