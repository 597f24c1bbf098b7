"""Sweep the streamed engine's temporal-blocking depth on the real TPU.

For one benchmark shape, measures forward and gradient GCell/s for each
K in --ks (SEP2023_TPU_STREAM_K; the backward depth follows as
min(K, PAD//8) unless --kb pins it).  --pad deepens the tile halo
(SEP2023_TPU_STREAM_PAD, import-time: each config runs in a fresh
subprocess), admitting K up to (PAD-1)//4 forward / PAD//8 backward at
the cost of 2*(PAD-16) extra recomputed rows per tile.  Decides whether
temporal blocking should be the default and at which depth.

Usage:  python tools/stream_ksweep.py [--nz 814 --nx 2064 --nt 601]
            [--ks 1,2,3] [--kb 0] [--pad 16] [--grad]
"""
import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_one(args):
    """Measure a single (K, Kb, PAD) config in THIS process; prints JSON."""
    import jax
    if args.cpu:  # interpret-mode smoke (the sitecustomize pins axon)
        jax.config.update("jax_platforms", "cpu")
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

    T, n_tiles, _, _, plan = ps._layout_plan(cfg)
    out = {"K": ps._stream_K(cfg), "Kb": ps._stream_K_bwd(cfg),
           "PAD": ps.PAD, "T": T, "tiles": n_tiles,
           "compact": plan is not None, "gm_vmem": ps._gm_vmem(),
           "mats_compute": ps._mats_compute(cfg)}
    fwd = ps.tpu_jit(lambda l, m, r, s: ps.forward_pallas_streamed(
        cfg, rs, l, m, r, s, sz, sx, rxz))
    t, _ = _time_pipelined(fwd, lam, mu, rho, stf, depth=3)
    out["fwd_gcell"] = round(cells / t / 1e9, 3)
    if args.grad:
        def loss(l, m, r, s):
            syn = ps.propagate_pallas_streamed(cfg, rs, l, m, r, s, sz, sx,
                                               rxz)
            return 0.5 * jnp.sum(syn * syn)

        g = ps.tpu_jit(jax.grad(loss, argnums=(0, 1, 2)))
        t, _ = _time_pipelined(g, lam, mu, rho, stf, depth=2)
        out["grad_gcell"] = round(cells / t / 1e9, 3)
    print("ONE " + json.dumps(out), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grad", action="store_true")
    ap.add_argument("--nz", type=int, default=814)
    ap.add_argument("--nx", type=int, default=2064)
    ap.add_argument("--nt", type=int, default=601)
    ap.add_argument("--ks", default="1,2,3")
    ap.add_argument("--kb", type=int, default=0)
    ap.add_argument("--pad", type=int, default=0, help="halo depth (0=default 16)")
    ap.add_argument("--gm", default="", choices=("", "vmem"),
                    help="gradient accumulator placement (SEP2023_TPU_STREAM_GM)")
    ap.add_argument("--mats", default="", choices=("", "compute"),
                    help="raw-plane material stream (SEP2023_TPU_STREAM_MATS)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--one", action="store_true",
                    help="internal: run the env-selected config in-process")
    args = ap.parse_args()

    if args.one:
        run_one(args)
        return

    results = {}
    for k in args.ks.split(","):
        env = dict(os.environ, SEP2023_TPU_STREAM_K=str(int(k)))
        if args.kb:
            env["SEP2023_TPU_STREAM_KB"] = str(args.kb)
        if args.pad:
            env["SEP2023_TPU_STREAM_PAD"] = str(args.pad)
        if args.gm:
            env["SEP2023_TPU_STREAM_GM"] = args.gm
        if args.mats:
            env["SEP2023_TPU_STREAM_MATS"] = args.mats
        cmd = [sys.executable, os.path.abspath(__file__), "--one",
               "--nz", str(args.nz), "--nx", str(args.nx),
               "--nt", str(args.nt)]
        if args.grad:
            cmd.append("--grad")
        if args.cpu:
            cmd.append("--cpu")
        t0 = time.time()
        proc = subprocess.run(cmd, env=env, cwd=REPO, capture_output=True,
                              text=True)
        line = next((ln[4:] for ln in proc.stdout.splitlines()
                     if ln.startswith("ONE ")), None)
        if line:
            results[k] = json.loads(line)
        else:
            tail = (proc.stderr or proc.stdout or "").strip()[-300:]
            results[k] = {"error": f"rc={proc.returncode}: {tail}"}
        results[k]["build_s"] = round(time.time() - t0, 1)
        print(json.dumps({k: results[k]}), flush=True)
    print(json.dumps({"shape": [args.nz, args.nx, args.nt],
                      "pad": args.pad or 16, "ksweep": results}))


if __name__ == "__main__":
    main()
