"""Measure the chunked-gradient accumulator against the jax.checkpoint
rematerialization it replaced, on the real TPU.

A chunked gradient used to cost 4 wavefield passes per shot (forward for
the loss, remat re-forward, reconstruction, adjoint); the custom-vjp
accumulator in parallel._chunked_sum evaluates each chunk's value and
cotangents together (3 passes).  Expected ~4/3 speedup on stream-bound
workloads; this tool measures it.

Each mode runs in a fresh subprocess (SEP2023_TPU_CHUNK_REMAT is read at
trace time but a clean process keeps the comparison honest).

Usage: python tools/chunk_bench.py [--nz 265 --nx 385 --nt 2001 --shots 12
                                    --chunk 4] [--cpu]
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
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from sep2023_tpu import parallel
    from bench import _time_pipelined, chunked_problem

    S = args.shots
    cfg, survey, med, stf, obs, w = chunked_problem(
        nz=args.nz, nx=args.nx, nt=args.nt, n_shots=S)

    loss = parallel.make_pallas_misfit(cfg, survey, shot_chunk=args.chunk)
    from sep2023_tpu.ops.pallas_stream import tpu_jit
    vg = tpu_jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))
    t, _ = _time_pipelined(vg, med.lam, med.mu, med.rho, stf, obs, w,
                           depth=2)
    cells = cfg.nz * cfg.nx * (cfg.nt - 1) * S
    print("ONE " + json.dumps({
        "remat": bool(os.environ.get("SEP2023_TPU_CHUNK_REMAT")),
        "chunk": args.chunk, "shots": S,
        "grad_s": round(t, 4),
        "grad_gcell": round(cells / t / 1e9, 3)}), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nz", type=int, default=265)
    ap.add_argument("--nx", type=int, default=385)
    ap.add_argument("--nt", type=int, default=2001)
    ap.add_argument("--shots", type=int, default=12)
    ap.add_argument("--chunk", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--one", action="store_true")
    args = ap.parse_args()
    if args.one:
        run_one(args)
        return

    results = {}
    for mode, env_val in (("accumulator", ""), ("remat", "1")):
        env = dict(os.environ)
        env.pop("SEP2023_TPU_CHUNK_REMAT", None)
        if env_val:
            env["SEP2023_TPU_CHUNK_REMAT"] = env_val
        cmd = [sys.executable, os.path.abspath(__file__), "--one",
               "--nz", str(args.nz), "--nx", str(args.nx),
               "--nt", str(args.nt), "--shots", str(args.shots),
               "--chunk", str(args.chunk)]
        if args.cpu:
            cmd.append("--cpu")
        t0 = time.time()
        proc = subprocess.run(cmd, env=env, cwd=REPO, capture_output=True,
                              text=True)
        line = next((ln[4:] for ln in proc.stdout.splitlines()
                     if ln.startswith("ONE ")), None)
        results[mode] = (json.loads(line) if line else
                         {"error": (proc.stderr or "")[-300:]})
        results[mode]["build_s"] = round(time.time() - t0, 1)
        print(json.dumps({mode: results[mode]}), flush=True)
    if all("grad_s" in r for r in results.values()):
        results["speedup"] = round(
            results["remat"]["grad_s"] / results["accumulator"]["grad_s"], 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
