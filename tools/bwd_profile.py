"""Op-level profile of the streamed megastep scan on the real TPU.

The dissection tool (stream_dissect.py) bounds compute vs DMA with debug
modes; this probe answers the question those bounds leave open — where the
per-invocation overhead (full - DMA, ~9% of the backward at Marmousi
scale) actually lives:

  * inside the kernel (the tile-0 prime + last-tile drain of the 2-slot
    pipeline, which cross-invocation prefetch cannot hide — round-3
    finding), or
  * between kernels (XLA copies of the VMEM psi operands, scan glue,
    gradient-accumulator fusions).

It traces a short streamed gradient (or forward) with jax.profiler,
converts the xplane with the xprof package (the workflow CLAUDE.md
records for the relay), and aggregates the TPU device track: per-op-name
total/mean durations, the megastep kernel's mean duration vs the mean
iteration PERIOD (start-to-start), and the residual gap.  period - dur =
between-kernel overhead; dur - (DMA bound from stream_dissect) = in-kernel
overhead.

Usage:  python tools/bwd_profile.py [--fwd] [--nz 814 --nx 2064 --nt 81]
"""
import argparse
import collections
import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(args):
    import jax
    import jax.numpy as jnp
    import sep2023_tpu as st
    from sep2023_tpu.ops import pallas_engine as pe
    from sep2023_tpu.ops import pallas_stream as ps

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

    if args.fwd:
        fn = ps.tpu_jit(lambda l, m, r, s: ps.forward_pallas_streamed(
            cfg, rs, l, m, r, s, sz, sx, rxz))
    else:
        def loss(l, m, r, s):
            syn = ps.propagate_pallas_streamed(cfg, rs, l, m, r, s, sz,
                                               sx, rxz)
            return 0.5 * jnp.sum(syn * syn)

        fn = ps.tpu_jit(jax.grad(loss, argnums=(0, 1, 2)))
    return fn, (lam, mu, rho, stf)


def device_events(trace_dir):
    """TPU-device-track events from the captured xplane, as
    (name, ts_us, dur_us) tuples."""
    from xprof.convert import raw_to_tool_data as rtd

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    data, _ = rtd.xspace_to_tool_data(paths, "trace_viewer", {})
    if isinstance(data, bytes):
        data = data.decode()
    tr = json.loads(data)
    events = tr["traceEvents"] if isinstance(tr, dict) else tr
    # process-name metadata identifies the device track ("/device:TPU:0"
    # or "TPU:0 (pid N)"-style naming depending on the converter version)
    dev_pids = set()
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pname = ev.get("args", {}).get("name", "")
            if "TPU" in pname and "host" not in pname.lower():
                dev_pids.add(ev["pid"])
    out = []
    for ev in events:
        if ev.get("ph") == "X" and ev.get("pid") in dev_pids:
            out.append((ev["name"], float(ev["ts"]), float(ev.get("dur", 0))))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fwd", action="store_true")
    ap.add_argument("--nz", type=int, default=814)
    ap.add_argument("--nx", type=int, default=2064)
    ap.add_argument("--nt", type=int, default=81)
    ap.add_argument("--keep", default=None,
                    help="keep the raw trace under this dir")
    args = ap.parse_args()

    import jax
    fn, fargs = build(args)
    print("warmup (compile) ...", flush=True)
    jax.block_until_ready(fn(*fargs))
    tdir = args.keep or tempfile.mkdtemp(prefix="bwdprof_")
    jax.profiler.start_trace(tdir)
    jax.block_until_ready(fn(*fargs))
    jax.profiler.stop_trace()
    print(f"trace in {tdir}", flush=True)

    evs = device_events(tdir)
    by_name = collections.defaultdict(lambda: [0.0, 0])
    for name, ts, dur in evs:
        by_name[name][0] += dur
        by_name[name][1] += 1
    total = sum(v[0] for v in by_name.values())
    print(f"\n{len(evs)} device events, {total/1e3:.3f} ms total busy")
    print(f"{'op':60s} {'count':>6s} {'total_ms':>9s} {'mean_us':>9s}")
    top = sorted(by_name.items(), key=lambda kv: -kv[1][0])[:14]
    for name, (dur, cnt) in top:
        print(f"{name[:60]:60s} {cnt:6d} {dur/1e3:9.3f} {dur/cnt:9.1f}")

    # the megastep kernel: the most-frequent big op; period from
    # consecutive starts of the same name
    main_name = max(by_name.items(), key=lambda kv: kv[1][0])[0]
    starts = sorted(ts for n, ts, _ in evs if n == main_name)
    durs = [d for n, _, d in evs if n == main_name]
    if len(starts) > 8:
        # steady-state: drop first/last two periods
        periods = [b - a for a, b in zip(starts, starts[1:])][2:-2]
        med_p = sorted(periods)[len(periods) // 2]
        med_d = sorted(durs)[len(durs) // 2]
        print(f"\nmain kernel: {main_name[:70]}")
        print(json.dumps({
            "n_invocations": len(starts),
            "kernel_mean_us": round(sum(durs) / len(durs), 1),
            "kernel_median_us": round(med_d, 1),
            "period_median_us": round(med_p, 1),
            "between_kernel_us": round(med_p - med_d, 1),
        }))


if __name__ == "__main__":
    main()
