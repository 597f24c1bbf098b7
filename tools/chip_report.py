"""One-command per-round hardware evidence (VERDICT r4 #4): run the
Mosaic-compiled on-chip equality suite (tests/test_tpu.py) and bench.py
on the real TPU, and write a single CHIP_r{N}.json artifact

  {"round": N, "device": ..., "suite": {"passed": P, "failed": F,
   "rc": rc, "duration_s": s}, "bench": <last parsed bench JSON line>}

so RESULTS.md's hardware claims are reproducible as an artifact, not
prose.  The bench subprocess inherits bench.py's incremental-emission
robustness: the LAST complete JSON line on its stdout is recorded even
if the process dies or times out mid-way.

Usage:  python tools/chip_report.py [--round N] [--skip-suite]
            [--skip-bench] [--suite-timeout 2700] [--bench-timeout 2700]
"""
import argparse
import glob
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _auto_round() -> int:
    """Default round = max committed BENCH_r*.json + 1 (the round being
    evidenced is the one not yet judged)."""
    rounds = [int(m.group(1)) for f in glob.glob(os.path.join(REPO, "BENCH_r*.json"))
              if (m := re.search(r"BENCH_r(\d+)\.json$", f))]
    return (max(rounds) + 1) if rounds else 1


def last_json_line(text: str):
    """The last complete JSON object line in a text stream (bench.py's
    incremental-emission contract)."""
    out = None
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            try:
                out = json.loads(line)
            except json.JSONDecodeError:
                pass
    return out


def run_suite(timeout_s: float):
    env = dict(os.environ, SEP2023_TPU_TPU_TESTS="1")
    t0 = time.monotonic()
    try:
        p = subprocess.run(
            [sys.executable, "-m", "pytest", "tests/test_tpu.py", "-q"],
            cwd=REPO, env=env, capture_output=True, text=True,
            timeout=timeout_s)
        rc, tail = p.returncode, p.stdout[-4000:]
    except subprocess.TimeoutExpired as e:
        out = e.stdout or ""
        rc, tail = 124, (out.decode() if isinstance(out, bytes)
                         else out)[-4000:]
    dur = time.monotonic() - t0
    counts = {"passed": 0, "failed": 0, "error": 0, "skipped": 0}
    for n, kind in re.findall(r"(\d+) (passed|failed|error|skipped)", tail):
        counts[kind] = int(n)
    print(tail.splitlines()[-1] if tail.splitlines() else "(no output)")
    return {"rc": rc, "duration_s": round(dur, 1), **counts}


def run_bench(timeout_s: float):
    t0 = time.monotonic()
    try:
        p = subprocess.run([sys.executable, "bench.py"], cwd=REPO,
                           capture_output=True, text=True,
                           timeout=timeout_s)
        rc, out = p.returncode, p.stdout
    except subprocess.TimeoutExpired as e:
        out = e.stdout or ""
        rc, out = 124, out.decode() if isinstance(out, bytes) else out
    parsed = last_json_line(out)
    return {"rc": rc, "duration_s": round(time.monotonic() - t0, 1),
            "parsed": parsed}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--round", type=int, default=None)
    ap.add_argument("--skip-suite", action="store_true")
    ap.add_argument("--skip-bench", action="store_true")
    ap.add_argument("--suite-timeout", type=float, default=2700.0)
    ap.add_argument("--bench-timeout", type=float, default=2700.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    rnd = args.round if args.round is not None else _auto_round()
    report = {"round": rnd, "ts": time.strftime("%Y-%m-%dT%H:%M:%S")}

    if not args.skip_suite:
        print("running on-chip equality suite (tests/test_tpu.py) ...",
              flush=True)
        report["suite"] = run_suite(args.suite_timeout)
    if not args.skip_bench:
        print("running bench.py ...", flush=True)
        bench = run_bench(args.bench_timeout)
        report["bench"] = bench["parsed"]
        report["bench_rc"] = bench["rc"]
        report["bench_duration_s"] = bench["duration_s"]
        if bench["parsed"]:
            report.setdefault(
                "device", bench["parsed"].get("extra", {}).get("device"))

    out = args.out or os.path.join(REPO, f"CHIP_r{rnd:02d}.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    print(f"wrote {out}")
    suite = report.get("suite", {})
    ok = ((args.skip_suite or (suite.get("rc") == 0
                               and suite.get("passed", 0) > 0
                               and suite.get("failed", 1) == 0))
          and (args.skip_bench or report["bench"] is not None))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
