"""Scripted TPC-H SF1 22-query sweep — the every-round perf artifact
(round-5 VERDICT item 3: the sweep must be a scripted artifact so planner
changes can't silently regress queries outside the 3-query bench).

Parent mode (default): runs every query in a FRESH subprocess (an OOM or
compiler crash poisons later compiles in-process — round-3 finding),
collects one JSON line each, writes ``SWEEP_r<N>.json`` and prints the
BASELINE.md table.

Child mode (``--q N``): compiles the query on the default backend (TPU
when available), reports cold-compile wall and warm steady-state wall
(min over trials of ``block_run(reps)``; through the remote-device tunnel
never quote sub-20 ms walls at reps<20 — tunnel residual ~8-10 ms/dispatch).

Usage:
  python experiments/sweep_sf1.py --round 5           # full sweep
  python experiments/sweep_sf1.py --q 18 --sf 10      # one query
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
_tpch_cache = os.path.join(REPO, ".tpch_cache")
if os.path.isdir(_tpch_cache):
    os.environ.setdefault("P1_TPCH_CACHE", _tpch_cache)

REPS = int(os.environ.get("SWEEP_REPS", "20"))
TRIALS = int(os.environ.get("SWEEP_TRIALS", "3"))


def child(qid: int, sf: float, grouped: int) -> None:
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))

    from presto1_tpu.exec.catalog import TpchCatalog
    from presto1_tpu.exec.engine import Engine
    from presto1_tpu.tpch.queries import QUERIES

    catalog = TpchCatalog(sf=sf)
    engine = Engine(catalog)
    out = {"q": qid, "sf": sf, "backend": jax.default_backend()}

    t0 = time.time()
    if grouped:
        cq = engine.compile_grouped(QUERIES[qid], n_groups=grouped)
    else:
        cq = engine.compile(QUERIES[qid])
    out["discovery_s"] = round(time.time() - t0, 2)
    out["sampled"] = bool(getattr(cq, "sample", None))

    t0 = time.time()
    rows = cq.block_run(reps=1)  # trace + AOT compile + first run
    out["cold_s"] = round(time.time() - t0, 2)
    out["rows"] = rows

    walls = []
    for _ in range(TRIALS):
        t0 = time.time()
        cq.block_run(reps=REPS)
        walls.append((time.time() - t0) / REPS)
    out["warm_ms"] = round(min(walls) * 1000, 1)
    print("SWEEP " + json.dumps(out), flush=True)


def parent(rnd: int, sf: float, queries, timeout_s: float) -> None:
    results = []
    for qid in queries:
        cmd = [sys.executable, os.path.abspath(__file__),
               "--q", str(qid), "--sf", str(sf)]
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        t0 = time.time()
        try:
            p = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=timeout_s, env=env)
            line = [ln for ln in p.stdout.splitlines()
                    if ln.startswith("SWEEP ")]
            if line:
                rec = json.loads(line[-1][6:])
            else:
                rec = {"q": qid, "sf": sf, "error":
                       (p.stderr.strip().splitlines() or ["no output"])[-1],
                       "rc": p.returncode}
        except subprocess.TimeoutExpired:
            rec = {"q": qid, "sf": sf,
                   "error": f"timeout after {timeout_s:.0f}s"}
        rec["total_s"] = round(time.time() - t0, 1)
        print(json.dumps(rec), flush=True)
        results.append(rec)

    path = os.path.join(REPO, f"SWEEP_r{rnd:02d}.json")
    # merge with a prior partial sweep (keep records for queries not rerun)
    if os.path.exists(path):
        try:
            with open(path) as f:
                prior = json.load(f)
            ran = {r["q"] for r in results}
            results = sorted(
                [r for r in prior.get("results", [])
                 if r.get("sf") == sf and r["q"] not in ran] + results,
                key=lambda r: r["q"])
        except (ValueError, KeyError):
            pass
    with open(path, "w") as f:
        json.dump({"sf": sf, "reps": REPS, "trials": TRIALS,
                   "results": results}, f, indent=1)
    print(f"\nwrote {path}\n")
    print("| query | discovery (s) | cold compile+run (s) | warm (ms) |")
    print("|---|---|---|---|")
    for r in results:
        if "error" in r:
            print(f"| q{r['q']} | — | — | ERROR: {r['error'][:60]} |")
        else:
            print(f"| q{r['q']} | {r['discovery_s']} | {r['cold_s']} "
                  f"| {r['warm_ms']} |")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--q", type=int, default=0)
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--round", type=int, default=5)
    ap.add_argument("--grouped", type=int, default=0)
    ap.add_argument("--timeout", type=float, default=900.0)
    ap.add_argument("--queries", type=int, nargs="+",
                    default=list(range(1, 23)))
    args = ap.parse_args()
    if args.q:
        child(args.q, args.sf, args.grouped)
    else:
        parent(args.round, args.sf, args.queries, args.timeout)
