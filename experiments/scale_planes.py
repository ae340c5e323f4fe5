"""Measure the COMPILED distributed planes (round-5 VERDICT item 1).

Three execution planes over identical SF1 data, all on CPU backends so
the comparison is apples-to-apples (the multihost workers are CPU
processes by design — tests need no accelerator):

1. single-process compiled engine (the reference point),
2. DCN multihost plane: N worker processes, HTTP exchange, compiled
   fragments forced (``P1_WORKER_COMPILE=always``), warm program caches,
3. ICI mesh plane: ``sql_distributed`` over an 8-virtual-device mesh with
   warmed ``cached_program``s.

Emits one JSON line per measurement plus a markdown table for
BASELINE.md.  Methodology: 2 warm-up runs (the first populates fragment
program caches), then min of 5 timed runs.

Usage: python experiments/scale_planes.py [--sf 1] [--workers 1 2 4]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8")
os.environ["P1_WORKER_COMPILE"] = "always"
_tpch_cache = os.path.join(REPO, ".tpch_cache")
if os.path.isdir(_tpch_cache):
    os.environ.setdefault("P1_TPCH_CACHE", _tpch_cache)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402

QUERIES = {
    # the round-3 scaling shapes, now over the real TPC-H text
    "q1": None,   # filled from tpch.queries
    "q3": None,
}

WARMUP = 2
TRIALS = 5


def _bench(fn):
    for _ in range(WARMUP):
        fn()
    walls = []
    for _ in range(TRIALS):
        t0 = time.time()
        fn()
        walls.append(time.time() - t0)
    return min(walls)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--workers", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument("--queries", type=int, nargs="+", default=[1, 3])
    ap.add_argument("--planes", default="single,mesh,dcn",
                    help="comma list: single,mesh,dcn (the 8-virtual-"
                         "device mesh all-reduce rendezvous hard-aborts "
                         "after 40s under host contention — run the mesh "
                         "plane on an otherwise idle host)")
    args = ap.parse_args()
    planes = set(args.planes.split(","))

    from presto1_tpu.exec.catalog import TpchCatalog
    from presto1_tpu.exec.engine import Engine
    from presto1_tpu.testing.dist_runner import MultiHostRunner
    from presto1_tpu.tpch.queries import QUERIES as Q

    sf_name = f"sf{args.sf:g}" if args.sf != 0.01 else "tiny"
    catalog = TpchCatalog(sf=args.sf)
    lineitem_rows = catalog.table("lineitem").num_rows
    results = []

    # ---- plane 1: single-process compiled
    engine = Engine(catalog)
    single = {}
    for qid in args.queries if "single" in planes else []:
        cq = engine.compile(Q[qid])
        wall = _bench(lambda: cq.block_run())
        single[qid] = wall
        rec = {"plane": "single_compiled", "q": qid, "workers": 1,
               "wall_s": round(wall, 4),
               "lineitem_rows_per_s": int(lineitem_rows / wall)}
        print(json.dumps(rec), flush=True)
        results.append(rec)

    # ---- plane 2: mesh (8 virtual devices, cached stage programs)
    mesh_n = 8
    for qid in args.queries if "mesh" in planes else []:
        info = {}
        wall = _bench(lambda: engine.sql_distributed(Q[qid], mesh_n,
                                                     info=info))
        rec = {"plane": "mesh8_distributed", "q": qid, "workers": mesh_n,
               "wall_s": round(wall, 4),
               "lineitem_rows_per_s": int(lineitem_rows / wall),
               "mesh_stages": info.get("mesh_stages"),
               "vs_single": round(single[qid] / wall, 2)
               if qid in single else None}
        print(json.dumps(rec), flush=True)
        results.append(rec)

    # ---- plane 3: DCN multihost, compiled fragments forced
    for n in args.workers if "dcn" in planes else []:
        with MultiHostRunner(n_workers=n,
                             catalog_spec=f"tpch:{sf_name}") as runner:
            for qid in args.queries:
                wall = _bench(lambda: runner.sql(Q[qid]))
                rec = {
                    "plane": "multihost_compiled", "q": qid, "workers": n,
                    "wall_s": round(wall, 4),
                    "lineitem_rows_per_s": int(lineitem_rows / wall),
                    "rows_per_s_per_worker": int(lineitem_rows / wall / n),
                    "vs_single": round(single[qid] / wall, 2)
                    if qid in single else None,
                }
                print(json.dumps(rec), flush=True)
                results.append(rec)

    # markdown table
    print("\n| plane | query | workers | wall (ms) | lineitem rows/s "
          "| rows/s/worker | vs single-proc compiled |")
    print("|---|---|---|---|---|---|---|")
    for r in results:
        print(f"| {r['plane']} | q{r['q']} | {r['workers']} "
              f"| {r['wall_s'] * 1000:.0f} "
              f"| {r['lineitem_rows_per_s'] / 1e6:.1f}M "
              f"| {r.get('rows_per_s_per_worker', r['lineitem_rows_per_s'] // r['workers']) / 1e6:.2f}M "
              f"| {r.get('vs_single', 1.0)} |")


if __name__ == "__main__":
    main()
