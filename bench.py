"""Benchmark entry point (driver contract: prints ONE JSON line).

Measures compiled-query throughput on TPC-H SF1 for the flagship configs
(Q1: scan→filter→group-aggregate; Q6: scan→filter→global aggregate) on the
available accelerator, and compares against a pandas implementation of the
same queries on the same data/host.

Baseline policy: the reference (Trino) publishes no numbers and cannot run
here (no JVM in this environment — see BASELINE.md), so ``vs_baseline``
reports speedup over the pandas oracle executing the identical queries —
an honest single-node columnar-CPU stand-in, re-measured every run.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def geomean(xs):
    p = 1.0
    for x in xs:
        p *= x
    return p ** (1.0 / len(xs))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from presto1_tpu.exec.catalog import TpchCatalog
    from presto1_tpu.exec.engine import Engine
    from presto1_tpu.tpch.queries import QUERIES

    sf = float(os.environ.get("BENCH_SF", "1.0"))
    qids = [int(q) for q in
            os.environ.get("BENCH_QUERIES", "1,3,6").split(",")]
    reps = int(os.environ.get("BENCH_REPS", "5"))

    catalog = TpchCatalog(sf=sf)
    engine = Engine(catalog)
    lineitem_rows = catalog.table("lineitem").num_rows

    # pandas baseline on identical data
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    from tpch_oracle import ORACLE
    from presto1_tpu.tpch.schema import TABLES

    frames = {}
    needed = {1: ["lineitem"], 6: ["lineitem"],
              3: ["customer", "orders", "lineitem"],
              5: ["customer", "orders", "lineitem", "supplier", "nation",
                  "region"]}
    # the heavy tables only need their query-relevant columns in pandas
    col_subset = {
        "lineitem": ["l_orderkey", "l_suppkey", "l_quantity",
                     "l_extendedprice", "l_discount", "l_tax",
                     "l_returnflag", "l_linestatus", "l_shipdate"],
        "orders": ["o_orderkey", "o_custkey", "o_orderdate",
                   "o_shippriority"],
    }
    tables = set()
    for q in qids:
        tables.update(needed.get(q, list(TABLES)))
    for t in tables:
        cols = col_subset.get(t)
        frames[t] = catalog.table(t).batch(cols).to_pandas()

    speedups = []
    rows_per_s = []
    for q in qids:
        cq = engine.compile(QUERIES[q])
        cq.block_run()  # compile + warm
        t0 = time.time()
        cq.block_run(reps=reps)  # steady-state: one completion barrier
        ours = (time.time() - t0) / reps

        t0 = time.time()
        ORACLE[q](frames)
        base = time.time() - t0

        rows_per_s.append(lineitem_rows / ours)
        speedups.append(base / ours)

    print(json.dumps({
        "metric": f"tpch_sf{sf:g}_q{'_q'.join(str(q) for q in qids)}_geomean_lineitem_rows_per_s",
        "value": round(geomean(rows_per_s)),
        "unit": "rows/s",
        "vs_baseline": round(geomean(speedups), 2),
    }))


if __name__ == "__main__":
    main()
