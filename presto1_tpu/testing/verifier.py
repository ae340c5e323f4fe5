"""A/B result verifier.

The analog of the reference's trino-verifier (``service/trino-verifier``,
3.8k LoC: replays query pairs against control/test and compares results):
runs a query corpus against the engine (control = the independent pandas
oracle, or a second engine configuration such as distributed or compiled
mode) and reports row-level mismatches.

Usage:
    python -m presto1_tpu.testing.verifier --schema tiny          # vs oracle
    python -m presto1_tpu.testing.verifier --schema tiny --test compiled
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def compare_frames(a, b, rtol=1e-6, atol=1e-6):
    """Row-for-row comparison with float tolerance; returns error or None."""
    if a.shape != b.shape:
        return f"shape {a.shape} != {b.shape}"
    import pandas as pd

    def norm_dates(df):
        df = df.copy()
        df.columns = range(len(df.columns))
        for c in df.columns:
            col = df[c]
            sample = col.iloc[0] if len(col) else None
            if str(col.dtype).startswith("datetime") or (
                    col.dtype == object and hasattr(sample, "year")
                    and not isinstance(sample, str)):
                df[c] = pd.to_datetime(col).dt.strftime("%Y-%m-%d")
        return df

    a = norm_dates(a)
    b = norm_dates(b)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        try:
            av_f = av.astype(np.float64)
            bv_f = bv.astype(np.float64)
            ok = np.isclose(av_f, bv_f, rtol=rtol, atol=atol, equal_nan=True)
        except (TypeError, ValueError):
            ok = av.astype(str) == bv.astype(str)
        bad = np.flatnonzero(~ok)
        if bad.size:
            return (f"column {c}: {bad.size} mismatches, first at row "
                    f"{bad[0]}: {av[bad[0]]!r} != {bv[bad[0]]!r}")
    return None


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--schema", default="tiny")
    ap.add_argument("--test", default="eager",
                    choices=["eager", "compiled", "distributed"],
                    help="test-side execution mode (control = pandas oracle)")
    ap.add_argument("--queries", default="")
    args = ap.parse_args(argv)

    from ..exec.catalog import TpchCatalog
    from ..exec.engine import Engine
    from ..tpch.queries import QUERIES
    from ..tpch.schema import TABLES

    sys.path.insert(0, "tests")
    from tpch_oracle import ORACLE  # noqa: E402

    catalog = TpchCatalog(args.schema)
    engine = Engine(catalog)
    frames = {t: catalog.table(t).batch().to_pandas() for t in TABLES}

    qids = ([int(q) for q in args.queries.split(",") if q]
            or sorted(QUERIES))
    failures = 0
    for q in qids:
        t0 = time.time()
        try:
            if args.test == "compiled":
                actual = engine.compile(QUERIES[q])().to_pandas()
            elif args.test == "distributed":
                actual = engine.sql_distributed(QUERIES[q]).to_pandas()
            else:
                actual = engine.sql_pandas(QUERIES[q])
            expected = ORACLE[q](frames)
            err = compare_frames(actual, expected)
        except Exception as e:  # noqa: BLE001 — verifier reports, not raises
            err = f"{type(e).__name__}: {e}"
        wall = time.time() - t0
        if err:
            failures += 1
            print(f"Q{q:02d} MISMATCH ({wall:.1f}s): {err}")
        else:
            print(f"Q{q:02d} ok ({wall:.1f}s)")
    print(f"\n{len(qids) - failures}/{len(qids)} queries verified")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
