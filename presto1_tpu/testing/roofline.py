"""Per-operator roofline report (north-star deliverable, SURVEY §5.1).

For each hot operator, measures achieved throughput on the current
accelerator and compares against the speed-of-light bound implied by HBM
bandwidth (every operator here is bandwidth-bound — the engine has no
dense-matmul stages yet).

    python -m presto1_tpu.testing.roofline [--rows 8388608]
"""

from __future__ import annotations

import argparse
import time

import numpy as np

# v5e (TPU v5 lite): ~819 GB/s HBM BW per chip (public spec)
HBM_GBPS = 819.0


def bench(fn, *args, reps=5):
    import jax

    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(reps):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.time() - t0) / reps


def query_bytes(plan, catalog) -> int:
    """Bytes the query must read from HBM: every scanned column at its
    device dtype (+ validity bytes).  The denominator for achieved-GB/s
    reporting (the reference treats input_megabytes_per_second as a
    first-class metric — ``AbstractOperatorBenchmark.java:310-329``)."""
    from ..sql.logical import Scan

    total = 0
    stack = [plan]
    while stack:
        node = stack.pop()
        if isinstance(node, Scan):
            t = catalog.table(node.table)
            n = t.num_rows
            for cname in node.symbols:
                col = t.column(cname)
                itemsize = col.data.dtype.itemsize
                width = 1
                if col.data.ndim > 1:
                    width = int(col.data.shape[1])
                total += n * itemsize * width
                if col.validity is not None:
                    total += n  # bool
        stack.extend(node.children)
    return total


def device_ms(run, reps: int = 10) -> float:
    """On-DEVICE time per run via an xplane capture: sums the 'XLA Ops'
    event line of the TPU plane over ``reps`` dispatches.  This is the
    number wall-clock comparisons against HBM speed of light must use —
    through a remote-device tunnel the wall carries ~8-10 ms of dispatch
    residual per query that has nothing to do with the chip (the round-4
    '9% of SoL' verdict artifact)."""
    import glob
    import os
    import tempfile

    import jax

    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION",
                          "python")
    with tempfile.TemporaryDirectory(prefix="xplane_") as d:
        with jax.profiler.trace(d):
            for _ in range(reps):
                out = run()
            jax.block_until_ready(out)
        files = sorted(glob.glob(f"{d}/**/*.xplane.pb", recursive=True))
        if not files:
            return float("nan")
        from tensorflow.tsl.profiler.protobuf import xplane_pb2

        xs = xplane_pb2.XSpace()
        with open(files[-1], "rb") as f:
            xs.ParseFromString(f.read())
        # events NEST (ops inside fused while-loops appear under their
        # parents — summing durations double-counts) and the device
        # IDLES between remote dispatches (a plain span over-counts):
        # the busy time is the UNION of op intervals
        busy_ps = 0
        for plane in xs.planes:
            if "TPU" not in plane.name and "Device" not in plane.name:
                continue
            for line in plane.lines:
                if line.name != "XLA Ops" or not line.events:
                    continue
                iv = sorted((ev.offset_ps, ev.offset_ps + ev.duration_ps)
                            for ev in line.events)
                cur_lo, cur_hi = iv[0]
                for lo, hi in iv[1:]:
                    if lo > cur_hi:
                        busy_ps += cur_hi - cur_lo
                        cur_lo, cur_hi = lo, hi
                    else:
                        cur_hi = max(cur_hi, hi)
                busy_ps += cur_hi - cur_lo
        return busy_ps / 1e9 / reps


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1 << 23)
    args = ap.parse_args(argv)
    n = args.rows

    import jax
    import jax.numpy as jnp

    import presto1_tpu  # noqa: F401  (enables x64)
    from ..batch import Column
    from ..ops.hashagg import AggSpec, group_aggregate
    from ..ops.segments import compact_indices
    from ..types import BIGINT, DecimalType

    rng = np.random.RandomState(0)
    MONEY = DecimalType(12, 2)
    key6 = jnp.asarray(rng.randint(0, 6, n).astype(np.int64))
    keyN = jnp.asarray(rng.randint(0, n // 4, n).astype(np.int64))
    val = jnp.asarray(rng.randint(0, 10 ** 7, n).astype(np.int64))
    ship = jnp.asarray(rng.randint(8000, 10600, n).astype(np.int64))

    rows = []

    def report(name, wall, bytes_touched):
        sol = bytes_touched / (HBM_GBPS * 1e9)
        rows.append((name, n / wall / 1e6, wall * 1e3, sol * 1e3,
                     100.0 * sol / wall))

    # filter mask + masked sum (Q6 core): read 2 cols, no write
    f = jax.jit(lambda s, v: jnp.sum(jnp.where((s >= 8766) & (s < 9131), v, 0)))
    report("filter+sum (jnp)", bench(f, ship, val), 2 * n * 8)

    try:
        from ..ops.kernels.filter_sum import range_filter_product_sum

        b = jnp.asarray([8766, 9131, 0, 10, 5000], jnp.int32)
        pf = lambda: range_filter_product_sum(
            ship.astype(jnp.int32), (val % 11).astype(jnp.int32),
            (val % 50).astype(jnp.int32), val.astype(jnp.int32), b)
        report("filter+sum (pallas)", bench(pf), 4 * n * 4)
    except Exception as e:  # noqa: BLE001 — kernel may not lower everywhere
        print(f"pallas kernel skipped: {type(e).__name__}: {e}")

    # group aggregate, 6 groups (Q1 shape)
    c6 = Column(key6, BIGINT)
    cv = Column(val, MONEY)
    ga = jax.jit(lambda k, v: group_aggregate(
        [("k", Column(k, BIGINT))],
        [AggSpec("sum", Column(v, MONEY), "s"),
         AggSpec("avg", Column(v, MONEY), "a")],
        n, [(0, 5)], 128).columns["s"].data)
    report("group agg 6 grp (sort+segsum)", bench(ga, key6, val),
           5 * n * 8)  # key r/w in sort + value gather r/w

    # sort (the aggregation's dominant cost)
    srt = jax.jit(lambda k: jax.lax.sort(
        (k, jnp.arange(n, dtype=jnp.int64)), num_keys=1)[0])
    report("lax.sort 2op", bench(srt, keyN), 4 * n * 8)

    # join probe: searchsorted both sides
    m = n // 4
    bk = jnp.sort(jnp.asarray(rng.randint(0, n, m).astype(np.int64)))
    pj = jax.jit(lambda p, b: jnp.searchsorted(b, p))
    report("join probe (searchsorted)", bench(pj, keyN, bk),
           n * 8 * 10)  # ~log passes over probe + binary-search gathers

    # compaction
    cp = jax.jit(lambda msk: compact_indices(msk, n)[0])
    report("compaction", bench(cp, ship < 9131), 3 * n * 8)

    print(f"\nroofline @ {n} rows on {jax.devices()[0].platform} "
          f"(HBM {HBM_GBPS:.0f} GB/s assumed)")
    print(f"{'operator':34s} {'Mrows/s':>9s} {'ms':>8s} {'SoL ms':>8s} {'% SoL':>6s}")
    for name, mrps, ms, sol_ms, pct in rows:
        print(f"{name:34s} {mrps:9.1f} {ms:8.2f} {sol_ms:8.2f} {pct:5.1f}%")


if __name__ == "__main__":
    main()
