"""Per-fragment cold-compile profile (round-5 cold-compile bisect).

Compiles one SF1 query with the persistent compile cache DISABLED and
times each fragment's trace+AOT-compile separately (first call of the
jitted stage fn with donated-shape inputs), printing fragment path, wall,
and HLO size diagnostics for the slowest fragments.

Usage: python experiments/compile_profile.py --q 10 [--sf 1]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
_tpch_cache = os.path.join(REPO, ".tpch_cache")
if os.path.isdir(_tpch_cache):
    os.environ.setdefault("P1_TPCH_CACHE", _tpch_cache)
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--q", type=int, required=True)
    ap.add_argument("--sf", type=float, default=1.0)
    args = ap.parse_args()

    import jax  # NO persistent cache: measure the real compile

    from presto1_tpu.exec.catalog import TpchCatalog
    from presto1_tpu.exec.engine import Engine
    from presto1_tpu.tpch.queries import QUERIES

    engine = Engine(TpchCatalog(sf=args.sf))
    t0 = time.time()
    cq = engine.compile(QUERIES[args.q])
    print(json.dumps({"event": "discovery", "s": round(time.time() - t0, 1)}),
          flush=True)

    # replicate CompiledQuery._run stage-by-stage, timing each first call
    ext = cq._external_tuples(None) if cq.external else {}
    results = dict(ext)
    from presto1_tpu.exec.executor import _k

    for root, child_roots, jfn in cq._stages:
        frag_inputs = {}
        for cr in child_roots:
            data, validity, n, _ = results[cr]
            for nm, _, _, _ in cq._meta[cr]:
                frag_inputs[_k(cr, nm, "d")] = data[nm]
                if nm in validity:
                    frag_inputs[_k(cr, nm, "v")] = validity[nm]
            frag_inputs[_k(cr, "", "n")] = n
        t0 = time.time()
        lowered = jfn.lower(cq.inputs, frag_inputs)
        t_lower = time.time() - t0
        hlo = lowered.compiler_ir(dialect="hlo").as_hlo_text()
        n_lines = hlo.count("\n")
        import re

        ops = {}
        for m in re.finditer(r"=\s*\w+\[[^\]]*\]\s*(\w+)", hlo):
            ops[m.group(1)] = ops.get(m.group(1), 0) + 1
        top_ops = sorted(ops.items(), key=lambda kv: -kv[1])[:8]
        t0 = time.time()
        compiled = lowered.compile()
        t_compile = time.time() - t0
        t0 = time.time()
        out = compiled(cq.inputs, frag_inputs)
        jax.block_until_ready(out)
        t_run = time.time() - t0
        results[root] = out
        print(json.dumps({
            "fragment": "/".join(map(str, root)) or "(root)",
            "lower_s": round(t_lower, 1),
            "compile_s": round(t_compile, 1),
            "first_run_s": round(t_run, 1),
            "hlo_lines": n_lines,
            "top_ops": top_ops,
        }), flush=True)


if __name__ == "__main__":
    main()
