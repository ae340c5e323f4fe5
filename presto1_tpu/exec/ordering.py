"""Physical sort-order propagation ("interesting orders").

TPC-H base tables come out of dbgen physically sorted by their primary
keys (lineitem by (l_orderkey, l_linenumber), orders by o_orderkey, ...),
and every order-preserving operator in this engine — stable-compacting
Filter, Project, Unnest, probe-ordered hash joins, Limit — keeps that
order.  The executor tracks it and uses it to skip the dominant sorts:

* a GROUP BY whose keys cover a prefix of the input order runs the
  *clustered* aggregation path: equal keys are already adjacent, so the
  group structure derives from a boundary scan instead of a full
  multi-payload ``lax.sort`` (the reference's analog is
  ``operator/StreamingAggregationOperator.java`` — pre-sorted input
  aggregated without a hash table);
* a join build side already sorted by its (single) key skips the build
  sort (``PagesHash`` build loop analog elided).

A *chain* is ``[set-of-equivalent-symbols, ...]``: the output rows are
sorted lexicographically ascending by (any representative of) each
position.  Inner equi-joins add the build key to the probe key's
equivalence set (equal values on every emitted row).  ``None`` = unknown
order.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Set

Chain = List[Set[str]]


def chain_from_table(table, symbols: dict) -> Chain:
    """Table sort order -> symbol chain, truncated at the first sort
    column the scan does not materialise."""
    chain: Chain = []
    for col in getattr(table, "sort_columns", []) or []:
        sym = symbols.get(col)
        if sym is None:
            break
        chain.append({sym})
    return chain

def restrict_chain(chain: Optional[Chain], schema) -> Optional[Chain]:
    """Keep only symbols that survive into ``schema``; the chain truncates
    at the first position with no surviving representative."""
    if chain is None:
        return None
    out: Chain = []
    for pos in chain:
        kept = {s for s in pos if s in schema}
        if not kept:
            break
        out.append(kept)
    return out


def project_chain(chain: Optional[Chain], outputs) -> Optional[Chain]:
    """Map a chain through Project outputs: a position survives via every
    output that is a plain ColumnRef of one of its symbols."""
    from ..expr import ir

    if chain is None:
        return None
    renames: dict = {}
    for sym, e in outputs:
        if isinstance(e, ir.ColumnRef):
            renames.setdefault(e.name, set()).add(sym)
    out: Chain = []
    for pos in chain:
        kept: Set[str] = set()
        for s in pos:
            kept |= renames.get(s, set())
        if not kept:
            break
        out.append(kept)
    return out


def add_equivalences(chain: Optional[Chain], equis) -> Optional[Chain]:
    """Inner equi-join: every emitted row has probe key == build key, so
    the build symbol joins the probe symbol's equivalence set."""
    from ..expr import ir

    if not chain:
        return chain
    out = [set(pos) for pos in chain]
    for a, b in equis:
        if isinstance(a, ir.ColumnRef) and isinstance(b, ir.ColumnRef):
            for pos in out:
                if a.name in pos:
                    pos.add(b.name)
                elif b.name in pos:
                    pos.add(a.name)
    return out


def covers_prefix_k(chain: Optional[Chain], keys: Sequence[str]) -> int:
    """Length k of the shortest chain prefix proving that grouping by
    ``keys`` finds equal groups adjacent: every position in [0, k) is
    represented in ``keys`` and the prefix spans every key (keys add no
    finer grouping than the prefix).  0 = no such prefix."""
    if not chain:
        return 0
    ks = set(keys)
    covered: Set[str] = set()
    for i, pos in enumerate(chain):
        if not (pos & ks):
            return 0
        covered |= pos
        if ks <= covered:
            return i + 1
    return 0


def covers_prefix(chain: Optional[Chain], keys: Sequence[str]) -> bool:
    return covers_prefix_k(chain, keys) > 0


def sorted_by(chain: Optional[Chain], sym: str) -> bool:
    """True when the rows are globally sorted ascending by ``sym``."""
    return bool(chain) and sym in chain[0]
