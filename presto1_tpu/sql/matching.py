"""Pattern-matching rule DSL + iterative rule engine.

The analog of ``lib/trino-matching`` (``Pattern``/``Match``/``Captures`` —
``lib/trino-matching/src/main/java/io/trino/matching/Pattern.java``) and the
engine that consumes it, ``IterativeOptimizer``
(``sql/planner/iterative/IterativeOptimizer.java:53,99-157``).  Deliberate
simplification: plans here are immutable trees (no Memo groups/dedup —
``iterative/Memo.java:64``); the engine rewrites top-down to a fixpoint,
which for this node set reaches the same normal forms.

A Pattern matches a plan node by type, property predicates, and (optionally)
a typed pattern on a child; captures let a rule pull out matched subparts by
name.  Rules return a replacement node or None (no fire).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional

from . import logical as L


class Capture:
    """A named slot filled during matching (``matching/Capture.java``)."""

    __slots__ = ("name",)

    def __init__(self, name: str = ""):
        self.name = name


@dataclass
class Match:
    node: L.LogicalNode
    captures: Dict[Capture, Any]

    def get(self, cap: Capture):
        return self.captures[cap]


@dataclass
class Pattern:
    """Type + predicate + child-pattern matcher with captures."""

    node_type: type
    predicates: List[Callable[[L.LogicalNode], bool]] = \
        field(default_factory=list)
    capture_as: Optional[Capture] = None
    child_pattern: Optional["Pattern"] = None  # matches children[0]

    @staticmethod
    def node(t: type) -> "Pattern":
        return Pattern(t)

    def matching(self, pred: Callable[[L.LogicalNode], bool]) -> "Pattern":
        return Pattern(self.node_type, self.predicates + [pred],
                       self.capture_as, self.child_pattern)

    def capturedAs(self, cap: Capture) -> "Pattern":
        return Pattern(self.node_type, self.predicates, cap,
                       self.child_pattern)

    def with_child(self, child: "Pattern") -> "Pattern":
        return Pattern(self.node_type, self.predicates, self.capture_as,
                       child)

    def match(self, node: L.LogicalNode) -> Optional[Match]:
        if not isinstance(node, self.node_type):
            return None
        for p in self.predicates:
            if not p(node):
                return None
        captures: Dict[Capture, Any] = {}
        if self.capture_as is not None:
            captures[self.capture_as] = node
        if self.child_pattern is not None:
            if not node.children:
                return None
            sub = self.child_pattern.match(node.children[0])
            if sub is None:
                return None
            captures.update(sub.captures)
        return Match(node, captures)


@dataclass
class Rule:
    """name + pattern + apply(match) -> replacement | None."""

    name: str
    pattern: Pattern
    apply: Callable[[Match], Optional[L.LogicalNode]]


def apply_rules(plan: L.LogicalNode, rules: List[Rule],
                max_rounds: int = 16,
                trace: Optional[list] = None) -> L.LogicalNode:
    """Iterate the rule set to fixpoint (IterativeOptimizer.exploreGroup
    without the Memo): each round rewrites the tree bottom-up, firing the
    first matching rule per node; stops when a full round fires nothing."""

    def rewrite_once(node: L.LogicalNode) -> tuple:
        fired = False
        new_children = []
        for c in node.children:
            nc, f = rewrite_once(c)
            fired = fired or f
            new_children.append(nc)
        if fired or any(nc is not oc for nc, oc
                        in zip(new_children, node.children)):
            node = node.with_children(new_children)
        for rule in rules:
            m = rule.pattern.match(node)
            if m is None:
                continue
            out = rule.apply(m)
            if out is not None and out is not node:
                if trace is not None:
                    trace.append(rule.name)
                return out, True
        return node, fired

    for _ in range(max_rounds):
        plan, fired = rewrite_once(plan)
        if not fired:
            break
    return plan


# ------------------------------------------------------- canonical rules
# The cleanup subset of iterative/rule/ expressed in the DSL.


def _merge_filters(m: Match) -> Optional[L.LogicalNode]:
    from ..expr import ir

    outer: L.Filter = m.node
    inner: L.Filter = outer.child
    return L.Filter(inner.child,
                    ir.call("and", inner.predicate, outer.predicate))


def _merge_limits(m: Match) -> Optional[L.LogicalNode]:
    outer: L.Limit = m.node
    inner: L.Limit = outer.child
    if outer.offset or inner.offset:
        return None  # offset composition is not commutative — leave alone
    ns = [x for x in (outer.n, inner.n) if x is not None]
    return L.Limit(inner.child, min(ns) if ns else None)


def _remove_noop_limit(m: Match) -> Optional[L.LogicalNode]:
    return m.node.child


def _push_limit_through_project(m: Match) -> Optional[L.LogicalNode]:
    outer: L.Limit = m.node
    proj: L.Project = outer.child
    return L.Project(L.Limit(proj.child, outer.n, outer.offset),
                     proj.outputs)


def _remove_identity_project(m: Match) -> Optional[L.LogicalNode]:
    from ..expr import ir

    proj: L.Project = m.node
    child_schema = proj.child.schema
    if list(child_schema.keys()) != [s for s, _ in proj.outputs]:
        return None
    for s, e in proj.outputs:
        if not (isinstance(e, ir.ColumnRef) and e.name == s):
            return None
    return proj.child


def _merge_limit_with_sort(m: Match) -> Optional[L.LogicalNode]:
    """Limit over an un-truncated Sort = TopN (MergeLimitWithSort.java).
    Executor Sort semantics match exactly: keep limit+offset rows, then
    skip offset."""
    outer: L.Limit = m.node
    inner: L.Sort = outer.child
    return L.Sort(inner.child, inner.keys, limit=outer.n,
                  offset=outer.offset)


def _single_row_output(node: L.LogicalNode) -> bool:
    return isinstance(node, L.SingleRow) or (
        isinstance(node, L.Aggregate) and not node.group)


def _remove_redundant_sort(m: Match) -> Optional[L.LogicalNode]:
    """Sort over a provably <=1-row input (RemoveRedundantSort.java)."""
    sort: L.Sort = m.node
    if sort.limit is None and not sort.offset:
        return sort.child
    return L.Limit(sort.child, sort.limit, sort.offset)


def _merge_sorts(m: Match) -> Optional[L.LogicalNode]:
    """Sort over an un-truncated Sort: the outer order wins, the inner
    sort is dead work (RemoveRedundantSort's sort-below-sort case)."""
    outer: L.Sort = m.node
    inner: L.Sort = outer.child
    return L.Sort(inner.child, outer.keys, outer.limit, outer.offset)


def _eliminate_cross_join_single_row(m: Match) -> Optional[L.LogicalNode]:
    join: L.Join = m.node
    if isinstance(join.right, L.SingleRow):
        return join.left
    if isinstance(join.left, L.SingleRow):
        return join.right
    return None


def _remove_trivial_filter(m: Match) -> Optional[L.LogicalNode]:
    """WHERE true → drop; WHERE false → LIMIT 0 (RemoveTrivialFilters)."""
    from ..expr import ir

    f: L.Filter = m.node
    p = f.predicate
    if isinstance(p, ir.Literal):
        if p.value is True:
            return f.child
        if p.value is False:
            return L.Limit(f.child, 0)
    return None


def _push_limit_through_left_join(m: Match) -> Optional[L.LogicalNode]:
    """A LEFT join emits >=1 row per probe row, so the first n+offset
    output rows involve at most n+offset probe rows
    (PushLimitThroughOuterJoin.java)."""
    outer: L.Limit = m.node
    join: L.Join = outer.child
    if outer.n is None:
        return None
    budget = outer.n + outer.offset
    left = join.left
    if isinstance(left, L.Limit) and left.n is not None \
            and left.n <= budget:
        return None  # already pushed
    return L.Limit(
        L.Join(L.Limit(left, budget), join.right, join.kind, join.equis,
               join.residual, join.build_unique),
        outer.n, outer.offset)


def _branch_mapping(union: L.Union, i: int) -> dict:
    from ..expr import ir

    out = {}
    for s, _, srcs in union.outputs:
        bt = union.inputs[i].schema[srcs[i]]
        out[s] = ir.ColumnRef(srcs[i], bt)
    return out


def _push_limit_through_union(m: Match) -> Optional[L.LogicalNode]:
    """LIMIT n over UNION ALL: each branch needs at most n rows
    (PushLimitThroughUnion.java)."""
    outer: L.Limit = m.node
    union: L.Union = outer.child
    budget = outer.n + outer.offset
    if all(isinstance(c, L.Limit) and c.n is not None and c.n <= budget
           for c in union.inputs):
        return None
    inputs = [c if (isinstance(c, L.Limit) and c.n is not None
                    and c.n <= budget) else L.Limit(c, budget)
              for c in union.inputs]
    return L.Limit(L.Union(inputs, union.outputs), outer.n, outer.offset)


def _push_filter_through_union(m: Match) -> Optional[L.LogicalNode]:
    """Filter over UNION ALL: evaluate per branch, before the concat
    (the SetOperation pushdown of PredicatePushDown)."""
    from ..expr import ir

    f: L.Filter = m.node
    union: L.Union = f.child
    try:
        inputs = [
            L.Filter(union.inputs[i],
                     ir.substitute(f.predicate, _branch_mapping(union, i)))
            for i in range(len(union.inputs))
        ]
    except ValueError:
        return None
    return L.Union(inputs, union.outputs)


def _push_topn_through_union(m: Match) -> Optional[L.LogicalNode]:
    """TopN over UNION ALL: each branch keeps its own top n+offset, the
    outer TopN finishes (PushTopNThroughUnion.java)."""
    from ..expr import ir

    sort: L.Sort = m.node
    union: L.Union = sort.child
    budget = sort.limit + sort.offset
    if all(isinstance(c, L.Sort) and c.limit is not None
           and c.limit <= budget for c in union.inputs):
        return None
    try:
        inputs = []
        for i, c in enumerate(union.inputs):
            if isinstance(c, L.Sort) and c.limit is not None \
                    and c.limit <= budget:
                inputs.append(c)
                continue
            mapping = _branch_mapping(union, i)
            keys = [(ir.substitute(e, mapping), asc, nf)
                    for e, asc, nf in sort.keys]
            inputs.append(L.Sort(c, keys, limit=budget))
    except ValueError:
        return None
    return L.Sort(L.Union(inputs, union.outputs), sort.keys, sort.limit,
                  sort.offset)


def _push_aggregation_through_union(m: Match) -> Optional[L.LogicalNode]:
    """Aggregate over UNION ALL → per-branch PARTIAL aggregates + one
    final over the (tiny) union of partials
    (PushPartialAggregationThroughExchange applied to set operations)."""
    from ..expr import ir

    agg: L.Aggregate = m.node
    union: L.Union = agg.child
    if all(isinstance(c, L.Aggregate) for c in union.inputs):
        return None  # already pushed (or nothing to gain)
    from ..exec.dist_engine import split_aggregate

    split = split_aggregate(agg)
    if split is None:
        return None
    partial, final, project = split
    try:
        new_inputs = []
        for i, c in enumerate(union.inputs):
            mapping = _branch_mapping(union, i)
            b_group = [mapping[g].name for g in agg.group]
            b_calls = [
                L.AggCall(a.symbol, a.fn,
                          None if a.arg is None
                          else ir.substitute(a.arg, mapping),
                          False, a.type)
                for a in partial.aggs
            ]
            new_inputs.append(L.Aggregate(c, b_group, b_calls))
    except ValueError:
        return None
    src_of = {s: srcs for s, _, srcs in union.outputs}
    outputs = [(g, union.schema[g], list(src_of[g])) for g in agg.group]
    outputs += [(a.symbol, a.type, [a.symbol] * len(union.inputs))
                for a in partial.aggs]
    new_union = L.Union(new_inputs, outputs)
    out: L.LogicalNode = L.Aggregate(new_union, agg.group, final.aggs,
                                     agg.primary)
    if project is not None:
        out = project.with_children([out])
    return out


def _push_projection_through_union(m: Match) -> Optional[L.LogicalNode]:
    """Project over UNION ALL → per-branch Projects
    (PushProjectionThroughUnion.java): expression work moves into the
    branches (distributed stages) and exposes Aggregate-over-Union to the
    partial-aggregation pushdown."""
    from ..expr import ir

    proj: L.Project = m.node
    union: L.Union = proj.child
    try:
        new_inputs = []
        for i, c in enumerate(union.inputs):
            mapping = _branch_mapping(union, i)
            new_inputs.append(L.Project(
                c, [(s, ir.substitute(e, mapping))
                    for s, e in proj.outputs]))
    except ValueError:
        return None
    new_outputs = [(s, e.type, [s] * len(union.inputs))
                   for s, e in proj.outputs]
    return L.Union(new_inputs, new_outputs)


def _push_semi_through_inner_join(m: Match) -> Optional[L.LogicalNode]:
    """Semi/anti join over an inner join whose probe keys all come from
    ONE input: filter that input BEFORE the join (a semi join IS a filter
    on the probe relation, and filters push through inner joins).  The
    PredicatePushDown semi-join planning of the reference; on TPC-H q18
    this turns a 6M-row post-join semi into a ~100-row pre-join build."""
    from ..expr import ir

    semi: L.Join = m.node
    inner: L.Join = semi.left
    if inner.kind != "inner" or semi.residual is not None:
        return None
    probe_refs: set = set()
    for a, _ in semi.equis:
        probe_refs |= ir.referenced_columns(a)
    if not probe_refs:
        return None
    for i, child in enumerate(inner.children):
        if probe_refs <= set(child.schema):
            pushed = L.Join(child, semi.right, semi.kind, semi.equis,
                            None, semi.build_unique)
            new_children = list(inner.children)
            new_children[i] = pushed
            return inner.with_children(new_children)
    return None


def _merge_projections(m: Match) -> Optional[L.LogicalNode]:
    """Project over Project → one Project (InlineProjections.java).
    Non-trivial inner expressions inline only when referenced once —
    duplicating work would trade latency for "fewer nodes"."""
    from collections import Counter

    from ..expr import ir

    outer: L.Project = m.node
    inner: L.Project = outer.child
    inner_map = dict(inner.outputs)
    refs: Counter = Counter()
    for _, e in outer.outputs:
        for sub in ir.walk(e):
            if isinstance(sub, ir.ColumnRef) and sub.name in inner_map:
                refs[sub.name] += 1
    for s, cnt in refs.items():
        if cnt > 1 and not isinstance(inner_map[s],
                                      (ir.ColumnRef, ir.Literal)):
            return None
    try:
        new_outputs = [(s, ir.substitute(e, inner_map))
                       for s, e in outer.outputs]
    except ValueError:
        return None
    return L.Project(inner.child, new_outputs)


def _merge_limit_with_topn(m: Match) -> Optional[L.LogicalNode]:
    """Limit over an already-truncated Sort (MergeLimitWithTopN.java):
    the smaller of the two limits wins; offsets must compose trivially
    (inner offset consumed before outer limit counts — only safe when
    the inner has none)."""
    outer: L.Limit = m.node
    inner: L.Sort = outer.child
    if inner.offset or outer.n is None:
        return None
    return L.Sort(inner.child, inner.keys,
                  limit=min(outer.n, max(inner.limit - outer.offset, 0))
                  if inner.limit is not None else outer.n,
                  offset=outer.offset)


def _push_limit_through_mark_distinct(m: Match) -> Optional[L.LogicalNode]:
    """MarkDistinct is row- and order-preserving (markers route back to
    input order), so LIMIT slides below it
    (PushLimitThroughMarkDistinct.java)."""
    outer: L.Limit = m.node
    md = outer.child
    return md.with_children(
        [L.Limit(md.child, outer.n, outer.offset)])


def _push_filter_through_project(m: Match) -> Optional[L.LogicalNode]:
    """Filter over Project commutes by substituting the projected
    expressions into the predicate (the PredicatePushDown core as a
    traced rule) — the filter then keeps sinking toward the scan."""
    from ..expr import ir

    outer: L.Filter = m.node
    proj: L.Project = outer.child
    mapping = dict(proj.outputs)
    try:
        pushed = ir.substitute(outer.predicate, mapping)
    except ValueError:
        return None
    return L.Project(L.Filter(proj.child, pushed), proj.outputs)


def _push_filter_through_sort(m: Match) -> Optional[L.LogicalNode]:
    """Filter commutes with an un-truncated Sort; filtering first shrinks
    the sort's payload (with a limit the filter changes which rows
    survive, so truncated sorts stay put)."""
    outer: L.Filter = m.node
    srt: L.Sort = outer.child
    if srt.limit is not None or srt.offset:
        return None
    return L.Sort(L.Filter(srt.child, outer.predicate), srt.keys)


def _flatten_union(m: Match) -> Optional[L.LogicalNode]:
    """Union containing Union inputs flattens into one n-ary Union
    (MergeUnion.java): fewer exchange hops, one concat."""
    u: L.Union = m.node
    if not any(isinstance(c, L.Union) for c in u.inputs):
        return None
    new_inputs: list = []
    new_cols: list = []  # per output: flattened per-child source symbols
    for _s, _t, _srcs in u.outputs:
        new_cols.append([])
    for ci, child in enumerate(u.inputs):
        if isinstance(child, L.Union):
            sub_of = {s: srcs for s, _t, srcs in child.outputs}
            for gi, (_s, _t, srcs) in enumerate(u.outputs):
                new_cols[gi].extend(sub_of[srcs[ci]])
            new_inputs.extend(child.inputs)
        else:
            for gi, (_s, _t, srcs) in enumerate(u.outputs):
                new_cols[gi].append(srcs[ci])
            new_inputs.append(child)
    outputs = [(s, t, new_cols[gi])
               for gi, (s, t, _srcs) in enumerate(u.outputs)]
    return L.Union(new_inputs, outputs)


def _single_input_union(m: Match) -> Optional[L.LogicalNode]:
    """A one-input Union is a rename: project the lone input."""
    from ..expr import ir

    u: L.Union = m.node
    if len(u.inputs) != 1:
        return None
    child = u.inputs[0]
    return L.Project(child, [(s, ir.ColumnRef(srcs[0], t))
                             for s, t, srcs in u.outputs])


def _remove_redundant_distinct(m: Match) -> Optional[L.LogicalNode]:
    """Pure-DISTINCT aggregation over rows already unique on a subset of
    the distinct keys is a projection (the reference removes these via
    unique-properties dedup in AggregationNode planning): the child
    Aggregate's group keys are unique in its output by construction."""
    from ..expr import ir

    outer: L.Aggregate = m.node
    inner = outer.child
    if outer.aggs or not isinstance(inner, L.Aggregate):
        return None
    if not inner.group or not (set(inner.group) <= set(outer.group)):
        return None
    schema = inner.schema
    return L.Project(inner, [(s, ir.ColumnRef(s, schema[s]))
                             for s in outer.group])


def _push_filter_through_mark_distinct(m: Match) -> Optional[L.LogicalNode]:
    """A filter that only references MarkDistinct's input columns (not
    the markers) slides below it — fewer rows to mark."""
    from ..expr import ir

    outer: L.Filter = m.node
    md = outer.child
    markers = {s for s, _ in md.markers}
    if ir.referenced_columns(outer.predicate) & markers:
        return None
    return md.with_children([L.Filter(md.child, outer.predicate)])


CLEANUP_RULES: List[Rule] = [
    Rule("MergeFilters",  # iterative/rule/MergeFilters.java
         Pattern.node(L.Filter).with_child(Pattern.node(L.Filter)),
         _merge_filters),
    Rule("RemoveTrivialFilter",  # iterative/rule/RemoveTrivialFilters.java
         Pattern.node(L.Filter), _remove_trivial_filter),
    Rule("MergeLimits",  # iterative/rule/MergeLimits.java
         Pattern.node(L.Limit).with_child(Pattern.node(L.Limit)),
         _merge_limits),
    Rule("RemoveRedundantLimit",  # iterative/rule/RemoveRedundantLimit
         Pattern.node(L.Limit).matching(
             lambda n: n.n is None and not n.offset),
         _remove_noop_limit),
    Rule("MergeLimitWithSort",  # iterative/rule/MergeLimitWithSort.java
         Pattern.node(L.Limit).with_child(
             Pattern.node(L.Sort).matching(
                 lambda n: n.limit is None and not n.offset)),
         _merge_limit_with_sort),
    Rule("PushLimitThroughProject",  # iterative/rule/PushLimitThroughProject
         Pattern.node(L.Limit).matching(lambda n: not n.offset)
         .with_child(Pattern.node(L.Project)),
         _push_limit_through_project),
    Rule("PushLimitThroughOuterJoin",  # iterative/rule/PushLimitThroughOuterJoin
         Pattern.node(L.Limit).with_child(
             Pattern.node(L.Join).matching(lambda n: n.kind == "left")),
         _push_limit_through_left_join),
    Rule("PushLimitThroughUnion",  # iterative/rule/PushLimitThroughUnion
         Pattern.node(L.Limit).matching(lambda n: n.n is not None)
         .with_child(Pattern.node(L.Union)),
         _push_limit_through_union),
    Rule("PushTopNThroughUnion",  # iterative/rule/PushTopNThroughUnion
         Pattern.node(L.Sort).matching(lambda n: n.limit is not None)
         .with_child(Pattern.node(L.Union)),
         _push_topn_through_union),
    Rule("PushFilterThroughUnion",  # PredicatePushDown set-operation case
         Pattern.node(L.Filter).with_child(Pattern.node(L.Union)),
         _push_filter_through_union),
    Rule("PushAggregationThroughUnion",  # partial-agg pushdown over union
         Pattern.node(L.Aggregate).with_child(Pattern.node(L.Union)),
         _push_aggregation_through_union),
    Rule("PushProjectionThroughUnion",  # iterative/rule/PushProjectionThroughUnion
         Pattern.node(L.Project).with_child(Pattern.node(L.Union)),
         _push_projection_through_union),
    Rule("RemoveRedundantSort",  # iterative/rule/RemoveRedundantSort.java
         Pattern.node(L.Sort).matching(
             lambda n: _single_row_output(n.child)),
         _remove_redundant_sort),
    Rule("MergeSorts",  # sort below sort: outer order wins
         Pattern.node(L.Sort).with_child(
             Pattern.node(L.Sort).matching(
                 lambda n: n.limit is None and not n.offset)),
         _merge_sorts),
    Rule("EliminateCrossJoinWithSingleRow",
         Pattern.node(L.Join).matching(lambda n: n.kind == "cross"),
         _eliminate_cross_join_single_row),
    Rule("PushSemiJoinThroughInnerJoin",  # PredicatePushDown semi planning
         Pattern.node(L.Join).matching(
             lambda n: n.kind in ("semi", "anti"))
         .with_child(Pattern.node(L.Join)),
         _push_semi_through_inner_join),
    Rule("InlineProjections",  # iterative/rule/InlineProjections.java
         Pattern.node(L.Project).with_child(Pattern.node(L.Project)),
         _merge_projections),
    Rule("RemoveRedundantIdentityProjection",
         Pattern.node(L.Project), _remove_identity_project),
    Rule("MergeLimitWithTopN",  # iterative/rule/MergeLimitWithTopN.java
         Pattern.node(L.Limit).with_child(
             Pattern.node(L.Sort).matching(
                 lambda n: n.limit is not None)),
         _merge_limit_with_topn),
    Rule("PushLimitThroughMarkDistinct",
         # iterative/rule/PushLimitThroughMarkDistinct.java
         Pattern.node(L.Limit).with_child(Pattern.node(L.MarkDistinct)),
         _push_limit_through_mark_distinct),
    Rule("PushFilterThroughProject",  # PredicatePushDown project case
         Pattern.node(L.Filter).with_child(Pattern.node(L.Project)),
         _push_filter_through_project),
    Rule("PushFilterThroughSort",  # PredicatePushDown sort case
         Pattern.node(L.Filter).with_child(Pattern.node(L.Sort)),
         _push_filter_through_sort),
    Rule("FlattenUnion",  # MergeUnion.java
         Pattern.node(L.Union), _flatten_union),
    Rule("SingleInputUnion",
         Pattern.node(L.Union), _single_input_union),
    Rule("RemoveRedundantDistinct",  # unique-properties dedup
         Pattern.node(L.Aggregate).matching(lambda n: not n.aggs)
         .with_child(Pattern.node(L.Aggregate)),
         _remove_redundant_distinct),
    Rule("PushFilterThroughMarkDistinct",
         Pattern.node(L.Filter).with_child(Pattern.node(L.MarkDistinct)),
         _push_filter_through_mark_distinct),
]
