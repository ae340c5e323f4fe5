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


CLEANUP_RULES: List[Rule] = [
    Rule("MergeFilters",  # iterative/rule/MergeFilters.java
         Pattern.node(L.Filter).with_child(Pattern.node(L.Filter)),
         _merge_filters),
    Rule("MergeLimits",  # iterative/rule/MergeLimits.java
         Pattern.node(L.Limit).with_child(Pattern.node(L.Limit)),
         _merge_limits),
    Rule("RemoveRedundantLimit",  # iterative/rule/RemoveRedundantLimit
         Pattern.node(L.Limit).matching(
             lambda n: n.n is None and not n.offset),
         _remove_noop_limit),
    Rule("PushLimitThroughProject",  # iterative/rule/PushLimitThroughProject
         Pattern.node(L.Limit).matching(lambda n: not n.offset)
         .with_child(Pattern.node(L.Project)),
         _push_limit_through_project),
    Rule("RemoveRedundantIdentityProjection",
         Pattern.node(L.Project), _remove_identity_project),
]
