"""Multi-host distributed engine (coordinator side of the DCN plane).

The reference's coordinator control plane in miniature: plan → fragment →
schedule tasks on discovered workers → pull result pages → final stage.

* Fragmenter: cuts the optimized plan at the source-stage boundary the way
  ``PlanFragmenter.createSubPlans`` (``sql/planner/PlanFragmenter.java:106``)
  cuts at exchanges.  Two fragment shapes:
    - partial/final aggregation (the ``PushPartialAggregationThroughExchange``
      rewrite): workers aggregate their shard, the coordinator combines —
      sum→sum, count→sum, min→min, max→max, avg→sum+count then divide.
    - scan-chain shipping: each maximal Scan[+Filter+Project] subtree runs
      on the workers (row-sharded splits); the coordinator unions pages and
      executes the rest of the plan locally.
* Scheduler: round-robins shards over ``NodeRegistry.active_nodes()``
  (UniformNodeSelector analog); one task per (node, fragment).
* Results: token-acknowledged page pulls with Backoff retry
  (``operator/HttpPageBufferClient.java:321``); any task failure fails the
  query (the reference has no task retry either — SURVEY §5.3).

Within each worker, execution is the usual single-host XLA path; across
hosts, pages move over DCN (HTTP here) exactly once, partial-aggregated
where possible to keep the wire thin.
"""

from __future__ import annotations

import json
import threading
import time
import uuid
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple
from urllib import request as urlrequest

from ..expr import ir
from ..sql import logical as L
from ..sql.optimizer import optimize
from ..sql.planner import Planner
from ..sql import parser as sql_parser
from ..sql.serde import plan_to_json
from ..server.discovery import Backoff, NodeRegistry
from ..types import BIGINT, DOUBLE
from .executor import Executor
from .pages import concat_batches, deserialize_batch


class QueryFailed(Exception):
    pass


def _is_scan_chain(node: L.LogicalNode) -> bool:
    """True if the subtree is Scan with only Filter/Project above it —
    executable independently on a row shard of its table."""
    if isinstance(node, L.Scan):
        return True
    if isinstance(node, (L.Filter, L.Project)):
        return _is_scan_chain(node.children[0])
    return False


@dataclass
class AggSplit:
    """Partial/final decomposition of one AggCall."""
    partial: List[L.AggCall]              # worker-side calls
    final: List[L.AggCall]                # coordinator-side calls
    # expression assembling the original symbol from final symbols (for avg)
    assemble: Optional[Tuple[str, ir.Expr]] = None


def split_aggregate(agg: L.Aggregate) -> Optional[Tuple[L.Aggregate,
                                                        L.Aggregate,
                                                        Optional[L.Project]]]:
    """Aggregate → (partial on worker, final on coordinator, optional
    assembling Project).  None if not splittable (distinct aggs)."""
    if any(a.distinct for a in agg.aggs):
        return None
    partial_calls: List[L.AggCall] = []
    final_calls: List[L.AggCall] = []
    assembles: List[Tuple[str, ir.Expr]] = []
    for a in agg.aggs:
        if a.fn in ("sum", "count", "count_star"):
            # worker computes the partial; coordinator sums partials
            pt = a.type
            partial_calls.append(L.AggCall(a.symbol, a.fn, a.arg, False, pt))
            final_calls.append(L.AggCall(
                a.symbol, "sum", ir.ColumnRef(a.symbol, pt), False, a.type))
        elif a.fn in ("min", "max"):
            partial_calls.append(L.AggCall(a.symbol, a.fn, a.arg, False,
                                           a.type))
            final_calls.append(L.AggCall(
                a.symbol, a.fn, ir.ColumnRef(a.symbol, a.type), False,
                a.type))
        elif a.fn == "avg":
            ssym, csym = a.symbol + "$sum", a.symbol + "$cnt"
            arg_t = a.arg.type
            from ..ops.hashagg import AggSpec

            sum_t = AggSpec("sum", _FakeCol(arg_t), "").output_type()
            partial_calls.append(L.AggCall(ssym, "sum", a.arg, False, sum_t))
            partial_calls.append(L.AggCall(csym, "count", a.arg, False,
                                           BIGINT))
            final_calls.append(L.AggCall(
                ssym, "sum", ir.ColumnRef(ssym, sum_t), False, sum_t))
            final_calls.append(L.AggCall(
                csym, "sum", ir.ColumnRef(csym, BIGINT), False, BIGINT))
            num = ir.Call("cast", (ir.ColumnRef(ssym, sum_t),), DOUBLE)
            den = ir.Call("cast", (ir.ColumnRef(csym, BIGINT),), DOUBLE)
            assembles.append((a.symbol, ir.Call("/", (num, den), DOUBLE)))
        else:
            return None
    partial = L.Aggregate(agg.child, agg.group, partial_calls, agg.primary)
    # the final stage consumes the merged partial batches through a stub
    final = L.Aggregate(agg.child, agg.group, final_calls, agg.primary)
    project = None
    if assembles:
        outputs: List[Tuple[str, ir.Expr]] = []
        made = dict(assembles)
        for s in agg.group:
            outputs.append((s, ir.ColumnRef(s, agg.child.schema[s])))
        for a in agg.aggs:
            if a.symbol in made:
                outputs.append((a.symbol, made[a.symbol]))
            else:
                outputs.append((a.symbol, ir.ColumnRef(a.symbol, a.type)))
        project = L.Project(final, outputs)
    return partial, final, project


class _FakeCol:
    """Adapter so AggSpec.output_type() can be reused for logical typing."""

    def __init__(self, t):
        self.type = t


@dataclass
class Fragment:
    path: Tuple[int, ...]     # stub path in the coordinator plan
    plan: L.LogicalNode       # worker fragment plan
    table: str                # sharded table (split source)


def fragment_plan(plan: L.LogicalNode):
    """Cut the plan: returns (coordinator_plan, fragments).

    Every maximal scan-chain subtree becomes a worker fragment; if an
    Aggregate sits directly on a scan chain, the fragment runs the partial
    aggregation and the coordinator node is replaced by final(+assemble).
    """
    fragments: List[Fragment] = []

    def scan_table(node):
        while not isinstance(node, L.Scan):
            node = node.children[0]
        return node.table

    def visit(node: L.LogicalNode, path: Tuple[int, ...]) -> L.LogicalNode:
        if isinstance(node, L.Aggregate) and _is_scan_chain(node.child):
            split = split_aggregate(node)
            if split is not None:
                partial, final, project = split
                # the final stage reads merged partials at its child path;
                # an assembling Project shifts the aggregate one level down
                frag_path = path + ((0, 0) if project is not None else (0,))
                fragments.append(Fragment(frag_path, partial,
                                          scan_table(node.child)))
                return final if project is None else project
        if _is_scan_chain(node) and not isinstance(node, L.Scan):
            fragments.append(Fragment(path, node, scan_table(node)))
            return node  # stubbed at `path` by the executor
        if isinstance(node, L.Scan):
            fragments.append(Fragment(path, node, node.table))
            return node
        children = [visit(c, path + (i,))
                    for i, c in enumerate(node.children)]
        return node.with_children(children)

    coord = visit(plan, ())
    return coord, fragments


class RemoteTaskClient:
    """Coordinator-side handle for one worker task (HttpRemoteTask analog)."""

    def __init__(self, node, task_id: str):
        self.node = node
        self.task_id = task_id
        self.backoff = Backoff()

    def create(self, fragment_json: dict, shard: dict) -> None:
        body = json.dumps({"fragment": fragment_json,
                           "shard": shard}).encode()
        self._rpc("POST", f"/v1/task/{self.task_id}", body)

    def fetch_pages(self) -> List[bytes]:
        pages: List[bytes] = []
        token = 0
        while True:
            data, headers = self._rpc_raw(
                "GET", f"/v1/task/{self.task_id}/results/{token}")
            if headers.get("X-P1-Buffer-Complete") == "true":
                return pages
            if headers.get("X-P1-Page-Present") == "true":
                pages.append(data)
                token += 1
            # else: task still running — re-poll the same token

    def _rpc(self, method: str, path: str, body: Optional[bytes] = None):
        data, _ = self._rpc_raw(method, path, body)
        return json.loads(data.decode()) if data else None

    def _rpc_raw(self, method: str, path: str,
                 body: Optional[bytes] = None):
        while True:
            try:
                req = urlrequest.Request(
                    f"{self.node.uri}{path}", data=body, method=method,
                    headers={"Content-Type": "application/json"})
                with urlrequest.urlopen(req, timeout=30) as resp:
                    payload = resp.read()
                    self.backoff.success()
                    return payload, dict(resp.headers)
            except Exception as e:  # noqa: BLE001 — retried with budget
                import urllib.error

                if isinstance(e, urllib.error.HTTPError):
                    # application error from the worker: no retry
                    try:
                        msg = json.loads(e.read().decode()).get("error", str(e))
                    except Exception:  # noqa: BLE001
                        msg = str(e)
                    raise QueryFailed(
                        f"task {self.task_id} on {self.node.node_id} "
                        f"failed: {msg}") from None
                if self.backoff.failure():
                    raise QueryFailed(
                        f"node {self.node.node_id} unreachable: {e}") from None
                time.sleep(self.backoff.delay_s())


class MultiHostEngine:
    """SQL over a set of worker hosts discovered via the registry."""

    def __init__(self, catalog, registry: NodeRegistry,
                 shards_per_node: int = 1):
        self.catalog = catalog  # coordinator-local metadata (plan-time only)
        self.registry = registry
        self.shards_per_node = shards_per_node

    def plan(self, sql: str) -> L.LogicalNode:
        q = sql_parser.parse(sql)
        return optimize(Planner(self.catalog).plan(q), self.catalog)

    def sql(self, sql: str):
        plan = self.plan(sql)
        coord_plan, fragments = fragment_plan(plan)
        nodes = self.registry.active_nodes()
        if not nodes:
            raise QueryFailed("no active worker nodes")
        n_shards = len(nodes) * self.shards_per_node
        stubs: Dict[Tuple[int, ...], object] = {}
        threads: List[threading.Thread] = []
        errors: List[Exception] = []
        results: Dict[Tuple[Tuple[int, ...], int], List[bytes]] = {}
        lock = threading.Lock()

        def run_task(frag: Fragment, shard_idx: int, node):
            try:
                client = RemoteTaskClient(node, uuid.uuid4().hex[:16])
                client.create(plan_to_json(frag.plan),
                              {"index": shard_idx, "count": n_shards})
                pages = client.fetch_pages()
                with lock:
                    results[(frag.path, shard_idx)] = pages
            except Exception as e:  # noqa: BLE001 — collected, fails query
                with lock:
                    errors.append(e)

        for frag in fragments:
            for shard_idx in range(n_shards):
                node = nodes[shard_idx % len(nodes)]
                t = threading.Thread(target=run_task,
                                     args=(frag, shard_idx, node),
                                     daemon=True)
                t.start()
                threads.append(t)
        for t in threads:
            t.join()
        if errors:
            raise QueryFailed(str(errors[0]))

        for frag in fragments:
            batches = []
            for shard_idx in range(n_shards):
                for page in results.get((frag.path, shard_idx), []):
                    batches.append(deserialize_batch(page))
            merged = concat_batches(batches)
            if merged is None:
                from ..batch import RecordBatch
                import numpy as np
                import jax.numpy as jnp
                from ..batch import Column

                cols = {}
                for s, t in frag.plan.schema.items():
                    cols[s] = Column(jnp.zeros(128, dtype=t.np_dtype), t)
                merged = RecordBatch(cols, 0)
            stubs[frag.path] = merged

        return Executor(self.catalog, stubs=stubs).execute(coord_plan)

    def sql_pandas(self, sql: str):
        return self.sql(sql).to_pandas()
