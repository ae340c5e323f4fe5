"""Hierarchical resource groups (round-1 verdict missing item 9;
reference: execution/resourcegroups/InternalResourceGroup.java:77)."""

import threading
import time

import pytest

from presto1_tpu.server.resource_groups import (
    QueryQueueFull, ResourceGroupManager)


def _manager():
    return ResourceGroupManager({
        "groups": [{
            "name": "global", "hardConcurrencyLimit": 2, "maxQueued": 10,
            "subGroups": [
                {"name": "etl", "hardConcurrencyLimit": 1, "maxQueued": 2},
                {"name": "adhoc", "subGroups": [
                    {"name": "${USER}", "hardConcurrencyLimit": 2,
                     "maxQueued": 5}]},
            ],
        }],
        "selectors": [
            {"user": "etl-.*", "group": "global.etl"},
            {"group": "global.adhoc.${USER}"},
        ],
    })


def test_selector_routing_and_templates():
    m = _manager()
    assert m.select("etl-nightly").path == "global.etl"
    g = m.select("alice")
    assert g.path == "global.adhoc.alice"  # templated leaf, per user
    assert g.hard_concurrency_limit == 2   # inherited from the template
    # same user resolves to the same group object
    assert m.select("alice") is g
    assert m.select("bob") is not g


class _Sync:
    """Deterministic executor: runs thunks on demand."""

    def __init__(self):
        self.pending = []

    def __call__(self, thunk):
        self.pending.append(thunk)

    def run_one(self):
        self.pending.pop(0)()


def test_hard_limit_queues_then_dequeues():
    m = _manager()
    ex = _Sync()
    order = []
    for i in range(3):
        m.submit("etl-a", None, lambda i=i: order.append(i), ex)
    # etl limit is 1: one running, two queued, fourth rejected (maxQueued 2)
    with pytest.raises(QueryQueueFull):
        m.submit("etl-a", None, lambda: order.append(99), ex)
    assert len(ex.pending) == 1
    ex.run_one()           # finish #0 -> dispatches #1
    assert order == [0]
    assert len(ex.pending) == 1
    ex.run_one()
    assert order == [0, 1]
    ex.run_one()
    assert order == [0, 1, 2]


def test_parent_limit_gates_children():
    m = _manager()
    ex = _Sync()
    ran = []
    # two adhoc users can run (parent global limit 2)...
    m.submit("alice", None, lambda: ran.append("a"), ex)
    m.submit("bob", None, lambda: ran.append("b"), ex)
    # ...the third queues even though carol's own leaf is empty
    m.submit("carol", None, lambda: ran.append("c"), ex)
    assert len(ex.pending) == 2
    info = m.info()
    assert info["groups"][0]["running"] == 2
    assert info["groups"][0]["queued"] == 1
    ex.run_one()
    assert len(ex.pending) == 2  # carol dispatched on release
    ex.run_one()
    ex.run_one()
    assert sorted(ran) == ["a", "b", "c"]


def test_coordinator_wires_resource_groups():
    from presto1_tpu.exec.catalog import TpchCatalog
    from presto1_tpu.exec.engine import Engine
    from presto1_tpu.server.coordinator import QueryManager
    from presto1_tpu.exec.session import Session

    qm = QueryManager(Engine(TpchCatalog(sf=0.001)), max_concurrency=2)
    q = qm.submit("select 1 x", Session(user="alice"))
    deadline = time.time() + 60
    while q.state in ("QUEUED", "RUNNING") and time.time() < deadline:
        time.sleep(0.02)
    assert q.state == "FINISHED", q.error
    assert q.resource_group == "global"
    # the slot releases asynchronously after the state flips — poll
    deadline = time.time() + 10
    while time.time() < deadline:
        if qm.resource_groups.info()["groups"][0]["running"] == 0:
            break
        time.sleep(0.02)
    assert qm.resource_groups.info()["groups"][0]["running"] == 0
