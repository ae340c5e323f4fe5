"""Regression tests for scan-input device residency.

A compiled query's scan inputs must be default-device arrays collected
from the real catalog.  A prior regression routed them through the CPU
discovery proxy (host-committed arrays), which silently re-uploaded every
scan column to the accelerator on EVERY run — SF1 Q1 went 69 ms -> 13 s
through the device tunnel.  These tests pin the contract.
"""

import numpy as np

import jax

from presto1_tpu.exec.catalog import TpchCatalog
from presto1_tpu.exec.engine import Engine


def test_host_column_is_numpy_and_does_not_commit():
    catalog = TpchCatalog("tiny")
    t = catalog.table("nation")
    c = t.host_column("n_nationkey")
    assert isinstance(c.data, np.ndarray)
    # host load must not populate the device cache
    assert "n_nationkey" not in t._cache


def test_compiled_inputs_live_on_default_device():
    catalog = TpchCatalog("tiny")
    engine = Engine(catalog)
    cq = engine.compile("select count(*) from nation where n_regionkey = 1")
    default_dev = jax.devices()[0]
    for sym, arr in cq.inputs.items():
        assert isinstance(arr, jax.Array), sym
        assert arr.devices() == {default_dev}, (sym, arr.devices())
    # the shared catalog cache must hold default-device arrays, not
    # host-committed copies from the discovery context
    for col in catalog.table("nation")._cache.values():
        assert isinstance(col.data, jax.Array)
        assert col.data.devices() == {default_dev}


def test_discovery_uses_host_columns(monkeypatch):
    """CPU-side discovery must pull host columns, never device arrays."""
    catalog = TpchCatalog("tiny")
    calls = []
    t = catalog.table("region")
    orig = type(t).host_column

    def spy(self, name):
        calls.append((self.name, name))
        return orig(self, name)

    monkeypatch.setattr(type(t), "host_column", spy)
    from presto1_tpu.exec.executor import _CpuTableProxy

    proxy = _CpuTableProxy(t, jax.devices("cpu")[0])
    proxy.column("r_regionkey")
    assert ("region", "r_regionkey") in calls
