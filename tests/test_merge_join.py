"""merge_join: the single-merge-sort join formulation (ops/join.py).

Covers the round-5 redesign: N:1 inner joins and semi/anti joins run as
ONE stable merge sort + ONE compaction sort, with an optional fused probe
mask (the upstream Filter).  Each case checks the row SET against a
numpy oracle and the ordering contract (output sorted by the join key,
probe order within equal-key runs).
"""

import numpy as np
import pytest

from presto1_tpu.batch import Column, RecordBatch, round_capacity
from presto1_tpu.ops.join import hash_join, merge_join, merge_join_applicable
from presto1_tpu.types import BIGINT

import jax.numpy as jnp


def _batch(**cols):
    n = len(next(iter(cols.values())))
    cap = round_capacity(n)
    out = {}
    for name, v in cols.items():
        v = np.asarray(v, np.int64)
        data = np.zeros(cap, np.int64)
        data[:n] = v
        out[name] = Column(jnp.asarray(data), BIGINT)
    return RecordBatch(out, n)


def _rows(batch, names):
    n = int(batch.num_rows)
    return [tuple(int(np.asarray(batch[c].data)[i]) for c in names)
            for i in range(n)]


def _ranges(*arrays):
    lo = min(int(a.min()) for a in arrays if len(a))
    hi = max(int(a.max()) for a in arrays if len(a))
    return [(lo, hi)]


RNG = np.random.RandomState(11)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_inner_unique_matches_oracle(seed):
    rng = np.random.RandomState(seed)
    bk = rng.permutation(200)[:120]          # unique build keys
    bv = rng.randint(0, 1000, 120)
    pk = rng.randint(0, 220, 500)
    pv = np.arange(500)
    probe = _batch(k=pk, pv=pv)
    build = _batch(bk=bk, bv=bv)
    ranges = _ranges(pk, bk)
    cap = probe.capacity()
    out = merge_join(probe, build, ["k"], ["bk"], "inner", ranges, cap)
    got = sorted(_rows(out, ["k", "pv", "bv"]))
    bmap = dict(zip(bk.tolist(), bv.tolist()))
    want = sorted((int(k), int(v), bmap[int(k)])
                  for k, v in zip(pk, pv) if int(k) in bmap)
    assert got == want
    # ordering contract: output ascending by key; probe order within runs
    keys = [r[0] for r in _rows(out, ["k", "pv"])]
    pvs = _rows(out, ["k", "pv"])
    assert keys == sorted(keys)
    for a, b in zip(pvs, pvs[1:]):
        if a[0] == b[0]:
            assert a[1] < b[1]


@pytest.mark.parametrize("kind", ["semi", "anti"])
def test_semi_anti_duplicate_build(kind):
    rng = np.random.RandomState(3)
    bk = rng.randint(0, 50, 300)             # heavily duplicated build
    pk = rng.randint(0, 80, 400)
    pv = np.arange(400)
    probe = _batch(k=pk, pv=pv)
    build = _batch(bk=bk)
    ranges = _ranges(pk, bk)
    out = merge_join(probe, build, ["k"], ["bk"], kind, ranges,
                     probe.capacity())
    got = sorted(_rows(out, ["k", "pv"]))
    hit = set(bk.tolist())
    want = sorted((int(k), int(v)) for k, v in zip(pk, pv)
                  if (int(k) in hit) == (kind == "semi"))
    assert got == want


@pytest.mark.parametrize("kind", ["inner", "semi", "anti"])
def test_fused_probe_mask(kind):
    rng = np.random.RandomState(5)
    bk = rng.permutation(100)[:60]
    pk = rng.randint(0, 110, 300)
    pv = np.arange(300)
    mask_np = rng.rand(300) < 0.4
    probe = _batch(k=pk, pv=pv)
    build = _batch(bk=bk)
    cap = probe.capacity()
    mask = jnp.zeros((cap,), bool).at[:300].set(jnp.asarray(mask_np))
    ranges = _ranges(pk, bk)
    out = merge_join(probe, build, ["k"], ["bk"], kind, ranges, cap,
                     probe_mask=mask)
    got = sorted(_rows(out, ["k", "pv"]))
    hit = set(bk.tolist())
    if kind == "anti":
        want = [(int(k), int(v)) for k, v, m in zip(pk, pv, mask_np)
                if m and int(k) not in hit]
    else:
        want = [(int(k), int(v)) for k, v, m in zip(pk, pv, mask_np)
                if m and int(k) in hit]
    assert got == sorted(want)


def test_null_keys_never_match():
    pk = np.array([1, 2, 3, 4], np.int64)
    bk = np.array([1, 2, 3], np.int64)
    probe = _batch(k=pk, pv=np.arange(4))
    build = _batch(bk=bk)
    # null out probe rows 1,3 and build row 2
    cap = probe.capacity()
    pv_valid = jnp.zeros((cap,), bool).at[:4].set(
        jnp.asarray([True, False, True, False]))
    bcapv = jnp.zeros((build.capacity(),), bool).at[:3].set(
        jnp.asarray([True, True, False]))
    probe = RecordBatch(
        {"k": Column(probe["k"].data, BIGINT, validity=pv_valid),
         "pv": probe["pv"]}, 4)
    build = RecordBatch(
        {"bk": Column(build["bk"].data, BIGINT, validity=bcapv)}, 3)
    ranges = [(1, 4)]
    out = merge_join(probe, build, ["k"], ["bk"], "inner", ranges, cap)
    assert sorted(_rows(out, ["k", "pv"])) == [(1, 0)]
    out = merge_join(probe, build, ["k"], ["bk"], "anti", ranges, cap)
    # null-key probe rows never match -> kept by ANTI (matches the
    # classic path; NOT IN null semantics are handled by the planner)
    assert sorted(_rows(out, ["pv"])) == [(1,), (2,), (3,)]


def test_composite_keys_and_empty_sides():
    pk1 = np.array([1, 1, 2, 2, 3], np.int64)
    pk2 = np.array([7, 8, 7, 9, 7], np.int64)
    bk1 = np.array([1, 2], np.int64)
    bk2 = np.array([8, 7], np.int64)
    probe = _batch(a=pk1, b=pk2, pv=np.arange(5))
    build = _batch(x=bk1, y=bk2, bv=np.array([10, 20]))
    ranges = [(1, 3), (7, 9)]
    out = merge_join(probe, build, ["a", "b"], ["x", "y"], "inner", ranges,
                     probe.capacity())
    assert sorted(_rows(out, ["a", "b", "bv"])) == [(1, 8, 10), (2, 7, 20)]
    # empty build
    empty = _batch(x=np.zeros(0), y=np.zeros(0), bv=np.zeros(0))
    out = merge_join(probe, empty, ["a", "b"], ["x", "y"], "inner", ranges,
                     probe.capacity())
    assert int(out.num_rows) == 0
    out = merge_join(probe, empty, ["a", "b"], ["x", "y"], "anti", ranges,
                     probe.capacity())
    assert int(out.num_rows) == 5


def test_hash_join_routes_to_merge():
    """hash_join must take the merge path exactly when applicable."""
    assert merge_join_applicable("inner", [(0, 100)], None, True)
    assert merge_join_applicable("semi", [(0, 100)], None, False)
    assert merge_join_applicable("anti", [(0, 100)], None, False)
    assert not merge_join_applicable("inner", [(0, 100)], None, False)
    assert not merge_join_applicable("left", [(0, 100)], None, True)
    wide = [(0, 1 << 40), (0, 1 << 40)]
    assert not merge_join_applicable("semi", wide, None, False)

    bk = np.arange(50, dtype=np.int64)
    pk = RNG.randint(0, 60, 200)
    probe = _batch(k=pk, pv=np.arange(200))
    build = _batch(bk=bk, bv=bk * 2)
    out = hash_join(probe, build, ["k"], ["bk"], "inner", _ranges(pk, bk),
                    probe.capacity(), build_unique=True)
    got = sorted(_rows(out, ["k", "pv", "bv"]))
    want = sorted((int(k), int(v), int(k) * 2)
                  for k, v in zip(pk, np.arange(200)) if k < 50)
    assert got == want
