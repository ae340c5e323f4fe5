"""Scalar function breadth: math / string / regex / JSON / URL families
(reference: operator/scalar/MathFunctions, StringFunctions,
JoniRegexpFunctions, JsonFunctions, UrlFunctions) — verified against
python/numpy oracles."""

import math

import numpy as np
import pytest

from presto1_tpu.exec.catalog import TpchCatalog
from presto1_tpu.exec.engine import Engine


@pytest.fixture(scope="module")
def engine():
    return Engine(TpchCatalog(sf=0.001))


def one(engine, expr):
    out = engine.sql(f"select {expr} x").to_pandas()
    return out.x[0]


def test_math_functions(engine):
    assert abs(one(engine, "sin(1.0)") - math.sin(1.0)) < 1e-12
    assert abs(one(engine, "cos(0.5)") - math.cos(0.5)) < 1e-12
    assert abs(one(engine, "atan2(1.0, 2.0)") - math.atan2(1, 2)) < 1e-12
    assert abs(one(engine, "tanh(0.3)") - math.tanh(0.3)) < 1e-12
    assert abs(one(engine, "cbrt(27.0)") - 3.0) < 1e-12
    assert abs(one(engine, "degrees(pi())") - 180.0) < 1e-9
    assert abs(one(engine, "radians(180.0)") - math.pi) < 1e-12
    assert one(engine, "sign(-42)") == -1
    assert one(engine, "sign(7.5)") == 1.0
    assert one(engine, "truncate(-3.7)") == -3.0
    assert abs(one(engine, "log(2.0, 8.0)") - 3.0) < 1e-12
    assert bool(one(engine, "is_nan(nan())"))
    assert not bool(one(engine, "is_finite(infinity())"))
    assert abs(one(engine, "e()") - math.e) < 1e-12


def test_string_functions(engine):
    # string fns fold over the dictionary of a real varchar column
    out = engine.sql(
        "select n_name, replace(n_name, 'A', '_') r, reverse(n_name) rv, "
        "lpad(n_name, 12, '*') lp, rpad(n_name, 12, '*') rp, "
        "strpos(n_name, 'AN') sp, starts_with(n_name, 'A') sw, "
        "split_part(n_name, 'A', 1) s1, codepoint(substr(n_name, 1, 1)) cp "
        "from nation order by n_name").to_pandas()
    for _, r in out.iterrows():
        n = r.n_name
        assert r.r == n.replace("A", "_")
        assert r.rv == n[::-1]
        assert r.lp == ("*" * (12 - len(n)) + n if len(n) < 12 else n[:12])
        assert r.rp == (n + "*" * (12 - len(n)) if len(n) < 12 else n[:12])
        assert r.sp == n.find("AN") + 1
        assert r.sw == n.startswith("A")
        assert r.s1 == n.split("A")[0]
        assert r.cp == ord(n[0])


def test_regex_functions(engine):
    out = engine.sql(
        "select n_name, regexp_like(n_name, '^[A-C]') a, "
        "regexp_extract(n_name, '([A-Z]+)IA', 1) b, "
        "regexp_replace(n_name, '[AEIOU]', '.') c, "
        "regexp_count(n_name, 'A') d "
        "from nation order by n_name").to_pandas()
    import re

    for _, r in out.iterrows():
        n = r.n_name
        assert r.a == bool(re.search("^[A-C]", n))
        m = re.search("([A-Z]+)IA", n)
        assert r.b == (m.group(1) if m else "")
        assert r.c == re.sub("[AEIOU]", ".", n)
        assert r.d == len(re.findall("A", n))


def test_json_functions(engine):
    engine.execute_statement("create table docs (j varchar)")
    engine.execute_statement(
        "insert into docs values "
        "('{\"a\": {\"b\": [1, 2, 3]}, \"n\": 7, \"s\": \"hi\"}'), "
        "('[10, 20]'), ('not json')")
    out = engine.sql(
        "select json_extract_scalar(j, '$.n') n, "
        "json_extract(j, '$.a.b') ab, "
        "json_extract_scalar(j, '$.a.b[1]') b1, "
        "json_extract_scalar(j, '$.s') s, "
        "json_array_length(j) al, json_size(j, '$.a.b') sz "
        "from docs").to_pandas()
    r = out.iloc[0]
    assert r.n == "7"
    assert r.ab == "[1, 2, 3]"
    assert r.b1 == "2"
    assert r.s == "hi"
    assert r.al == -1  # object, not array
    assert r.sz == 3
    assert out.iloc[1].al == 2
    assert out.iloc[2].n == ""  # malformed json -> empty
    engine.execute_statement("drop table docs")


def test_url_functions(engine):
    engine.execute_statement("create table urls (u varchar)")
    engine.execute_statement(
        "insert into urls values "
        "('https://example.com:8443/path/x?q=1&r=2#frag')")
    out = engine.sql(
        "select url_extract_host(u) h, url_extract_path(u) p, "
        "url_extract_protocol(u) pr, url_extract_query(u) q, "
        "url_extract_fragment(u) f, url_extract_port(u) po, "
        "url_decode(url_encode(u)) rt from urls").to_pandas()
    r = out.iloc[0]
    assert r.h == "example.com"
    assert r.p == "/path/x"
    assert r.pr == "https"
    assert r.q == "q=1&r=2"
    assert r.f == "frag"
    assert r.po == 8443
    assert r.rt == "https://example.com:8443/path/x?q=1&r=2#frag"
    engine.execute_statement("drop table urls")


def test_hash_functions(engine):
    import hashlib

    out = engine.sql(
        "select n_name, md5(n_name) m, sha256(n_name) s, to_hex(n_name) h "
        "from nation order by n_name limit 3").to_pandas()
    for _, r in out.iterrows():
        assert r.m == hashlib.md5(r.n_name.encode()).hexdigest()
        assert r.s == hashlib.sha256(r.n_name.encode()).hexdigest()
        assert r.h == r.n_name.encode().hex().upper()


def test_string_edge_functions(engine):
    assert one(engine, "levenshtein_distance('kitten', 'sitting')") == 3
    assert one(engine, "ltrim('  x ')") == "x "
    assert one(engine, "rtrim('  x ')") == "  x"
    assert one(engine, "substr('abcdef', 2, 3)") == "bcd"
    assert one(engine, "strpos('hello', 'll')") == 3
