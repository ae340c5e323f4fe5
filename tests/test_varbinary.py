"""VARBINARY type + binary function family.

Reference: ``spi/type/VarbinaryType.java`` and
``operator/scalar/VarbinaryFunctions.java``.  TPU-first design: varbinary
is dictionary-coded like varchar, with dictionary entries stored as the
latin-1 image of the byte sequence (byte k <-> code point k — bijective
AND order-preserving, so code comparisons are byte comparisons and every
dictionary-machinery path — group-by, order-by, range predicates — is
byte-exact with zero new device code).  Values surface as ``bytes`` at
the client boundary."""

import base64
import hashlib
import zlib

import pytest

from presto1_tpu.exec.catalog import TpchCatalog
from presto1_tpu.exec.engine import Engine


@pytest.fixture(scope="module")
def engine():
    return Engine(TpchCatalog(sf=0.001))


def one(engine, expr):
    out = engine.sql(f"select {expr} x").to_pandas()
    return out.x[0]


def test_binary_literal_and_concat(engine):
    assert one(engine, "X'AB01'") == b"\xab\x01"
    assert one(engine, "X'01' || X'02FF'") == b"\x01\x02\xff"
    assert one(engine, "length(X'AB01CD')") == 3


def test_utf8_hex_base64_round_trips(engine):
    assert one(engine, "to_utf8('hello')") == b"hello"
    assert one(engine, "from_utf8(to_utf8('héllo'))") == "héllo"
    assert one(engine, "to_hex(to_utf8('hello'))") == b"hello".hex().upper()
    assert one(engine, "from_hex('414243')") == b"ABC"
    assert one(engine, "to_base64(to_utf8('hi'))") == \
        base64.b64encode(b"hi").decode()
    assert one(engine, "from_base64('aGk=')") == b"hi"


def test_digests_match_hashlib(engine):
    for fn in ("md5", "sha1", "sha256", "sha512"):
        got = one(engine, f"{fn}(to_utf8('abc'))")
        assert got == getattr(hashlib, fn)(b"abc").digest()
    assert one(engine, "crc32(to_utf8('abc'))") == zlib.crc32(b"abc")


def test_digest_over_column(engine):
    out = engine.sql(
        "select n_name, md5(to_utf8(n_name)) d from nation").to_pandas()
    for _, r in out.iterrows():
        assert r.d == hashlib.md5(r.n_name.encode()).digest()


def test_varbinary_order_by_is_byte_order(engine):
    # latin-1 image ordering == byte ordering (includes bytes > 0x7f)
    out = engine.sql(
        "select md5(to_utf8(n_name)) d from nation order by d").to_pandas()
    vals = list(out.d)
    assert vals == sorted(vals)


def test_varbinary_group_by_and_equality(engine):
    out = engine.sql(
        "select count(*) c, to_utf8(substr(n_name, 1, 1)) k "
        "from nation group by 2 order by c desc, k limit 1").to_pandas()
    assert out.k[0] == b"I" and out.c[0] == 4  # INDIA/INDONESIA/IRAN/IRAQ
    rows = engine.sql("select n_name from nation "
                      "where to_utf8(n_name) = X'414C4745524941'").to_pylist()
    assert rows == [("ALGERIA",)]


def test_no_implicit_varchar_varbinary_coercion(engine):
    from presto1_tpu.types import VARBINARY, VARCHAR, common_supertype

    with pytest.raises(TypeError):
        common_supertype(VARCHAR, VARBINARY)


def test_varchar_legacy_hex_form(engine):
    # varchar-argument digests keep the hex-string convenience form
    got = engine.sql("select md5(n_name) h, n_name from nation "
                     "order by n_name limit 1").to_pandas()
    assert got.h[0] == hashlib.md5(b"ALGERIA").hexdigest()


def test_cast_identity_and_decimal_from_string(engine):
    assert one(engine, "cast('abc' as varchar)") == "abc"
    assert float(one(engine, "cast('1.50' as decimal(5,2))")) == 1.5
