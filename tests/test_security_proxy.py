"""Security (authenticators + access control), proxy, and the web UI
(reference: server/security/, security/AccessControlManager,
service/trino-proxy, webapp/)."""

import json
import urllib.request

import pytest

from presto1_tpu.exec.catalog import TpchCatalog
from presto1_tpu.exec.engine import Engine
from presto1_tpu.client.http_client import Client
from presto1_tpu.server.coordinator import CoordinatorServer
from presto1_tpu.server.proxy import ProxyServer
from presto1_tpu.server.security import (
    AccessControl, AccessDeniedError, AccessRule, PasswordAuthenticator,
    hash_password,
)


@pytest.fixture(scope="module")
def engine():
    return Engine(TpchCatalog(sf=0.001))


def test_password_authenticator_and_acl(engine):
    auth = PasswordAuthenticator(users={
        "alice": hash_password("secret"),
        "bob": "plaintextpw",
    })
    acl = AccessControl([
        AccessRule(user="alice", table="nation|region", allow=True),
        AccessRule(user="alice", allow=False),
    ])
    srv = CoordinatorServer(engine, port=0, authenticator=auth,
                            access_control=acl).start()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        ok = Client(base, user="alice", password="secret")
        cols, rows = ok.execute("select count(*) c from nation")
        assert rows[0][0] == 25

        with pytest.raises(Exception):  # wrong password -> 401
            Client(base, user="alice", password="wrong").execute("select 1")

        with pytest.raises(Exception):  # table denied by rule
            ok.execute("select count(*) from customer")

        # bob matches no rule -> denied by first-match fallthrough
        with pytest.raises(Exception):
            Client(base, user="bob", password="plaintextpw").execute(
                "select count(*) from nation")
    finally:
        srv.stop()


def test_acl_unit():
    acl = AccessControl([AccessRule(user="u1", allow=True),
                         AccessRule(allow=False)])
    acl.check_can_select("u1", "tpch", "lineitem")
    with pytest.raises(AccessDeniedError):
        acl.check_can_select("u2", "tpch", "lineitem")
    assert acl.filter_tables("u2", "tpch", ["a", "b"]) == []


def test_proxy_round_robin_and_affinity(engine):
    s1 = CoordinatorServer(engine, port=0).start()
    s2 = CoordinatorServer(engine, port=0).start()
    proxy = ProxyServer([f"http://127.0.0.1:{s1.port}",
                         f"http://127.0.0.1:{s2.port}"], port=0).start()
    try:
        cli = Client(f"http://127.0.0.1:{proxy.port}")
        for _ in range(4):  # queries land on alternating backends
            cols, rows = cli.execute("select count(*) c from region")
            assert rows[0][0] == 5
        seen = len(s1.manager.queries), len(s2.manager.queries)
        assert seen == (2, 2)
    finally:
        proxy.stop()
        s1.stop()
        s2.stop()


def test_web_ui_page(engine):
    srv = CoordinatorServer(engine, port=0).start()
    try:
        cli = Client(f"http://127.0.0.1:{srv.port}")
        cli.execute("select 1")
        html = urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/ui", timeout=10).read().decode()
        assert "presto1-tpu coordinator" in html
        assert "FINISHED" in html
    finally:
        srv.stop()


def test_acl_covers_subquery_positions(engine):
    """Tables referenced only inside WHERE/SELECT/HAVING subqueries are
    still ACL-checked (enforcement is on resolved plan Scan nodes, not a
    FROM-clause walk), and enforcement fails closed."""
    from presto1_tpu.exec.engine import Engine

    acl = AccessControl([
        AccessRule(user="carol", table="nation|region", allow=True),
        AccessRule(allow=False),
    ])
    eng = Engine(engine.catalog, access_control=acl)
    # allowed: all referenced tables permitted
    out = eng.sql("select count(*) c from nation", user="carol")
    assert int(out.columns["c"].data[0]) == 25
    # denied table only in a WHERE EXISTS subquery
    with pytest.raises(AccessDeniedError):
        eng.sql("select n_name from nation where exists "
                "(select 1 from customer where c_nationkey = n_nationkey)",
                user="carol")
    # denied table only in a scalar subquery in WHERE
    with pytest.raises(AccessDeniedError):
        eng.sql("select r_name from region "
                "where r_regionkey < (select count(*) from supplier)",
                user="carol")
    # denied table inside a CTE
    with pytest.raises(AccessDeniedError):
        eng.sql("with x as (select * from customer) select count(*) from x",
                user="carol")


def test_ui_escapes_user_content(engine):
    """Stored-XSS guard: query text renders escaped in the web console."""
    srv = CoordinatorServer(engine, port=0).start()
    try:
        cli = Client(f"http://127.0.0.1:{srv.port}")
        try:
            cli.execute("select '<script>alert(1)</script>' x from region")
        except Exception:
            pass  # outcome irrelevant; the SQL text is now in the console
        html = urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/ui", timeout=10).read().decode()
        assert "<script>alert(1)" not in html
        assert "&lt;script&gt;" in html
    finally:
        srv.stop()
