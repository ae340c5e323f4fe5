"""etc-dir configuration layer (L13 deployment analog).

Reference: airlift ``@Config`` POJOs bound at bootstrap
(``server/Server.java:84``), catalog files via
``metadata/CatalogManager`` + ``server/PluginManager.java``."""

import os

import pytest

from presto1_tpu.server.config import (ConfigError, ServerConfig,
                                       build_catalog, load_properties,
                                       parse_bool, parse_size)


def write(path, text):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(text)


def make_etc(tmp_path, config, catalogs=None, node=None):
    etc = str(tmp_path / "etc")
    write(os.path.join(etc, "config.properties"), config)
    for name, text in (catalogs or {}).items():
        write(os.path.join(etc, "catalog", f"{name}.properties"), text)
    if node:
        write(os.path.join(etc, "node.properties"), node)
    return etc


def test_properties_parser(tmp_path):
    p = str(tmp_path / "x.properties")
    write(p, "# comment\na=1\n  b = two \n\n! also comment\nc=x=y\n")
    assert load_properties(p) == {"a": "1", "b": "two", "c": "x=y"}
    write(p, "noequals\n")
    with pytest.raises(ConfigError):
        load_properties(p)


def test_size_and_bool():
    assert parse_size("4GB") == 4 << 30
    assert parse_size("512MB") == 512 << 20
    assert parse_size("1024") == 1024
    assert parse_bool("TRUE") and not parse_bool("false")
    with pytest.raises(ConfigError):
        parse_size("4 parsecs")


def test_typed_config_and_session_defaults(tmp_path):
    etc = make_etc(
        tmp_path,
        "coordinator=true\n"
        "http-server.http.port=9321\n"
        "query.max-memory-per-node=1GB\n"
        "compile_queries=true\n"          # session property default
        "spill_threshold=4096\n",
        catalogs={"tpch": "connector.name=tpch\ntpch.schema=tiny\n"},
        node="node.id=n-test\nnode.environment=ci\n")
    cfg = ServerConfig.from_etc_dir(etc)
    assert cfg.coordinator and cfg.http_port == 9321
    assert cfg.query_max_memory_per_node == 1 << 30
    assert cfg.session_defaults == {"compile_queries": True,
                                    "spill_threshold": 4096}
    assert cfg.node_id == "n-test" and cfg.node_environment == "ci"
    assert list(cfg.catalogs) == ["tpch"]


def test_unknown_property_fails_at_bootstrap(tmp_path):
    etc = make_etc(tmp_path, "coordinator=true\nhttp-sever.port=1\n")
    with pytest.raises(ConfigError):
        ServerConfig.from_etc_dir(etc)


def test_catalog_factory_validation():
    with pytest.raises(ConfigError):
        build_catalog({}, "x")
    with pytest.raises(ConfigError):
        build_catalog({"connector.name": "oracle9i"}, "x")
    cat = build_catalog({"connector.name": "tpch", "tpch.schema": "tiny"})
    assert "lineitem" in cat.tables


def test_coordinator_end_to_end_from_etc(tmp_path):
    from presto1_tpu.client.http_client import Client

    etc = make_etc(
        tmp_path,
        "coordinator=true\nhttp-server.http.port=0\n",
        catalogs={"tpch": "connector.name=tpch\ntpch.schema=tiny\n"})
    srv = ServerConfig.from_etc_dir(etc).build().start()
    try:
        cli = Client(f"http://127.0.0.1:{srv.port}")
        cols, rows = cli.execute("select count(*) from nation")
        assert rows == [[25]]
    finally:
        srv.stop()


def test_worker_role_from_etc(tmp_path):
    etc = make_etc(
        tmp_path,
        "coordinator=false\nhttp-server.http.port=0\n",
        catalogs={"tpch": "connector.name=tpch\ntpch.schema=tiny\n"})
    cfg = ServerConfig.from_etc_dir(etc)
    assert not cfg.coordinator
    assert cfg.catalog_spec() == "tpch:tiny"
    srv = cfg.build().start()
    try:
        import json
        import urllib.request

        with urllib.request.urlopen(srv.uri() + "/v1/status") as r:
            status = json.load(r)
        assert status["nodeId"]
    finally:
        srv.stop()


def test_multiple_catalogs_need_default(tmp_path):
    etc = make_etc(
        tmp_path, "coordinator=true\n",
        catalogs={"a": "connector.name=tpch\n",
                  "b": "connector.name=memory\n"})
    with pytest.raises(ConfigError):
        ServerConfig.from_etc_dir(etc).pick_catalog_props()
    etc2 = make_etc(
        tmp_path, "coordinator=true\ncatalog.default=b\n",
        catalogs={"a": "connector.name=tpch\n",
                  "b": "connector.name=memory\n"})
    name, props = ServerConfig.from_etc_dir(etc2).pick_catalog_props()
    assert name == "b" and props["connector.name"] == "memory"
