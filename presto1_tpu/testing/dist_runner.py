"""In-test multi-host launcher (DistributedQueryRunner analog).

The reference boots ``nodeCount`` real ``TestingTrinoServer`` instances in
one JVM with real HTTP between them
(``testing/trino-testing/.../DistributedQueryRunner.java:99-149``).  Here
each worker is a separate OS **process** (closer to real multi-host than
threads: separate JAX runtimes, separate memory) speaking the same HTTP
task/results protocol over localhost, with discovery announcements into
the coordinator's NodeRegistry.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional

from ..exec.dist_engine import MultiHostEngine
from ..server.discovery import NodeRegistry


class DiscoveryServer:
    """Minimal coordinator-side discovery HTTP endpoint
    (PUT /v1/announcement/{nodeId})."""

    def __init__(self, registry: NodeRegistry, host: str = "127.0.0.1",
                 port: int = 0):
        reg = registry

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, fmt, *args):
                pass

            def do_PUT(self):
                parts = self.path.strip("/").split("/")
                if parts[:2] == ["v1", "announcement"] and len(parts) == 3:
                    length = int(self.headers.get("Content-Length", "0"))
                    body = json.loads(self.rfile.read(length).decode())
                    reg.announce(parts[2], body["uri"], body.get("catalog", ""),
                                 topology=body.get("topology"))
                    payload = b'{"ok": true}'
                    self.send_response(202)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(payload)))
                    self.end_headers()
                    self.wfile.write(payload)
                    return
                self.send_response(404)
                self.send_header("Content-Length", "0")
                self.end_headers()

            def do_GET(self):
                if self.path == "/v1/node":
                    payload = json.dumps(
                        [n.info() for n in reg.all_nodes()]).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(payload)))
                    self.end_headers()
                    self.wfile.write(payload)
                    return
                self.send_response(404)
                self.send_header("Content-Length", "0")
                self.end_headers()

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]
        self._thread: Optional[threading.Thread] = None

    def start(self) -> "DiscoveryServer":
        self._thread = threading.Thread(target=self.httpd.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()


class MultiHostRunner:
    """Boots N worker processes + an in-process coordinator; tears down on
    close().  Workers run on CPU backends (JAX_PLATFORMS=cpu) so tests need
    no accelerator."""

    def __init__(self, n_workers: int = 2, catalog_spec: str = "tpch:tiny",
                 shards_per_node: int = 1,
                 broadcast_threshold: int = 100_000):
        self.registry = NodeRegistry(probe_interval_s=0.25).start()
        self.discovery = DiscoveryServer(self.registry).start()
        self.workers: List[subprocess.Popen] = []
        self.catalog_spec = catalog_spec
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("XLA_FLAGS", None)
        repo_root = os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
        # workers share the persistent compile cache — fresh processes
        # otherwise recompile the whole operator library per suite run
        env.setdefault("JAX_COMPILATION_CACHE_DIR",
                       os.path.join(repo_root, ".jax_cache_cpu"))
        env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
        for _ in range(n_workers):
            p = subprocess.Popen(
                [sys.executable, "-m", "presto1_tpu.server.worker",
                 "--catalog", catalog_spec,
                 "--coordinator", f"http://127.0.0.1:{self.discovery.port}"],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL)
            self.workers.append(p)
        self._wait_for_nodes(n_workers)
        kind, _, arg = catalog_spec.partition(":")
        from ..exec.catalog import TpchCatalog

        catalog = TpchCatalog(arg or "tiny")
        self.engine = MultiHostEngine(catalog, self.registry,
                                      shards_per_node=shards_per_node,
                                      broadcast_threshold=broadcast_threshold)

    def _wait_for_nodes(self, n: int, timeout_s: float = 60.0) -> None:
        deadline = time.time() + timeout_s
        while time.time() < deadline:
            if len(self.registry.active_nodes()) >= n:
                return
            time.sleep(0.1)
        raise TimeoutError(
            f"only {len(self.registry.active_nodes())}/{n} workers announced")

    def sql(self, sql: str):
        return self.engine.sql(sql)

    def sql_pandas(self, sql: str):
        return self.engine.sql_pandas(sql)

    def kill_worker(self, index: int) -> None:
        """Fault injection: hard-kill one worker process by exact PID."""
        self.workers[index].kill()
        self.workers[index].wait()

    def close(self) -> None:
        for p in self.workers:
            if p.poll() is None:
                p.kill()
                p.wait()
        self.registry.stop()
        self.discovery.stop()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
