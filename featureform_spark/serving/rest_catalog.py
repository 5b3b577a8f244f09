"""Read-only Iceberg REST catalog server over protocol-table dirs.

The reference loads Iceberg tables through a catalog (Glue,
offline_store_spark_runner.py:965-980; streamer/iceberg_streamer.py
loads via pyiceberg ``load_catalog``). The REST catalog protocol is
the public, vendor-neutral version of that surface — any modern
Iceberg client (pyiceberg, Spark's RESTCatalog, Trino) speaks it. This
module serves the READ side of the spec over the in-repo
``IcebergProtocolTable`` directories, so a catalog-speaking client can
discover and load tables this engine wrote:

- ``GET /v1/config`` -> ``{"defaults": {}, "overrides": {}}``
- ``GET /v1/namespaces`` -> namespace listing
- ``GET /v1/namespaces/{ns}/tables`` -> table identifiers
- ``GET /v1/namespaces/{ns}/tables/{name}`` -> ``LoadTableResult``
  (``metadata-location`` + the full current metadata JSON)
- ``HEAD /v1/namespaces/{ns}/tables/{name}`` -> 200 / 404

Like the Flight streamer (serving/flight_server.py), the serving path
holds no Spark session: table metadata is read with plain file IO, so
catalog pods are JVM-free. Writes (createTable/commit) are out of
scope — tables commit through their own O_EXCL metadata log; the
catalog is a discovery/load surface.
"""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def _is_iceberg_table(path: str) -> bool:
    return os.path.isdir(os.path.join(path, "metadata"))


class IcebergRestCatalogServer:
    """Serve ``<root>/<namespace>/<table>`` directories as an Iceberg
    REST catalog. Bind port 0 for ephemeral (read ``.port`` back)."""

    def __init__(self, root: str, host: str = "127.0.0.1", port: int = 0):
        self.root = root
        outer = self

        class _Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet test output
                pass

            def _json(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _error(self, code: int, msg: str) -> None:
                # spec ErrorModel shape
                self._json(
                    code,
                    {
                        "error": {
                            "message": msg,
                            "type": "NoSuchObjectException"
                            if code == 404
                            else "BadRequestException",
                            "code": code,
                        }
                    },
                )

            def _route(self):
                parts = [p for p in self.path.split("?")[0].split("/") if p]
                # /v1/config
                if parts == ["v1", "config"]:
                    return ("config", None, None)
                if len(parts) >= 2 and parts[:2] == ["v1", "namespaces"]:
                    if len(parts) == 2:
                        return ("namespaces", None, None)
                    ns = parts[2]
                    if len(parts) == 4 and parts[3] == "tables":
                        return ("tables", ns, None)
                    if len(parts) == 5 and parts[3] == "tables":
                        return ("table", ns, parts[4])
                return (None, None, None)

            def _table_dir(self, ns: str, name: str) -> str | None:
                # ns/name come straight off the URL — realpath-confine
                # the join so "..", absolute components, or symlink
                # hops cannot address tables outside the catalog root
                root = os.path.realpath(outer.root)
                p = os.path.realpath(os.path.join(root, ns, name))
                if not p.startswith(root + os.sep):
                    return None
                return p if _is_iceberg_table(p) else None

            def do_GET(self):
                kind, ns, name = self._route()
                if kind == "config":
                    return self._json(
                        200, {"defaults": {}, "overrides": {}}
                    )
                if kind == "namespaces":
                    out = sorted(
                        d
                        for d in os.listdir(outer.root)
                        if os.path.isdir(os.path.join(outer.root, d))
                    )
                    return self._json(
                        200, {"namespaces": [[d] for d in out]}
                    )
                if kind == "tables":
                    root = os.path.realpath(outer.root)
                    ns_dir = os.path.realpath(os.path.join(root, ns))
                    if not ns_dir.startswith(root + os.sep):
                        return self._error(404, f"namespace {ns!r}")
                    if not os.path.isdir(ns_dir):
                        return self._error(404, f"namespace {ns!r}")
                    idents = [
                        {"namespace": [ns], "name": t}
                        for t in sorted(os.listdir(ns_dir))
                        if _is_iceberg_table(os.path.join(ns_dir, t))
                    ]
                    return self._json(200, {"identifiers": idents})
                if kind == "table":
                    tdir = self._table_dir(ns, name)
                    if tdir is None:
                        return self._error(
                            404, f"table {ns}.{name} not found"
                        )
                    from featureform_spark.sources.iceberg_protocol import (
                        IcebergProtocolTable,
                    )

                    t = IcebergProtocolTable(None, tdir)
                    loc = t._current_metadata_file()
                    with open(loc) as f:
                        md = json.load(f)
                    return self._json(
                        200,
                        {
                            "metadata-location": loc,
                            "metadata": md,
                            "config": {},
                        },
                    )
                return self._error(400, f"unknown route {self.path}")

            def do_HEAD(self):
                kind, ns, name = self._route()
                if kind == "table":
                    code = 200 if self._table_dir(ns, name) else 404
                    self.send_response(code)
                    self.end_headers()
                    return
                self.send_response(400)
                self.end_headers()

        self._httpd = ThreadingHTTPServer((host, port), _Handler)
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()

    def shutdown(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()

    def __enter__(self) -> "IcebergRestCatalogServer":
        return self

    def __exit__(self, *exc) -> None:
        self.shutdown()
