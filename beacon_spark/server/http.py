"""HTTP transport for an Engine (stdlib ``http.server``, no framework).

The Spark analog of the reference's axum client API
(``beacon-server/beacon-server/src/axum/client/query.rs:20-80``,
``tables.rs``, ``router.rs:107-118``). Endpoints:

  - ``POST /api/query`` — body ``{"sql": "…"}`` or a JSON-DSL query
    object (``{"select": …, "from": …}``, query.rs request_body).
    Response: Arrow IPC stream (``application/vnd.apache.arrow.stream``,
    the reference's default) or JSON records with ``{"format":
    "json"}``.
  - ``GET /api/health`` → ``Ok``
  - ``GET /api/datasets`` / ``/api/list-datasets`` → dataset listing
  - ``GET /api/total-datasets`` → count
  - ``GET /api/tables`` → catalog tables
  - ``GET /api/table-schema?table=t`` → Spark schema JSON
  - ``GET /api/info`` → engine version info
  - optional bearer token (same contract as the Flight transport)

Like the Flight transport, results materialize on the Spark driver and
stream out — queries in, results out; inputs never cross the wire.
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

__all__ = ["BeaconHttpServer"]

_ARROW_MIME = "application/vnd.apache.arrow.stream"


class BeaconHttpServer:
    def __init__(self, engine, host: str = "127.0.0.1", port: int = 0,
                 token: str | None = None):
        self.engine = engine
        self._token = token
        outer = self

        class Handler(BaseHTTPRequestHandler):
            # quiet request logging (stderr noise in tests/servers)
            def log_message(self, *args):
                pass

            def _deny(self, code: int, msg: str) -> None:
                body = json.dumps(msg).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _authed(self) -> bool:
                if outer._token is None:
                    return True
                if self.headers.get("Authorization") == f"Bearer {outer._token}":
                    return True
                self._deny(401, "bad or missing bearer token")
                return False

            def _send(self, payload: bytes, ctype: str) -> None:
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def _send_json(self, obj) -> None:
                self._send(json.dumps(obj).encode(), "application/json")

            def do_GET(self):
                if not self._authed():
                    return
                u = urlparse(self.path)
                q = {k: v[0] for k, v in parse_qs(u.query).items()}
                try:
                    self._route_get(u.path, q)
                except Exception as e:
                    self._deny(400, str(e))

            def _route_get(self, path: str, q: dict) -> None:
                eng = outer.engine
                if path == "/api/health":
                    self._send(b"Ok", "text/plain")
                elif path in ("/api/datasets", "/api/list-datasets"):
                    rows = eng.list_datasets().collect()
                    self._send_json(
                        [{"dataset": r.dataset, "format": r.format} for r in rows]
                    )
                elif path == "/api/total-datasets":
                    self._send_json({"total": eng.list_datasets().count()})
                elif path == "/api/tables":
                    cat = eng.catalog._load() if eng.catalog else {}
                    self._send_json(
                        sorted(
                            list(cat.get("tables", {}))
                            + list(cat.get("external_tables", {}))
                            + list(cat.get("views", {}))
                            + list(cat.get("materialized_views", {}))
                        )
                    )
                elif path == "/api/table-schema":
                    tbl = q.get("table")
                    if not tbl:
                        raise ValueError("table-schema needs ?table=")
                    df = eng.sql(f"SELECT * FROM {tbl} LIMIT 0")
                    self._send_json(json.loads(df.schema.json()))
                elif path == "/api/info":
                    from beacon_spark.version import VERSION

                    self._send_json({"version": VERSION, "engine": "beacon_spark"})
                else:
                    self._deny(404, f"no such endpoint: {path}")

            def do_POST(self):
                if not self._authed():
                    return
                u = urlparse(self.path)
                if u.path != "/api/query":
                    self._deny(404, f"no such endpoint: {u.path}")
                    return
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(n).decode() or "{}")
                    if not isinstance(req, dict):
                        raise ValueError("query body must be a JSON object")
                    if "sql" in req:
                        df = outer.engine.sql(req["sql"], params=req.get("params"))
                    else:
                        # the JSON query DSL rides the same endpoint
                        # (query.rs: InnerQuery::Sql | Json); "format" is
                        # transport-level, not part of the DSL
                        body = req.get("query", req)
                        df = outer.engine.query(
                            {k: v for k, v in body.items() if k != "format"}
                        )
                    if req.get("format") == "json":
                        self._send_json(
                            [row.asDict(recursive=True) for row in df.collect()]
                        )
                        return
                    import pyarrow as pa

                    tbl = df.toArrow()
                    sink = io.BytesIO()
                    with pa.ipc.new_stream(sink, tbl.schema) as w:
                        w.write_table(tbl)
                    self._send(sink.getvalue(), _ARROW_MIME)
                except Exception as e:
                    self._deny(400, str(e))

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread: threading.Thread | None = None

    def serve_background(self) -> int:
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self.port

    def shutdown(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
