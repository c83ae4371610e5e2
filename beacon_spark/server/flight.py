"""Arrow Flight transport for an Engine.

The Spark analog of the reference's Flight SQL service
(``beacon-server/beacon-server/src/flight_sql/service.rs:157-476``) and
the serving half of its remote federation (``remote/catalog.rs:1-11``):
a running engine exposed over the network so another engine can ATTACH
it and push queries down.

Protocol (plain Flight carrying the same shapes Flight SQL would; the
pyarrow wheel ships Flight but not the Flight SQL extension):

  - ``do_get(Ticket = JSON {"sql": …, "params": […]?})`` — execute the
    statement on the engine and stream the result as Arrow batches.
  - ``get_flight_info(descriptor)`` — command bytes = the same JSON;
    path = ``[table]`` = ``SELECT * FROM table``. Returns the result
    schema + one endpoint whose ticket re-runs the command.
  - ``do_action("list_tables")`` — one JSON body ``{"tables": [...],
    "datasets": [...]}``: the GetTables-style metadata enumeration a
    remote catalog performs once at ATTACH time (catalog.rs:44-49).
  - optional bearer token: construct with ``token=...``; every call
    must carry ``authorization: Bearer <token>`` (the reference's
    ``ATTACH … WITH ('token' …)``, parser/statement.rs:60).

Scale: federation ships QUERIES in and RESULTS out — table inputs never
cross the wire. Results materialize on the Spark driver
(``df.toArrow()``) before streaming, so remote statements should bound
their result size (LIMIT / aggregation) exactly as any driver collect
must; the reference's Flight service streams through one channel the
same way.
"""

from __future__ import annotations

import json
import threading

import pyarrow as pa
import pyarrow.flight as fl

__all__ = ["BeaconFlightServer"]


class _BearerAuth(fl.ServerMiddlewareFactory):
    def __init__(self, token: str):
        self._want = f"Bearer {token}"

    def start_call(self, info, headers):
        got = headers.get("authorization") or headers.get("Authorization") or []
        if self._want not in got:
            raise fl.FlightUnauthenticatedError("bad or missing bearer token")
        return None


class BeaconFlightServer(fl.FlightServerBase):
    """Serve an :class:`beacon_spark.engine.Engine` over Arrow Flight.

    ``BeaconFlightServer(engine, port=0, token=None)`` — port 0 picks an
    ephemeral port (see ``.port``). ``serve()`` blocks; ``serve_background()``
    runs it on a daemon thread and returns once the port is live.
    """

    def __init__(self, engine, host: str = "127.0.0.1", port: int = 0,
                 token: str | None = None):
        middleware = {"auth": _BearerAuth(token)} if token else None
        super().__init__(f"grpc://{host}:{port}", middleware=middleware)
        self.engine = engine
        self._thread: threading.Thread | None = None

    # ------------------------------------------------------------ helpers

    def _run(self, cmd: dict) -> pa.Table:
        sql = cmd["sql"]
        params = cmd.get("params")
        df = self.engine.sql(sql, params=params)
        return df.toArrow()

    @staticmethod
    def _cmd_from_descriptor(descriptor: fl.FlightDescriptor) -> dict:
        if descriptor.command:
            return json.loads(descriptor.command.decode())
        if descriptor.path:
            tbl = descriptor.path[0].decode()
            return {"sql": f"SELECT * FROM {tbl}"}
        raise fl.FlightServerError("descriptor needs a command or a path")

    # ------------------------------------------------------------ surface

    def do_get(self, context, ticket: fl.Ticket):
        cmd = json.loads(ticket.ticket.decode())
        return fl.RecordBatchStream(self._run(cmd))

    def get_flight_info(self, context, descriptor):
        cmd = self._cmd_from_descriptor(descriptor)
        # schema-only planning: LIMIT 0 keeps it metadata-sized (params
        # must bind here too, or parameterized commands fail at info time)
        schema = (
            self.engine.sql(cmd["sql"], params=cmd.get("params"))
            .limit(0)
            .toArrow()
            .schema
        )
        ticket = fl.Ticket(json.dumps(cmd).encode())
        endpoint = fl.FlightEndpoint(ticket, [])
        return fl.FlightInfo(schema, descriptor, [endpoint], -1, -1)

    def do_put(self, context, descriptor, reader, writer):
        """Ingest an Arrow stream into a managed table (the Flight SQL
        prepared-statement-update role, service.rs:362-380): descriptor
        path = [table] (or command {"table": …}); the uploaded batches
        run through the engine's INSERT path, so catalog versioning and
        index refresh behave exactly as SQL INSERT."""
        import uuid

        if descriptor.command:
            name = json.loads(descriptor.command.decode())["table"]
        elif descriptor.path:
            name = descriptor.path[0].decode()
        else:
            raise fl.FlightServerError("do_put needs a table name")
        tbl = reader.read_all()
        df = self.engine.spark.createDataFrame(tbl)
        tmp = f"__flight_put_{uuid.uuid4().hex}"
        df.createOrReplaceTempView(tmp)
        try:
            self.engine.sql(f"INSERT INTO {name} SELECT * FROM {tmp}")
        finally:
            self.engine.spark.catalog.dropTempView(tmp)

    def do_action(self, context, action: fl.Action):
        if action.type == "list_tables":
            tables = self.engine.table_names()
            try:
                datasets = [
                    r.dataset for r in self.engine.list_datasets().collect()
                ]
            except Exception:
                datasets = []
            body = json.dumps({"tables": tables, "datasets": datasets})
            return [body.encode()]
        if action.type == "ping":
            return [b"pong"]
        raise fl.FlightServerError(f"unknown action {action.type!r}")

    # ------------------------------------------------------------ lifecycle

    def serve_background(self) -> int:
        """Start serving on a daemon thread; returns the bound port."""
        self._thread = threading.Thread(target=self.serve, daemon=True)
        self._thread.start()
        return self.port
