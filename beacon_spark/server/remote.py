"""Remote-engine federation client.

The Spark analog of the reference's remote catalog
(``beacon-datafusion-ext/src/remote/catalog.rs:1-11``,
``connection.rs:57``): ``ATTACH 'beacon://host:port' AS lake [WITH
('token' 't', 'tls' 'true')]`` connects over Arrow Flight, enumerates
the remote's tables once (a snapshot, like the reference — re-attach to
pick up new ones), and makes them queryable:

  - ``remote_query('lake', 'SELECT …')`` pushes the WHOLE statement to
    the remote — joins/aggregations between remote tables execute
    remotely, only the result crosses the wire.
  - the engine ALSO does this automatically (the
    FederationOptimizerRule analog, engine._federated_pushdown): a
    read-only statement whose table references all belong to one
    attached remote ships whole as a single lazy scan — see
    engine.py for the fallback rules.
  - ``SELECT … FROM lake__tbl`` — a referenced remote table is a LAZY
    federated scan (``server/remote_datasource.py``): Catalyst pushes
    supported filters into the remote ``WHERE`` (Python-DS
    ``pushFilters``), the schema is narrowed to the statement's
    referenced columns, and the Arrow batches stream to an EXECUTOR —
    big remote tables never ride through the driver.

``remote_query`` results stream back as Arrow batches and land as a
driver-side DataFrame (``spark.createDataFrame(arrow)``) — bound their
size with LIMIT/aggregation as with any collect."""

from __future__ import annotations

import json
import re

import pyarrow.flight as fl

__all__ = ["RemoteBeacon", "parse_remote_url"]

_REMOTE_RE = re.compile(r"^(beacon|grpc|grpc\+tls|grpc\+unix)://", re.IGNORECASE)


def parse_remote_url(url: str) -> str | None:
    """→ grpc location if the ATTACH target is a remote engine, else None."""
    m = _REMOTE_RE.match(url)
    if not m:
        return None
    scheme = m.group(1).lower()
    if scheme == "beacon":  # reference URL scheme (beacon_parser.rs:1261)
        return "grpc://" + url.split("://", 1)[1]
    return url


class RemoteBeacon:
    def __init__(self, url: str, token: str | None = None, tls: bool = False):
        loc = parse_remote_url(url)
        if loc is None:
            raise ValueError(f"not a remote engine URL: {url!r}")
        if tls and loc.startswith("grpc://"):
            loc = "grpc+tls://" + loc[len("grpc://"):]
        self.url = url
        self.location = loc
        self._token = token
        self._client = fl.FlightClient(loc)
        self._tables: list[str] | None = None

    #: cap on METADATA calls (list_tables / schema probes). These run
    #: inside _register_catalog — without a deadline, one hung remote
    #: endpoint blocks EVERY engine statement for the OS TCP timeout.
    #: Data-plane do_get stays uncapped: a big result may stream for
    #: longer than any fixed deadline.
    METADATA_TIMEOUT_SECS = 30.0

    def _opts(self, timeout: float | None = None) -> fl.FlightCallOptions | None:
        headers = ([(b"authorization", f"Bearer {self._token}".encode())]
                   if self._token is not None else [])
        if timeout is None and not headers:
            return None
        kw = {"headers": headers}
        if timeout is not None:
            kw["timeout"] = timeout
        return fl.FlightCallOptions(**kw)

    # ------------------------------------------------------------ metadata

    def list_tables(self) -> list[str]:
        if self._tables is None:
            res = list(
                self._client.do_action(
                    fl.Action("list_tables", b""),
                    options=self._opts(self.METADATA_TIMEOUT_SECS),
                )
            )
            body = json.loads(res[0].body.to_pybytes().decode())
            # datasets are addressable through read_* in pushed SQL; the
            # enumerated view surface is the catalog tables
            self._tables = body["tables"]
            self.datasets = body.get("datasets", [])
        return self._tables

    # ------------------------------------------------------------ querying

    def query_arrow(self, sql: str):
        ticket = fl.Ticket(json.dumps({"sql": sql}).encode())
        return self._client.do_get(ticket, options=self._opts()).read_all()

    def table_schema(self, table: str):
        """Spark schema of a remote table — metadata-only
        (get_flight_info; nothing executes beyond a LIMIT-0 plan)."""
        from pyspark.sql.pandas.types import from_arrow_schema

        if not hasattr(self, "_schemas"):
            self._schemas = {}
        if table not in self._schemas:
            info = self._client.get_flight_info(
                fl.FlightDescriptor.for_path(table),
                options=self._opts(self.METADATA_TIMEOUT_SECS),
            )
            self._schemas[table] = from_arrow_schema(info.schema)
        return self._schemas[table]

    def query_schema(self, sql: str):
        """Spark schema of an arbitrary read-only statement — metadata
        only (get_flight_info plans ``LIMIT 0`` on the remote; nothing
        executes). Used by the federation pushdown to type the lazy
        DataSource over a whole pushed join/agg subtree."""
        from pyspark.sql.pandas.types import from_arrow_schema

        info = self._client.get_flight_info(
            fl.FlightDescriptor.for_command(json.dumps({"sql": sql}).encode()),
            options=self._opts(self.METADATA_TIMEOUT_SECS),
        )
        return from_arrow_schema(info.schema)

    def query(self, spark, sql: str):
        return spark.createDataFrame(self.query_arrow(sql))

    def fetch_table(self, spark, table: str):
        return self.query(spark, f"SELECT * FROM {table}")

    def close(self) -> None:
        self._client.close()
