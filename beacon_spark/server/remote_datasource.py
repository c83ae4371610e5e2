"""Remote federated tables as a Python DataSource with filter pushdown.

The reference's ``FederationOptimizerRule`` rewrites plan fragments over
remote tables so filters/projections execute on the remote engine
(``beacon-datafusion-ext/src/runtime_builder.rs:814-827``,
``query_planner.rs:38-45``). The idiomatic Spark 4 analog is a Python
DataSource V2: Catalyst plans ``lake__tbl`` references like any other
scan, and

  - **filter pushdown** arrives through ``DataSourceReader.pushFilters``
    (``spark.sql.python.filterPushdown.enabled``): supported predicates
    compile to a remote ``WHERE`` clause; unsupported ones are yielded
    back for Spark to evaluate post-scan — never dropped.
  - **projection pushdown** happens at registration: the engine narrows
    the DataSource schema to the columns the statement references, so
    the remote ``SELECT`` lists exactly those (Python DS has no
    per-query column-pruning hook yet; the statement-time narrowing
    achieves the same wire shape).
  - the fetch itself runs on an EXECUTOR (``read`` streams Arrow batches
    from the remote Flight endpoint), so a big remote result never
    rides through the driver — the previous ``fetch_table`` did a
    driver-side ``createDataFrame(read_all())``.

One partition per scan: the remote executes one statement and streams
one result; re-running it per partition would multiply remote work.
"""

from __future__ import annotations

import datetime
import math

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualNullSafe,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    Not,
    StringContains,
    StringEndsWith,
    StringStartsWith,
)

__all__ = ["RemoteTableDataSource", "filters_to_sql", "SQL_DIALECTS"]

#: per-dialect identifier quoting + null-safe-equality spelling; string
#: prefix/suffix/contains ops are Spark-function-based and only valid
#: against engines that HAVE those functions (spark dialect)
SQL_DIALECTS = {
    "spark": {"quote": "`", "eq_null_safe": "<=>", "string_fns": True},
    "postgres": {"quote": '"', "eq_null_safe": "IS NOT DISTINCT FROM",
                 "string_fns": False},
    "mysql": {"quote": "`", "eq_null_safe": "<=>", "string_fns": False},
}


def _quote_ident(parts, quote: str = "`") -> str:
    return ".".join(
        quote + p.replace(quote, quote * 2) + quote for p in parts
    )


def _quote_value(v, dialect: str = "spark") -> str | None:
    """SQL literal for a pushed comparison value; None = not expressible
    (the filter is handed back to Spark).

    String escaping is DIALECT-AWARE because the remote's lexer is:
    Spark and MySQL treat backslash as a live escape inside single
    quotes, so ''-doubling alone desyncs on a value ending in ``\\`` —
    the escaped closing quote swallows the next predicate's text into
    the string and re-opens CODE at an attacker-chosen point (a
    filter-value SQL injection into the remote statement, reachable
    from a read-only caller pushing filters through a federated scan).
    PostgreSQL (standard_conforming_strings, the default since 9.1)
    treats backslash literally, where doubling \\ would corrupt the
    value instead."""
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        # repr(nan/inf) is a bare token — invalid SQL in PG/MySQL; hand
        # non-finite comparisons back to Spark instead
        return repr(v) if math.isfinite(v) else None
    if isinstance(v, int):
        return repr(v)
    if isinstance(v, str):
        if dialect in ("spark", "mysql"):
            body = v.replace("\\", "\\\\").replace("'", "''")
        else:  # postgres
            body = v.replace("'", "''")
        return "'" + body + "'"
    if isinstance(v, datetime.datetime):
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
    if isinstance(v, datetime.date):
        return f"DATE '{v.isoformat()}'"
    return None


def _filter_to_sql(f, dialect: str = "spark") -> str | None:
    """One pushed Filter → SQL predicate text, or None if unsupported."""
    d = SQL_DIALECTS[dialect]
    if isinstance(f, Not):
        inner = _filter_to_sql(f.child, dialect)
        return None if inner is None else f"(NOT {inner})"
    col = _quote_ident(f.attribute, d["quote"])
    if isinstance(f, EqualTo):
        v = _quote_value(f.value, dialect)
        return None if v is None else f"({col} = {v})"
    if isinstance(f, EqualNullSafe):
        v = _quote_value(f.value, dialect)
        return None if v is None else f"({col} {d['eq_null_safe']} {v})"
    if isinstance(f, GreaterThan):
        v = _quote_value(f.value, dialect)
        return None if v is None else f"({col} > {v})"
    if isinstance(f, GreaterThanOrEqual):
        v = _quote_value(f.value, dialect)
        return None if v is None else f"({col} >= {v})"
    if isinstance(f, LessThan):
        v = _quote_value(f.value, dialect)
        return None if v is None else f"({col} < {v})"
    if isinstance(f, LessThanOrEqual):
        v = _quote_value(f.value, dialect)
        return None if v is None else f"({col} <= {v})"
    if isinstance(f, In):
        vs = [_quote_value(v, dialect) for v in f.values]
        if not vs or any(v is None for v in vs):
            return None
        return f"({col} IN ({', '.join(vs)}))"
    if isinstance(f, IsNull):
        return f"({col} IS NULL)"
    if isinstance(f, IsNotNull):
        return f"({col} IS NOT NULL)"
    if isinstance(f, (StringStartsWith, StringEndsWith, StringContains)):
        if not d["string_fns"]:
            return None  # handed back to Spark (LIKE-escaping is dialect soup)
        fn = {StringStartsWith: "startswith", StringEndsWith: "endswith",
              StringContains: "contains"}[type(f)]
        return f"({fn}({col}, {_quote_value(f.value, dialect)}))"
    return None


def filters_to_sql(filters, dialect: str = "spark") -> tuple[list[str], list]:
    """(pushable predicate texts, unsupported filters to hand back)."""
    preds, rest = [], []
    for f in filters:
        sql = _filter_to_sql(f, dialect)
        if sql is None:
            rest.append(f)
        else:
            preds.append(sql)
    return preds, rest


class _RemoteReader(DataSourceReader):
    def __init__(self, schema, options):
        self._url = options["url"]
        self._token = options.get("token") or None
        # either a bare remote table (per-table federated scan) or a whole
        # pushed statement (federation pushdown of a join/agg subtree —
        # the engine's _federated_pushdown rewrote alias__t refs away)
        self._table = options.get("table")
        self._sql = options.get("sql")
        if not self._table and not self._sql:
            raise ValueError("beacon_remote needs a 'table' or 'sql' option")
        self._columns = [f.name for f in schema.fields]
        self._preds: list[str] = []

    def pushFilters(self, filters):
        self._preds, rest = filters_to_sql(filters)
        yield from rest

    def remote_sql(self) -> str:
        if self._sql and not self._preds:
            # whole-statement pushdown: ship it verbatim — wrapping in a
            # subquery would only obscure the remote's own plan cache
            return self._sql
        base = self._table if self._table else f"({self._sql}) AS __fed_push"
        cols = ", ".join(_quote_ident((c,)) for c in self._columns) or "*"
        sql = f"SELECT {cols} FROM {base}"
        if self._preds:
            sql += " WHERE " + " AND ".join(self._preds)
        return sql

    def partitions(self):
        # CONTRACT (pinned in tests/test_flight.py): exactly ONE
        # partition, always. The remote executes one statement and
        # streams one result; a single partition both avoids re-running
        # the statement per partition AND preserves the remote's row
        # order — which is what makes a whole-pushed ORDER BY statement
        # (rewritten locally to `SELECT * FROM __fed_x`) come back
        # ordered. Splitting this scan would silently break pushed
        # ORDER BY semantics.
        return [InputPartition(0)]

    def read(self, partition):
        # executor-side: connect, stream, yield Arrow batches — the
        # result never transits the driver
        import json

        import pyarrow.flight as fl

        client = fl.FlightClient(self._url)
        opts = None
        if self._token:
            opts = fl.FlightCallOptions(
                headers=[(b"authorization", f"Bearer {self._token}".encode())]
            )
        ticket = fl.Ticket(json.dumps({"sql": self.remote_sql()}).encode())
        try:
            for chunk in client.do_get(ticket, options=opts):
                if chunk.data is not None and chunk.data.num_rows:
                    yield chunk.data
        finally:
            client.close()


class RemoteTableDataSource(DataSource):
    """``spark.read.format("beacon_remote").schema(narrowed).options(
    url=…, table=…, token=…)`` — see module docstring."""

    @classmethod
    def name(cls):
        return "beacon_remote"

    def schema(self):
        raise NotImplementedError(
            "beacon_remote requires an explicit schema (the engine "
            "narrows it to the statement's referenced columns)"
        )

    def reader(self, schema):
        return _RemoteReader(schema, self.options)
