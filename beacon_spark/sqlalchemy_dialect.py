"""SQLAlchemy dialect over the PEP 249 client (client.py).

The reference's Python package ships one for its embedded database
(``beacon-db/beacon-db-py/python/beacondb/sqlalchemy.py:1-204``): a thin
``DefaultDialect`` whose compiler is the generic ANSI one (the engine
speaks ANSI SQL), with reflection answered from engine metadata and
connect-args parsed off the URL. Ours follows the same contract against
Spark SQL metadata:

    from sqlalchemy import create_engine
    from beacon_spark.sqlalchemy_dialect import register_dialect
    register_dialect()
    engine = create_engine("beaconspark:///path/to/lake")   # dir or .db
    engine = create_engine("beaconspark://")                 # in-memory
    import pandas as pd
    pd.read_sql("SELECT * FROM obs", engine)

Reflection uses ``SHOW TABLES`` (engine.py show_tables: table_name +
table_type) and ``DESCRIBE <table>`` (name, spark type, comment) rather
than ``information_schema`` — the engine DOES expose
information_schema.tables/columns (engine._rewrite_information_schema),
but those are super-user-only metadata schemas, while SHOW/DESCRIBE
reflect for any principal. The engine is autocommit; PEP 249
commit/rollback are no-ops.

sqlalchemy is an OPTIONAL dependency: the reflection/connect-args logic
lives in plain functions (testable without it); only the dialect class
itself needs the package.
"""

from __future__ import annotations

import re
from typing import Any, Callable

__all__ = [
    "resolve_type_name",
    "connect_kwargs_from_url",
    "reflect_table_names",
    "reflect_view_names",
    "reflect_columns",
    "register_dialect",
    "BeaconSparkDialect",
]

#: Spark SQL type string prefix → SQLAlchemy generic type NAME
#: (longest-prefix-first; parameterized types like decimal(5,2) and
#: nested types resolve on their head word)
_TYPE_PREFIXES: list[tuple[str, str]] = [
    ("boolean", "BOOLEAN"),
    ("tinyint", "SMALLINT"),
    ("smallint", "SMALLINT"),
    ("bigint", "BIGINT"),
    ("int", "INTEGER"),
    ("float", "FLOAT"),
    ("double", "FLOAT"),
    ("decimal", "NUMERIC"),
    ("string", "VARCHAR"),
    ("varchar", "VARCHAR"),
    ("char", "CHAR"),
    ("timestamp", "TIMESTAMP"),  # timestamp + timestamp_ntz
    ("date", "DATE"),
    ("interval", "Interval"),
    ("binary", "LargeBinary"),
]


def resolve_type_name(spark_type: str) -> str | None:
    """SQLAlchemy generic type name for a Spark SQL type string, or None
    for nested/unknown types (→ NullType; values still round-trip via
    the DB-API)."""
    key = (spark_type or "").strip().lower()
    for prefix, name in _TYPE_PREFIXES:
        if key.startswith(prefix):
            return name
    return None


def _as_bool(value: Any) -> bool:
    return str(value).strip().lower() in ("1", "true", "yes", "on")


def connect_kwargs_from_url(
    database: str | None,
    query: dict[str, str],
    username: str | None = None,
    password: str | None = None,
) -> dict[str, Any]:
    """URL pieces → ``beacon_spark.client.connect`` kwargs: the database
    path (empty → in-memory), boolean/string query options, userinfo
    credentials (query params win, like the reference)."""
    kwargs: dict[str, Any] = {"database": database or ":memory:"}
    query = dict(query)
    for key in ("auth", "read_only"):
        if key in query:
            kwargs[key] = _as_bool(query.pop(key))
    for key in ("username", "password", "datasets"):
        if key in query:
            kwargs[key] = query.pop(key)
    if username and "username" not in kwargs:
        kwargs["username"] = username
    if password and "password" not in kwargs:
        kwargs["password"] = password
    return kwargs


#: run(sql, params) -> list[tuple] — how reflection talks to the engine
RunSql = Callable[..., list]


def reflect_table_names(run: RunSql) -> list[str]:
    """Non-view relations from SHOW TABLES (managed + external)."""
    return sorted(
        name
        for name, ttype in run("SHOW TABLES")
        if ttype not in ("view", "materialized_view")
    )


def reflect_view_names(run: RunSql) -> list[str]:
    return sorted(
        name
        for name, ttype in run("SHOW TABLES")
        if ttype in ("view", "materialized_view")
    )


_IDENT_OK = re.compile(r"^\w+$")


def reflect_columns(run: RunSql, table_name: str) -> list[dict]:
    """DESCRIBE-based column reflection: name + spark type string (the
    dialect maps it to a SQLAlchemy type; nullability is not tracked by
    the catalog, so columns reflect as nullable — same default as the
    reference when information_schema says YES)."""
    if not _IDENT_OK.match(table_name):
        raise ValueError(f"bad table name {table_name!r}")
    return [
        {"name": row[0], "spark_type": row[1], "nullable": True, "default": None}
        for row in run(f"DESCRIBE {table_name}")
        if row[0] and not str(row[0]).startswith("#")
    ]


def _sa_type(spark_type: str):
    from sqlalchemy import types as sqltypes

    name = resolve_type_name(spark_type)
    if name is None:
        return sqltypes.NullType()
    return getattr(sqltypes, name)()


try:  # sqlalchemy is optional — everything above works without it
    from sqlalchemy.engine import default as _sa_default
except ImportError:  # pragma: no cover — exercised when SA is installed
    _sa_default = None


if _sa_default is not None:

    class BeaconSparkDialect(_sa_default.DefaultDialect):
        """``create_engine("beaconspark:///lake/root")`` — see module doc."""

        name = "beaconspark"
        driver = "client"

        paramstyle = "qmark"
        supports_statement_cache = True
        supports_native_boolean = True
        supports_sequences = False
        supports_sane_rowcount = False
        supports_sane_multi_rowcount = False
        supports_savepoints = False

        @classmethod
        def import_dbapi(cls):
            from beacon_spark import client

            return client

        @classmethod
        def dbapi(cls):  # SQLAlchemy < 2.0 spelling
            return cls.import_dbapi()

        def create_connect_args(self, url):
            return (
                [],
                connect_kwargs_from_url(
                    url.database, dict(url.query), url.username, url.password
                ),
            )

        def _run(self, connection) -> RunSql:
            def run(sql: str, params=()):
                return connection.exec_driver_sql(sql, tuple(params)).fetchall()

            return run

        def _get_default_schema_name(self, connection):
            return "beacon"

        def do_ping(self, dbapi_connection) -> bool:
            cur = dbapi_connection.cursor()
            try:
                cur.execute("SELECT 1")
                cur.fetchall()
            finally:
                cur.close()
            return True

        def get_schema_names(self, connection, **kw):
            return ["beacon"]

        def get_table_names(self, connection, schema=None, **kw):
            return reflect_table_names(self._run(connection))

        def get_view_names(self, connection, schema=None, **kw):
            return reflect_view_names(self._run(connection))

        def has_table(self, connection, table_name, schema=None, **kw):
            run = self._run(connection)
            return table_name in reflect_table_names(run) or (
                table_name in reflect_view_names(run)
            )

        def get_columns(self, connection, table_name, schema=None, **kw):
            return [
                {
                    "name": c["name"],
                    "type": _sa_type(c["spark_type"]),
                    "nullable": c["nullable"],
                    "default": c["default"],
                }
                for c in reflect_columns(self._run(connection), table_name)
            ]

        def get_pk_constraint(self, connection, table_name, schema=None, **kw):
            return {"constrained_columns": [], "name": None}

        def get_foreign_keys(self, connection, table_name, schema=None, **kw):
            return []

        def get_indexes(self, connection, table_name, schema=None, **kw):
            return []

    dialect = BeaconSparkDialect

    def register_dialect() -> None:
        """Make ``create_engine("beaconspark://...")`` resolvable without
        an entry-point install."""
        from sqlalchemy.dialects import registry

        registry.register(
            "beaconspark", "beacon_spark.sqlalchemy_dialect", "BeaconSparkDialect"
        )

else:  # pragma: no cover
    dialect = None

    def register_dialect() -> None:
        raise ImportError(
            "sqlalchemy is not installed; the PEP 249 client "
            "(beacon_spark.client) works without it"
        )
