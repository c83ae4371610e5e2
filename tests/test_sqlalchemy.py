"""SQLAlchemy dialect over the PEP 249 client (sqlalchemy_dialect.py;
reference: beacon-db-py/python/beacondb/sqlalchemy.py:1-204).

sqlalchemy is optional in this environment, so the reflection and
connect-args logic is exercised directly (plain functions over the
DB-API), and the create_engine round-trip runs only where the package
exists."""

import warnings

import pytest

from beacon_spark.sqlalchemy_dialect import (
    connect_kwargs_from_url,
    reflect_columns,
    reflect_table_names,
    reflect_view_names,
    resolve_type_name,
)


def test_resolve_type_name():
    assert resolve_type_name("bigint") == "BIGINT"
    assert resolve_type_name("decimal(5,2)") == "NUMERIC"
    assert resolve_type_name("timestamp_ntz") == "TIMESTAMP"
    assert resolve_type_name("string") == "VARCHAR"
    assert resolve_type_name("DOUBLE") == "FLOAT"
    assert resolve_type_name("array<int>") is None  # nested → NullType


def test_connect_kwargs_from_url():
    kw = connect_kwargs_from_url("", {}, None, None)
    assert kw == {"database": ":memory:"}
    kw = connect_kwargs_from_url(
        "/lake", {"auth": "true", "read_only": "1", "datasets": "/d"},
        "u", "p",
    )
    assert kw == {
        "database": "/lake", "auth": True, "read_only": True,
        "datasets": "/d", "username": "u", "password": "p",
    }
    # query params win over userinfo, like the reference dialect
    kw = connect_kwargs_from_url("/lake", {"username": "q"}, "u", None)
    assert kw["username"] == "q"


@pytest.fixture()
def dbapi_conn(spark, tmp_path):
    import os

    from beacon_spark import client

    root = str(tmp_path / "salake")
    os.makedirs(root)
    conn = client.connect(root, spark=spark)
    conn.execute(
        "CREATE TABLE saobs AS SELECT id, CAST(id AS DOUBLE) AS v, "
        "CAST('x' AS STRING) AS s, CAST(1.5 AS DECIMAL(5,2)) AS d "
        "FROM range(10)"
    )
    conn.execute("CREATE VIEW sav AS SELECT id FROM saobs WHERE id > 5")
    yield conn
    conn.close()


def _run(conn):
    return lambda sql, params=(): conn.execute(sql, params or None).fetchall()


def test_reflection_over_dbapi(dbapi_conn):
    run = _run(dbapi_conn)
    assert reflect_table_names(run) == ["saobs"]
    assert reflect_view_names(run) == ["sav"]
    cols = reflect_columns(run, "saobs")
    assert [c["name"] for c in cols] == ["id", "v", "s", "d"]
    assert [resolve_type_name(c["spark_type"]) for c in cols] == [
        "BIGINT", "FLOAT", "VARCHAR", "NUMERIC",
    ]
    with pytest.raises(ValueError):
        reflect_columns(run, "x; DROP TABLE saobs")


def test_pandas_read_sql_over_dbapi(dbapi_conn):
    """pandas users connect through the DB-API directly (and through the
    dialect where sqlalchemy is installed)."""
    import pandas as pd

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # pandas warns on non-SA DBAPI
        out = pd.read_sql("SELECT id, v FROM saobs ORDER BY id LIMIT 3",
                          dbapi_conn)
    assert list(out["id"]) == [0, 1, 2]
    assert list(out["v"]) == [0.0, 1.0, 2.0]


def test_create_engine_roundtrip(spark, tmp_path):
    """Full SQLAlchemy round-trip — runs only where sqlalchemy exists."""
    sa = pytest.importorskip("sqlalchemy")
    import os

    from beacon_spark.sqlalchemy_dialect import register_dialect

    register_dialect()
    root = str(tmp_path / "salake2")
    os.makedirs(root)
    # the dialect's dbapi connect needs the shared SparkSession: the
    # client reuses the active session via get_spark()
    engine = sa.create_engine(f"beaconspark:///{root.lstrip('/')}")
    with engine.connect() as c:
        c.exec_driver_sql("CREATE TABLE t AS SELECT id FROM range(3)")
        rows = c.exec_driver_sql("SELECT count(*) FROM t").fetchall()
        assert rows[0][0] == 3
    insp = sa.inspect(engine)
    assert "t" in insp.get_table_names()
    cols = insp.get_columns("t")
    assert cols[0]["name"] == "id"

    import pandas as pd

    out = pd.read_sql("SELECT id FROM t ORDER BY id", engine)
    assert list(out["id"]) == [0, 1, 2]
