"""Local mirror of the driver's correctness gate (CORRECTNESS_r{N}.json):
run every ``queries()`` entry at sf0.01 and compare against its
``oracle_sql()`` via DuckDB — row count, column names, and an
order-insensitive value comparison with columns sorted by name.

A pass here is the strongest local predictor of the graded t2 metric.
"""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def _canon(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, int):
        return int(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(_canon(x) for x in v)
    return v


def _normalize(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    names = [columns[i] for i in order]
    data = sorted(
        (tuple(_canon(r[i]) for i in order) for r in rows), key=repr
    )
    return names, data


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in entry_mod.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, sf_dir, duck):
    sdf = QUERIES[name](spark, sf_dir)
    s_rows = [tuple(r) for r in sdf.collect()]
    s_cols = sdf.columns

    res = duck.execute(ORACLES[name])
    d_cols = [c[0] for c in res.description]
    d_rows = [tuple(r) for r in res.fetchall()]

    s_names, s_data = _normalize(s_cols, s_rows)
    d_names, d_data = _normalize(d_cols, d_rows)

    assert s_names == d_names, f"{name}: column names differ: {s_names} vs {d_names}"
    assert len(s_data) == len(d_data), (
        f"{name}: row count {len(s_data)} vs oracle {len(d_data)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_data, d_data)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches: {mismatches[:3]}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
