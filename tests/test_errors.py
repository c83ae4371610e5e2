"""Error semantics at the engine boundary — the embedded analog of the
reference's HTTP-level test_errors.py (integration-tests/test_errors.py):
malformed queries, unknown tables/columns, type mismatches, empty globs
and unknown output formats all fail loudly with typed Python errors
(Beacon returns 400s for the same inputs)."""

import pytest
from pyspark.errors.exceptions.captured import AnalysisException

from beacon_spark.engine import Engine


@pytest.fixture()
def eng(spark, sf_dir):
    return Engine(spark, datasets_root=sf_dir)


def test_malformed_dsl_query(eng):
    with pytest.raises((ValueError, KeyError, TypeError)):
        eng.query({"select": [{"bogus_shape": 1}],
                   "from": {"parquet": {"paths": ["region.parquet"]}}})


def test_unknown_table(eng):
    with pytest.raises(AnalysisException):
        eng.sql("SELECT * FROM definitely_not_a_table").collect()


def test_unknown_column(eng):
    with pytest.raises(AnalysisException):
        eng.sql(
            "SELECT no_such_column FROM read_parquet('region.parquet')"
        ).collect()


def test_dsl_unknown_column(eng):
    with pytest.raises(Exception):
        eng.query({
            "select": ["no_such_column"],
            "from": {"parquet": {"paths": ["region.parquet"]}},
        }).collect()


def test_empty_glob(eng):
    with pytest.raises(FileNotFoundError):
        eng.sql("SELECT * FROM read_parquet('nope_*.parquet')")


def test_unknown_output_format(eng, tmp_path):
    with pytest.raises((ValueError, KeyError)):
        eng.query(
            {"select": ["r_name"],
             "from": {"parquet": {"paths": ["region.parquet"]}},
             "output": {"format": "sandstone"}},
            output_path=str(tmp_path / "out"),
        )


def test_empty_query_body(eng):
    with pytest.raises((ValueError, KeyError, TypeError)):
        eng.query({})


def test_unknown_dsl_filter_op(eng):
    with pytest.raises((ValueError, KeyError, TypeError)):
        eng.query({
            "select": ["r_name"],
            "filter": {"column": "r_name", "definitely_not_an_op": 3},
            "from": {"parquet": {"paths": ["region.parquet"]}},
        })


def test_unknown_read_format_dsl(eng):
    with pytest.raises(ValueError):
        eng.query({"select": ["x"], "from": {"carbonite": {"paths": ["f"]}}})
