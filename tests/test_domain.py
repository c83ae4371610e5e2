"""Domain functions: pressure→depth, map_units, vocabulary mappers
(reference: beacon-functions/src/blue_cloud/**, function-reference.md:330+)."""

import pytest
from pyspark.sql import functions as F

from beacon_spark.functions import domain


def test_pressure_to_depth(spark):
    df = spark.createDataFrame(
        [(0.0, 0.0), (1000.0, 30.0), (5000.0, 60.0)], "p double, lat double"
    )
    out = df.select(
        domain.pressure_to_depth_teos_10("p", "lat").alias("z")
    ).collect()
    assert out[0].z == 0.0
    # canonical check values for the UNESCO formula (Fofonoff & Millard):
    # 1000 dbar @30N ≈ 990.9 m ±0.5; 5000 dbar @60N ≈ 4895 m ±5
    assert abs(out[1].z - 990.9) < 1.0
    assert abs(out[2].z - 4895.0) < 6.0


def test_pressure_to_depth_sql_macro_parity(spark, sf_small):
    """Engine SQL macro expansion == Column builder, float-exact."""
    from beacon_spark.engine import Engine

    eng = Engine(spark, datasets_root=sf_small)
    sql = eng.sql(
        "SELECT pressure_to_depth_teos_10(1234.5, 45.0) AS z"
    ).collect()[0].z
    col = (
        spark.range(1)
        .select(domain.pressure_to_depth_teos_10(F.lit(1234.5), F.lit(45.0)).alias("z"))
        .collect()[0]
        .z
    )
    assert sql == col


def test_map_units(spark):
    df = spark.createDataFrame(
        [
            ("Celsius", "Kelvin", 20.0),
            ("decibar", "Pascal", 1.0),
            ("metre", "metre", 7.0),
            ("furlong", "metre", 1.0),
        ],
        "u string, t string, v double",
    )
    out = df.select(domain.map_units("u", "t", "v").alias("c")).collect()
    assert out[0].c == 293.15
    assert out[1].c == 1.0e4
    assert out[2].c == 7.0
    assert out[3].c is None


def test_map_units_sql(spark):
    from beacon_spark.functions.core import register_functions

    register_functions(spark)
    row = spark.sql(
        "SELECT map_units('Kelvin', 'Celsius', 300.0) AS c, "
        "map_units('x', 'y', 1.0) AS n"
    ).collect()[0]
    assert row.c == pytest.approx(26.85)
    assert row.n is None


def test_vocab_map(spark):
    # real public-table content: c17_l06.csv maps SDN:C17::33JY -> L06::0
    df = spark.createDataFrame(
        [("SDN:C17::33JY",), ("SDN:C17::067I",), ("ZZZZ",), (None,)], "code string"
    )
    out = df.select(domain.vocab_map("map_c17_l06", "code").alias("m")).collect()
    assert [r.m for r in out] == ["SDN:L06::0", "SDN:L06::31", None, None]
    # large table (13k codes) -> pandas-UDF path, same NULL-if-absent
    df2 = spark.createDataFrame([("33KU",), ("nope",)], "code string")
    out2 = df2.select(domain.vocab_map("map_c17", "code").alias("m")).collect()
    assert [r.m for r in out2] == ["SDN:C17::33KU", None]


def test_vocab_sql_and_dsl(spark):
    from beacon_spark.functions.core import register_functions

    register_functions(spark)
    assert (
        spark.sql("SELECT map_c17_l06('SDN:C17::33JY') AS m").collect()[0].m
        == "SDN:L06::0"
    )
    # DSL function select item resolves through the registry
    from beacon_spark import dsl
    from beacon_spark.engine import Engine

    eng = Engine(spark)
    spark.createDataFrame([("SDN:C17::067I",)], "code string").createOrReplaceTempView(
        "vocab_t"
    )
    out = dsl.compile_query(
        eng,
        {
            "select": [
                {"function": "map_c17_l06", "args": [{"column": "code"}], "alias": "m"}
            ],
            "from": "vocab_t",
        },
    ).collect()
    assert out[0].m == "SDN:L06::31"


def test_load_vocab_csv(spark, tmp_path):
    p = tmp_path / "v.csv"
    p.write_text("AAA,111\nBBB,222\n")
    domain.load_vocab_csv("map_custom", str(p))
    try:
        df = spark.createDataFrame([("AAA",), ("CCC",)], "code string")
        out = df.select(domain.vocab_map("map_custom", "code").alias("m")).collect()
        assert [r.m for r in out] == ["111", None]
    finally:
        del domain.VOCABULARIES["map_custom"]
