"""Property tests (hypothesis) for the supertype lattice (schema.py).

The r9 verdict reviewed the module clean by reading; these pin its
algebra mechanically. The lattice is PARTIAL (incompatible pairs raise
SupertypeError — the reference's loud-merge contract), so the laws are
stated over the defined region — plus the property that actually
protects multi-file reads: `super_schema`'s result (including WHETHER
it errors) must not depend on file-listing order. The raw
left-to-right fold violated that (`[boolean, binary, string]` errored
while `[binary, string, boolean]` reached string) — caught here, fixed
by the canonical per-column fold.
"""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from beacon_spark.schema import SupertypeError, super_schema, super_type

ATOMS = [
    T.BooleanType(), T.ByteType(), T.ShortType(), T.IntegerType(),
    T.LongType(), T.FloatType(), T.DoubleType(), T.StringType(),
    T.BinaryType(), T.DateType(), T.TimestampType(), T.TimestampNTZType(),
    T.DecimalType(10, 2), T.DecimalType(20, 0), T.DecimalType(38, 18),
    T.NullType(),
]

types_st = st.sampled_from(ATOMS)

_ERR = object()


def join(a, b):
    try:
        return super_type(a, b)
    except SupertypeError:
        return _ERR


@settings(max_examples=300, deadline=None)
@given(types_st, types_st)
def test_super_type_commutative(a, b):
    # same result, or undefined in BOTH directions
    assert join(a, b) == join(b, a)


@settings(max_examples=300, deadline=None)
@given(types_st, types_st, types_st)
def test_super_type_associative_where_defined(a, b, c):
    left = join(a, b)
    right = join(b, c)
    if left is _ERR or right is _ERR:
        return  # partial lattice: associativity is stated over the
        # defined region; order-independence of the SET fold is
        # guaranteed separately by super_schema's canonical ordering
    lhs = join(left, c)
    rhs = join(a, right)
    if lhs is not _ERR and rhs is not _ERR:
        assert lhs == rhs


@settings(max_examples=100, deadline=None)
@given(types_st)
def test_super_type_idempotent(a):
    assert super_type(a, a) == a


@settings(max_examples=300, deadline=None)
@given(types_st, types_st)
def test_super_type_absorbs_both(a, b):
    """The join dominates both inputs: joining either input back in
    changes nothing (a ⊔ b is an upper bound of a and b)."""
    j = join(a, b)
    if j is _ERR:
        return
    assert super_type(j, a) == j
    assert super_type(j, b) == j


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.lists(
            st.tuples(st.sampled_from(list("abcdef")), types_st),
            min_size=1, max_size=5, unique_by=lambda t: t[0],
        ),
        min_size=1, max_size=5,
    ),
    st.randoms(),
)
def test_super_schema_order_independent(schemas_spec, rnd):
    """Multi-file harmonization must not depend on listing order: the
    same schema SET shuffled gives the same (name → type) mapping — or
    errors in every order, never only in some."""
    schemas = [
        T.StructType([T.StructField(n, t, True) for n, t in spec])
        for spec in schemas_spec
    ]

    def result(ss):
        try:
            return {f.name: f.dataType for f in super_schema(ss).fields}
        except SupertypeError:
            return _ERR

    base = result(schemas)
    shuffled = list(schemas)
    rnd.shuffle(shuffled)
    assert result(shuffled) == base


def test_listing_order_regression():
    """The concrete triple the property test first falsified: a raw
    fold errored on [bool, binary, string] but returned string for
    [binary, string, bool]."""
    bool_s = T.StructType([T.StructField("x", T.BooleanType(), True)])
    bin_s = T.StructType([T.StructField("x", T.BinaryType(), True)])
    str_s = T.StructType([T.StructField("x", T.StringType(), True)])

    def run(ss):
        try:
            return super_schema(ss).fields[0].dataType
        except SupertypeError:
            return _ERR

    results = {
        str(run(order))
        for order in (
            [bool_s, bin_s, str_s], [bin_s, str_s, bool_s],
            [str_s, bool_s, bin_s], [bin_s, bool_s, str_s],
        )
    }
    assert len(results) == 1, results


def test_incompatible_pair_still_loud():
    """The canonical fold must not silently paper over a genuinely
    incompatible pair."""
    a = T.StructType([T.StructField("x", T.BooleanType(), True)])
    b = T.StructType([T.StructField("x", T.BinaryType(), True)])
    with pytest.raises(SupertypeError):
        super_schema([a, b])
