"""Property-based round-trips (hypothesis) for the pure-Python codecs —
the from-spec binary parsers are the riskiest code in the repo, so fuzz
their encode/decode pairs instead of trusting hand-picked fixtures."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=0, max_size=4096))
def test_lzw_roundtrip(data):
    from beacon_spark.sources.tifflite import _lzw_decode, _lzw_encode

    assert _lzw_decode(_lzw_encode(data)) == data


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=0, max_size=512).filter(lambda b: len(b) % 4 == 0))
def test_z85_roundtrip(data):
    from beacon_spark.sources.delta_dv import z85_decode, z85_encode

    assert z85_decode(z85_encode(data)) == data


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=(1 << 40) - 1),
        min_size=0,
        max_size=300,
    )
)
def test_roaring_roundtrip(indexes):
    from beacon_spark.sources.delta_dv import (
        roaring_bitmap_array_decode,
        roaring_bitmap_array_encode,
    )

    assert roaring_bitmap_array_decode(
        roaring_bitmap_array_encode(indexes)
    ) == sorted(set(indexes))


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.sampled_from([1, 3, 4]),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_png_roundtrip(h, w, nch, seed):
    from beacon_spark.pipeline.pnglite import decode_png, encode_png

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, nch), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1.0, max_value=1.0, allow_nan=False),
        min_size=1,
        max_size=500,
    ),
    st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip(samples, rate):
    from beacon_spark.pipeline.multimodal import decode_wav, encode_wav

    arr = np.array(samples)
    out, r = decode_wav(encode_wav(arr, rate))
    assert r == rate and out.shape == (len(samples), 1)
    # 16-bit quantization: truncation (1 LSB) + the 32767/32768
    # encode/decode scale mismatch -> up to ~2 LSB of error
    assert np.allclose(out[:, 0], arr, atol=2.5 / 32767)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
            st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_wkt_wkb_roundtrip_multipoint(points):
    from beacon_spark.functions.geo import wkb_to_wkt
    from beacon_spark.functions.st import parse_wkt, wkt_to_wkb

    wkt = "MULTIPOINT (" + ", ".join(f"({x} {y})" for x, y in points) + ")"
    rt = wkb_to_wkt(wkt_to_wkb(wkt))
    assert np.allclose(
        parse_wkt(rt).all_coords(), parse_wkt(wkt).all_coords()
    )


@given(st.binary(min_size=0, max_size=8192))
def test_blosclz_roundtrip_fuzz(data):
    from beacon_spark.sources.blosclite import (
        _blosclz_compress,
        _blosclz_decompress,
    )

    assert _blosclz_decompress(_blosclz_compress(data), len(data)) == data


@given(
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=0, max_value=257),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_bitshuffle_roundtrip_fuzz(typesize, nbytes_extra, seed):
    import numpy as np

    from beacon_spark.sources.blosclite import (
        _bitshuffle_block,
        _bitunshuffle_block,
    )

    rng = np.random.default_rng(seed)
    data = bytes(rng.integers(0, 256, typesize * 8 + nbytes_extra, dtype=np.uint8))
    assert _bitunshuffle_block(_bitshuffle_block(data, typesize), typesize) == data


@given(
    st.integers(min_value=1, max_value=5),
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_gif_roundtrip_fuzz(n_frames, h, w, n_colors, seed):
    import numpy as np

    from beacon_spark.pipeline.giflite import decode_gif, encode_gif, scan_gif_meta

    rng = np.random.default_rng(seed)
    palette = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    frames = [palette[rng.integers(0, n_colors, (h, w))] for _ in range(n_frames)]
    delays = [int(d) * 10 for d in rng.integers(0, 300, n_frames)]
    payload = encode_gif(frames, delays)
    out = decode_gif(payload)
    assert [d for d, _ in out] == delays
    for (_, got), want in zip(out, frames):
        np.testing.assert_array_equal(got, want)
    n, dur = scan_gif_meta(payload)
    assert n == n_frames and dur == sum(delays)


@settings(max_examples=60, deadline=None)
@given(content=st.text(
    alphabet=st.sampled_from(list("ab'\\-/*; \nINSERT?`\"x0")), max_size=24))
def test_sql_lexer_matches_spark_string_parsing(spark, content):
    """The shared SQL lexer (guard._lex) backs the read-only gate, the
    auth reference checks, and every dialect rewrite — a desync from
    Spark's REAL string parsing was the round-8 write-smuggle bypass.
    Property: for arbitrary content, a Spark-escaped literal embedding
    it (a) evaluates back to the content and (b) is seen by our lexer
    as exactly one literal span ending where Spark ends it (the 'END'
    sentinel stays code and write keywords inside the literal stay
    hidden)."""
    from beacon_spark.server.guard import is_readonly_sql, scrub_sql

    lit = "'" + content.replace("\\", "\\\\").replace("'", "\\'") + "'"
    stmt = f"SELECT {lit} AS v, 'END' AS e"
    row = spark.sql(stmt).collect()[0]
    assert row.v == content and row.e == "END"  # escaping ground truth
    scrubbed = scrub_sql(stmt)
    # the sentinel column survives as CODE — the lexer closed the first
    # literal exactly where Spark did
    assert scrubbed.endswith(" AS v, '' AS e")
    assert scrubbed.startswith("SELECT '")
    # write keywords inside the literal never reach the keyword scan
    assert is_readonly_sql(stmt)


@settings(max_examples=40, deadline=None)
@given(content=st.text(
    alphabet=st.sampled_from(list("ab' -;\nDROPx")), max_size=16))
def test_sql_lexer_doubled_quote_escape(spark, content):
    """Same property for the SQL '' doubling escape (backslash-free
    content, where both escapes are valid Spark spellings)."""
    from beacon_spark.server.guard import scrub_sql

    assume_ok = "\\" not in content
    if not assume_ok:
        return
    lit = "'" + content.replace("'", "''") + "'"
    stmt = f"SELECT {lit} AS v, 'END' AS e"
    row = spark.sql(stmt).collect()[0]
    assert row.v == content and row.e == "END"
    assert scrub_sql(stmt).endswith(" AS v, '' AS e")
