"""Pure-Python blosc frame codec + blosc/zstd zarr stores.

Pin the on-disk frame layout (header fields, offsets, raw-stream
fallback, byte-shuffle, multi-block) and the zarr read path for the
numcodecs-default compressor."""

import struct

import numpy as np
import pytest

from beacon_spark.sources.blosclite import (
    _shuffle,
    _unshuffle,
    blosc_decode,
    blosc_encode,
)
from beacon_spark.sources.zarrlite import read_zarr_store, write_zarr_store


@pytest.mark.parametrize("cname", ["lz4", "zstd", "zlib", "snappy"])
def test_frame_roundtrip_codecs(cname):
    data = np.arange(5000, dtype="<f8").tobytes()
    frame = blosc_encode(data, typesize=8, cname=cname)
    assert blosc_decode(frame) == data


def test_frame_header_fields():
    data = b"abcd" * 100
    frame = blosc_encode(data, typesize=4, cname="lz4")
    assert frame[0] == 2  # format version
    assert (frame[2] >> 5) == 1  # lz4 codec id
    assert frame[2] & 0x1  # shuffle flag
    assert frame[3] == 4  # typesize
    nbytes, blocksize, cbytes = struct.unpack_from("<III", frame, 4)
    assert nbytes == 400 and cbytes == len(frame)


def test_multiblock_frame():
    rng = np.random.RandomState(0)
    data = rng.randint(0, 50, size=100_000, dtype="<i4").tobytes()  # 400 KB
    frame = blosc_encode(data, typesize=4, cname="lz4", blocksize=1 << 16)
    nblocks = -(-len(data) // (1 << 16))
    assert nblocks > 1
    assert blosc_decode(frame) == data


def test_incompressible_stream_stored_raw():
    rng = np.random.RandomState(1)
    data = rng.bytes(4096)  # random = incompressible
    frame = blosc_encode(data, typesize=1, cname="lz4", shuffle=False)
    assert blosc_decode(frame) == data
    # stream length equals uncompressed size -> stored raw per format
    (cb,) = struct.unpack_from("<i", frame, 20)
    assert cb == 4096


def test_shuffle_inverse():
    data = np.arange(999, dtype="<i8").tobytes() + b"xyz"  # leftover bytes
    assert _unshuffle(_shuffle(data, 8), 8) == data


def test_split_streams_decode():
    """A frame whose block holds typesize sub-streams (c-blosc split mode)
    must decode via the nsplits=typesize trial."""
    data = np.arange(256, dtype="<i4").tobytes()  # 1024 bytes, typesize 4
    import pyarrow as pa

    shuffled = _shuffle(data, 4)
    streams = []
    neblock = len(data) // 4
    for s in range(4):
        part = shuffled[s * neblock: (s + 1) * neblock]
        comp = pa.Codec("lz4_raw").compress(part).to_pybytes()
        st = part if len(comp) >= len(part) else comp
        streams.append(struct.pack("<i", len(st)) + st)
    body = b"".join(streams)
    header = bytearray(16)
    header[0], header[1], header[2], header[3] = 2, 1, (1 << 5) | 0x1, 4
    struct.pack_into("<III", header, 4, len(data), len(data), 16 + 4 + len(body))
    frame = bytes(header) + struct.pack("<I", 20) + body
    assert blosc_decode(frame) == data


def test_memcpy_flag():
    data = b"tiny"
    header = bytearray(16)
    header[0], header[1], header[2], header[3] = 2, 1, 0x2, 1
    struct.pack_into("<III", header, 4, 4, 4, 20)
    assert blosc_decode(bytes(header) + data) == data


def test_blosclz_roundtrip():
    """Full-frame roundtrip through the pure-Python blosclz codec."""
    rng = np.random.default_rng(7)
    for data in (
        b"",
        b"x",
        b"hello world hello world hello world " * 40,  # near matches
        bytes(rng.integers(0, 4, 10_000, dtype=np.uint8)),  # long matches
        b"a" * 5000,  # RLE (distance-1 overlap)
        np.arange(3000, dtype="<i4").tobytes(),
    ):
        frame = blosc_encode(data, typesize=4, cname="blosclz")
        assert blosc_decode(frame) == data


def test_blosclz_wire_grammar():
    """Hand-crafted opcode streams pin the decode grammar itself (not
    just self-roundtrip): literal runs, near match with distance+1 and
    len+3 bias, saturated-length extension, distance-1 RLE."""
    from beacon_spark.sources.blosclite import _blosclz_decompress

    # "abc" literal, then match len 3 dist 3 -> "abcabc"
    s = bytes([2]) + b"abc" + bytes([(1 << 5) | 0, 2])
    assert _blosclz_decompress(s, 6) == b"abcabc"
    # RLE: "z" then match len 5 dist 1 -> "zzzzzz"
    s = bytes([0]) + b"z" + bytes([(3 << 5) | 0, 0])
    assert _blosclz_decompress(s, 6) == b"zzzzzz"
    # saturated 3-bit length + extension: len field 7, ext 0 -> L=9
    s = bytes([0]) + b"q" + bytes([(7 << 5) | 0, 0, 0])
    assert _blosclz_decompress(s, 10) == b"q" * 10
    # 255-chained extension: L = 9 + 255 + 1 = 265
    s = bytes([0]) + b"w" + bytes([(7 << 5) | 0, 255, 1, 0])
    assert _blosclz_decompress(s, 266) == b"w" * 266
    # truncated stream fails loudly
    with pytest.raises(ValueError, match="blosclz"):
        _blosclz_decompress(bytes([5]) + b"ab", 6)


def test_bitshuffle_planes():
    """Bit-plane layout pinned by hand: planes ordered (byte, bit
    LSB-first), element 8m+t at bit t of plane byte m."""
    from beacon_spark.sources.blosclite import (
        _bitshuffle_block,
        _bitunshuffle_block,
    )

    # typesize=1, 8 elements: only element 0 has bit 0 set
    out = _bitshuffle_block(bytes([1, 0, 0, 0, 0, 0, 0, 0]), 1)
    assert out == bytes([1] + [0] * 7)  # plane 0 byte 0 = 0b00000001
    # element 3 has bit 6 set -> plane 6, bit 3
    out = _bitshuffle_block(bytes([0, 0, 0, 0x40, 0, 0, 0, 0]), 1)
    assert out[6] == 1 << 3 and sum(out) == 1 << 3
    # typesize=2: byte-1 planes come after all byte-0 planes
    elems = np.zeros(8, dtype="<u2")
    elems[2] = 1 << 8  # byte 1, bit 0 of element 2
    out = _bitshuffle_block(elems.tobytes(), 2)
    assert out[8] == 1 << 2 and sum(out) == 1 << 2
    # leftover elements (not multiple of 8) are verbatim
    data = bytes(range(20))
    out = _bitshuffle_block(data, 2)  # 10 elements -> 8 shuffled + 2 raw
    assert out[16:] == data[16:]
    assert _bitunshuffle_block(out, 2) == data


@pytest.mark.parametrize("cname", ["lz4", "blosclz", "zstd"])
def test_bitshuffle_frame_roundtrip(cname):
    data = np.arange(4096, dtype="<f4").tobytes()
    frame = blosc_encode(data, typesize=4, cname=cname, shuffle="bit")
    assert frame[2] & 0x4  # bit-shuffle flag set
    assert blosc_decode(frame) == data


@pytest.mark.parametrize("version,codec", [(2, "blosc"), (3, "blosc"), (3, "zstd"), (2, "zstd")])
def test_zarr_store_roundtrip(tmp_path, version, codec):
    temp = np.arange(48, dtype=np.float64).reshape(6, 8)
    depth = np.arange(6, dtype=np.int32) * 10
    root = str(tmp_path / f"s{version}{codec}.zarr")
    write_zarr_store(
        root,
        {"temp": (("depth", "x"), temp), "depth": (("depth",), depth)},
        var_attrs={"temp": {"units": "C"}},
        global_attrs={"source": "fixture"},
        version=version,
        codec=codec,
        chunk_shapes={"temp": (2, 8)},
    )
    dims, variables, var_attrs, gattrs = read_zarr_store(root)
    assert dims == {"depth": 6, "x": 8}
    np.testing.assert_array_equal(variables["temp"][1], temp)
    np.testing.assert_array_equal(variables["depth"][1], depth)
    assert var_attrs["temp"]["units"] == "C"
    assert gattrs["source"] == "fixture"


def test_zarr_blosc_sql_e2e(spark, tmp_path):
    """read_zarr over a blosc store through Engine.sql."""
    from beacon_spark.engine import Engine

    root = str(tmp_path / "obs.zarr")
    write_zarr_store(
        root,
        {
            "sst": (("t",), np.array([10.5, 11.0, 12.25, 9.75])),
            "t": (("t",), np.arange(4, dtype=np.int64)),
        },
        codec="blosc",
        version=2,
    )
    eng = Engine(spark, datasets_root=str(tmp_path))
    rows = eng.sql(
        "SELECT t, sst FROM read_zarr('obs.zarr') WHERE sst > 10 ORDER BY t"
    ).collect()
    assert [(r.t, r.sst) for r in rows] == [(0, 10.5), (1, 11.0), (2, 12.25)]


# -------------------------------------------- r11 decoder-review findings


def test_malformed_frames_raise_valueerror():
    """r11 review: garbage inside a frame must fail as ValueError from
    every path — IndexError/struct.error escaping the split-trial loop
    crashed the decode instead of failing the trial."""
    import struct as _struct

    # blocksize 0 with nonzero nbytes: used to ZeroDivisionError
    hdr = bytearray(16)
    hdr[0], hdr[1], hdr[2], hdr[3] = 2, 1, 0, 1
    _struct.pack_into("<III", hdr, 4, 100, 0, 16)
    with pytest.raises(ValueError):
        blosc_decode(bytes(hdr))

    # memcpy frame shorter than its claimed nbytes
    hdr2 = bytearray(16)
    hdr2[0], hdr2[1], hdr2[2], hdr2[3] = 2, 1, 0x2, 1
    _struct.pack_into("<III", hdr2, 4, 1000, 1000, 16)
    with pytest.raises(ValueError):
        blosc_decode(bytes(hdr2) + b"xy")

    # block offsets pointing at garbage: ValueError, never IndexError
    good = blosc_encode(bytes(range(256)) * 64, typesize=4, cname="blosclz")
    bad = bytearray(good)
    _struct.pack_into("<I", bad, 16, len(good) - 2)  # offset near EOF
    with pytest.raises(ValueError):
        blosc_decode(bytes(bad))


def test_blosclz_forward_reference_is_valueerror():
    """A match reference past the produced output must raise ValueError
    (it used to IndexError out of the overlap loop)."""
    from beacon_spark.sources.blosclite import _blosclz_decompress

    # literal run of 1 ('A'), then match ctrl with huge distance
    stream = bytes([0, ord("A"), (1 << 5) | 31, 255])
    with pytest.raises(ValueError):
        _blosclz_decompress(stream, 64)


def test_encode_wide_typesize_does_not_wrap():
    """typesize 256 stored as `& 0xFF` wrote 0 into the header and
    produced undecodable shuffle frames; wide elements now store with
    typesize 1 / no shuffle."""
    data = bytes(range(256)) * 8
    frame = blosc_encode(data, typesize=256, cname="zlib", shuffle=True)
    assert frame[3] == 1  # header typesize
    assert blosc_decode(frame) == data
