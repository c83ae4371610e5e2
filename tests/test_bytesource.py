"""Byte-source abstraction: bytes-like equivalence, scheme registry,
range-read accounting (the object_store contract: a region read fetches
only its byte ranges), and file:// URI end-to-end parity."""

import os

import numpy as np
import pytest

from beacon_spark.sources import bytesource as bs

REF = "/root/reference"
GRIDDED = (
    f"{REF}/beacon-db/beacon-file-formats/beacon-arrow-netcdf/test_files/"
    "gridded-example.nc"
)


class RecordingSource(bs.ByteSource):
    """Wraps a local file; logs every (offset, length) range request —
    the stand-in for an object store that bills per GET."""

    def __init__(self, path: str):
        self._inner = bs.FileByteSource(path)
        self.reads: list[tuple[int, int]] = []

    def size(self) -> int:
        return self._inner.size()

    def read_range(self, offset: int, length: int) -> bytes:
        self.reads.append((offset, length))
        return self._inner.read_range(offset, length)

    def bytes_read(self) -> int:
        return sum(n for _, n in self.reads)


class RecordingFS:
    """scheme://…  filesystem over the local disk that accounts every
    byte fetched (register_scheme test hook)."""

    def __init__(self, scheme: str, authority: str):
        self.scheme = scheme
        self.sources: list[RecordingSource] = []
        self.listings = 0

    def _p(self, uri: str) -> str:
        return uri.split("://", 1)[1]

    def open_buffer(self, uri: str):
        src = RecordingSource(self._p(uri))
        self.sources.append(src)
        return bs.LazyBuf(src)

    def read_bytes(self, uri: str) -> bytes:
        src = RecordingSource(self._p(uri))
        self.sources.append(src)
        return src.read_range(0, src.size())

    def open_text(self, uri: str, **kw):
        import io

        return io.TextIOWrapper(io.BytesIO(self.read_bytes(uri)),
                                encoding=kw.get("encoding", "utf-8"),
                                errors=kw.get("errors"))

    def exists(self, uri: str) -> bool:
        return os.path.exists(self._p(uri))

    def isdir(self, uri: str) -> bool:
        return os.path.isdir(self._p(uri))

    def isfile(self, uri: str) -> bool:
        return os.path.isfile(self._p(uri))

    def listdir(self, uri: str) -> list[str]:
        self.listings += 1
        return sorted(os.listdir(self._p(uri)))

    def walk(self, uri: str):
        yield from os.walk(self._p(uri))

    def glob(self, pattern: str):
        import glob as g

        return sorted(pattern.split("://")[0] + "://" + p
                      for p in g.glob(self._p(pattern), recursive=True))

    def bytes_read(self) -> int:
        return sum(s.bytes_read() for s in self.sources)


@pytest.fixture
def recfs():
    holder = {}

    def factory(scheme, authority):
        fs = RecordingFS(scheme, authority)
        holder["fs"] = fs
        return fs

    bs.register_scheme("mock", factory)
    yield holder
    bs.register_scheme("mock", factory)  # reset cache for next test


# ------------------------------------------------------- LazyBuf basics


def test_lazybuf_matches_bytes(tmp_path):
    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, size=300_000, dtype=np.uint8).tobytes()
    p = str(tmp_path / "blob.bin")
    with open(p, "wb") as f:
        f.write(data)
    buf = bs.LazyBuf(bs.FileByteSource(p))
    assert len(buf) == len(data)
    for a, b in [(0, 10), (65_530, 65_550), (0, 300_000), (299_990, 300_010),
                 (131_072, 131_072), (5, 5)]:
        assert buf[a:b] == data[a:b]
    assert buf[0] == data[0] and buf[-1] == data[-1] and buf[70_000] == data[70_000]
    assert buf[:8] == data[:8]
    assert bs.unpack_from("<Q", buf, 1000) == np.frombuffer(data, "<u8", 1, 1000).tolist() == [
        int(np.frombuffer(data, "<u8", 1, 1000)[0])
    ] or bs.unpack_from("<Q", buf, 1000)[0] == int(np.frombuffer(data, "<u8", 1, 1000)[0])
    got = bs.frombuffer(buf, "<u4", 10, 2048)
    np.testing.assert_array_equal(got, np.frombuffer(data, "<u4", 10, 2048))


def test_lazybuf_block_cache_one_fetch_per_block(tmp_path):
    p = str(tmp_path / "b.bin")
    with open(p, "wb") as f:
        f.write(bytes(200_000))
    src = RecordingSource(p)
    buf = bs.LazyBuf(src)
    for off in range(0, 1000, 8):  # 125 tiny reads, same block
        buf[off: off + 8]
    assert len(src.reads) == 1  # one 64 KiB block GET served them all
    buf.read_range(0, 150_000)  # large read bypasses the cache
    assert src.reads[-1] == (0, 150_000)


# --------------------------------------------- range-read accounting


def test_hdf5_region_read_fetches_only_ranges(recfs):
    """A chunked-dataset region read over the mock object store must
    fetch header blocks + intersecting chunk ranges, not the file."""
    if not os.path.exists(GRIDDED):
        pytest.skip("reference fixtures not available")
    from beacon_spark.sources.hdf5lite import Hdf5Reader

    r = Hdf5Reader("mock://" + GRIDDED)
    ds = r.root.datasets["analysed_sst"]
    region = [(0, 1), (100, 164), (200, 264)]
    sub = r.read_region(ds, region)
    assert sub.shape == (1, 64, 64)
    fs = recfs["fs"]
    fsize = os.path.getsize(GRIDDED)
    # the file is a 2x2 chunk grid (chunk (1, 604, 960), deflate) — the
    # region intersects exactly ONE chunk, so a correct ranged read is
    # ~1 compressed chunk (~25% of file) + header blocks, never the
    # whole file / all four chunks
    assert fs.bytes_read() < fsize * 0.5, (
        f"read {fs.bytes_read()} of {fsize} bytes for a 64x64 region"
    )
    # values match the local read
    r2 = Hdf5Reader(GRIDDED)
    np.testing.assert_array_equal(sub, r2.read_region(ds, region))


def test_netcdf3_slice_fetches_only_ranges(recfs, tmp_path):
    from beacon_spark.sources.netcdf3 import read_netcdf3, write_netcdf3

    p = str(tmp_path / "grid.nc")
    temp = np.arange(2000 * 40, dtype=np.float64).reshape(2000, 40)
    write_netcdf3(
        p,
        dims={"time": 2000, "lat": 40},
        variables={"temperature": (("time", "lat"), temp)},
    )
    _, variables, _, _ = read_netcdf3("mock://" + p)
    arr = variables["temperature"][1]
    sub = np.asarray(arr[100:110, :])
    np.testing.assert_array_equal(sub, temp[100:110, :])
    fs = recfs["fs"]
    fsize = os.path.getsize(p)
    # header blocks + the 10-row window, nowhere near the 640 KB body
    assert fs.bytes_read() < fsize * 0.25


def test_zarr_chunk_read_fetches_only_chunks(recfs, tmp_path):
    from beacon_spark.sources.zarrlite import read_zarr_store, write_zarr_store

    p = str(tmp_path / "s.zarr")
    data = np.arange(100 * 100, dtype=np.float32).reshape(100, 100)
    write_zarr_store(p, {"v": (("y", "x"), data)}, codec=None,
                     chunk_shapes={"v": (25, 25)})
    _, variables, _, _ = read_zarr_store("mock://" + p)
    arr = variables["v"][1]
    sub = np.asarray(arr[0:25, 0:25])  # exactly one chunk
    np.testing.assert_array_equal(sub, data[0:25, 0:25])
    fs = recfs["fs"]
    one_chunk = 25 * 25 * 4
    # metadata JSONs + one chunk (chunk may be compressed, so <=)
    assert fs.bytes_read() <= one_chunk + 4096


# --------------------------------------------------- file:// parity


def test_read_nd_through_file_uri(spark, tmp_path):
    from beacon_spark.sources.nd import read_nd
    from beacon_spark.sources.netcdf3 import write_netcdf3

    p = str(tmp_path / "t.nc")
    write_netcdf3(
        p,
        dims={"obs": 50},
        variables={"v": (("obs",), np.arange(50.0))},
    )
    local = read_nd(spark, "netcdf", p).orderBy("v").collect()
    via_uri = read_nd(spark, "netcdf", "file://" + p).orderBy("v").collect()
    assert [r.v for r in local] == [r.v for r in via_uri] == list(map(float, range(50)))


def test_glob_through_file_uri(tmp_path):
    from beacon_spark.sources.paths import resolve_globs

    for i in range(3):
        (tmp_path / f"f{i}.nc").write_bytes(b"x")
    got = resolve_globs("file://" + str(tmp_path) + "/*.nc")
    assert len(got) == 3 and all(g.startswith("file://") for g in got)


def test_lazybuf_negative_step_slices(tmp_path):
    """r10 sweep: a negative-step slice computed a negative covering
    length and silently returned b'' — now it matches bytes slicing."""
    data = bytes(range(256)) * 4
    p = str(tmp_path / "neg.bin")
    with open(p, "wb") as f:
        f.write(data)
    buf = bs.LazyBuf(bs.FileByteSource(p))
    for sl in [slice(20, 5, -2), slice(None, None, -1), slice(100, None, -3),
               slice(5, 20, 2), slice(None, None, 4), slice(3, 3, -1)]:
        assert buf[sl] == data[sl], sl


def test_remote_glob_matches_local_glob_semantics(tmp_path):
    """r10 sweep: the object-store glob used fnmatch, whose '*' crosses
    '/', so 'data/*.parquet' matched data/sub/x.parquet remotely but not
    locally — a silently different input set. Differential pin: the
    remote matcher must agree with glob.glob on a real tree."""
    import glob as stdglob
    import os

    from beacon_spark.sources.bytesource import _glob_regex

    files = [
        "data/a.parquet", "data/b.csv", "data/sub/c.parquet",
        "data/sub/deep/d.parquet", "logs/e.parquet", "data/ab.parquet",
    ]
    for f in files:
        p = tmp_path / f
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(b"x")
    patterns = [
        "data/*.parquet", "data/**/*.parquet", "**/*.parquet",
        "data/?.parquet", "data/[ab].parquet", "*/*.parquet",
        "data/sub/*.parquet", "data/[!a].parquet",
    ]
    root = str(tmp_path)
    for pat in patterns:
        local = {
            os.path.relpath(m, root)
            for m in stdglob.glob(os.path.join(root, pat), recursive=True)
            if os.path.isfile(m)
        }
        rx = _glob_regex(pat)
        remote = {f for f in files if rx.match(f)}
        assert remote == local, (pat, remote, local)


def test_glob_regex_hypothesis_differential(tmp_path):
    """r11: property form of the glob differential — random trees and
    random patterns; _glob_regex must agree with CPython's glob.glob
    (recursive=True) on every (tree, pattern) pair. Catches any drift
    in the segment/**/class translation that hand-picked examples
    miss."""
    import glob as stdglob
    import os

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from beacon_spark.sources.bytesource import _glob_regex

    name = st.text(alphabet=list("abc1"), min_size=1, max_size=3)
    relpath = st.lists(name, min_size=1, max_size=3).map("/".join)
    seg = st.sampled_from(["*", "**", "?", "a", "b", "c1", "[ab]",
                           "[!a]", "a*", "*1"])
    pattern = st.lists(seg, min_size=1, max_size=3).map("/".join)

    trees = st.lists(relpath, min_size=1, max_size=6, unique=True)

    case_n = [0]

    @settings(max_examples=120, deadline=None)
    @given(files=trees, pat=pattern)
    def check(files, pat):
        case_n[0] += 1
        root = tmp_path / f"case{case_n[0]}"
        # files whose path is a PREFIX dir of another can't coexist on
        # a filesystem; drop conflicters deterministically
        keep = []
        for f in sorted(files):
            if not any(k == f or k.startswith(f + "/") or
                       f.startswith(k + "/") for k in keep):
                keep.append(f)
        for f in keep:
            p = root / f
            p.parent.mkdir(parents=True, exist_ok=True)
            p.write_bytes(b"x")
        want = {
            os.path.relpath(m, root)
            for m in stdglob.glob(os.path.join(str(root), pat),
                                  recursive=True)
            if os.path.isfile(m)
        }
        rx = _glob_regex(pat)
        got = {f for f in keep if rx.match(f)}
        assert got == want, (pat, sorted(keep), got, want)

    check()


def test_arrowfs_touch_restamps_after_native_rename(tmp_path):
    """r14 (ADVICE medium): _ArrowFS.move tries NATIVE fs.move first,
    which on local-backed Arrow filesystems is a rename that PRESERVES
    the staging-write mtime — touch must re-stamp, or VACUUM's
    landing-time guards key off a stale time and can reclaim an
    in-flight writer's freshly landed file."""
    import os
    import time as _time

    from pyarrow import fs as pafs

    from beacon_spark.sources import bytesource as bs

    root = tmp_path / "store"
    root.mkdir()

    class SubTreeFS(bs._ArrowFS):
        def __init__(self, scheme, authority):
            self.scheme, self.authority = scheme, authority
            self.fs = pafs.SubTreeFileSystem(str(root), pafs.LocalFileSystem())
            self._root = ""

    bs.register_scheme("touchfs", SubTreeFS)
    try:
        bs.write_bytes("touchfs://b/staging.bin", b"payload")
        old = _time.time() - 3600.0
        os.utime(root / "staging.bin", (old, old))
        bs.move("touchfs://b/staging.bin", "touchfs://b/landed.bin")
        # native rename preserved the hour-old stamp
        assert _time.time() - bs.mtime("touchfs://b/landed.bin") > 3000
        bs.touch("touchfs://b/landed.bin")
        assert _time.time() - bs.mtime("touchfs://b/landed.bin") < 60
    finally:
        bs.register_scheme("touchfs", SubTreeFS)  # drop cache entry


def test_container_touch_restamps_after_rename(tmp_path):
    """r14 (ADVICE medium): the bdb container's rename is a key UPDATE
    that keeps the original write stamp — touch must re-stamp it."""
    import time as _time

    from beacon_spark.sources import bytesource as bs
    from beacon_spark.sources.container import _container

    db = str(tmp_path / "lake.db")
    uri = f"bdb://{db}"
    bs.write_bytes(f"{uri}/a/staging.bin", b"payload")
    cont = _container(db)
    with cont._lock:
        conn = cont._conn()
        with conn:
            conn.execute("UPDATE objects SET mtime = ? WHERE key = ?",
                         (_time.time() - 3600.0, "a/staging.bin"))
    cont._invalidate("a/staging.bin")
    bs.move(f"{uri}/a/staging.bin", f"{uri}/a/landed.bin")
    assert _time.time() - bs.mtime(f"{uri}/a/landed.bin") > 3000
    bs.touch(f"{uri}/a/landed.bin")
    assert _time.time() - bs.mtime(f"{uri}/a/landed.bin") < 60
