"""Pure-Python HDF5/NetCDF4 reader against REAL libhdf5-written files
(the reference's own test fixtures — superblock v0 + v2, dense
links/attributes, chunked + shuffle + deflate, DIMENSION_LIST dims,
compound datasets, CF ragged profiles). Skipped when the reference
checkout is absent."""

import os

import numpy as np
import pytest

REF = "/root/reference"
GRIDDED = f"{REF}/beacon-db/beacon-file-formats/beacon-arrow-netcdf/test_files/gridded-example.nc"
ARGO = f"{REF}/test-datasets/test_file.nc"
WOD = f"{REF}/beacon-db/beacon-file-formats/beacon-arrow-netcdf/test_files/wod_ctd_1964.nc"
NESTED = f"{REF}/beacon-db/beacon-file-formats/beacon-arrow-hdf5/test_files/nested-groups.h5"
COMPOUND = f"{REF}/beacon-db/beacon-file-formats/beacon-arrow-hdf5/test_files/compound.h5"

pytestmark = pytest.mark.skipif(
    not os.path.exists(GRIDDED), reason="reference fixtures not available"
)


def test_gridded_netcdf4_values():
    """Superblock v0, dense attrs, chunked+deflate, dim scales."""
    from beacon_spark.sources.hdf5lite import Hdf5Reader

    r = Hdf5Reader(GRIDDED)
    lat = r.read(r.root.datasets["lat"])
    lon = r.read(r.root.datasets["lon"])
    sst = r.read(r.root.datasets["analysed_sst"])
    assert lat.shape == (1208,) and lat.dtype == np.float32
    assert 38.7 < lat[0] < 38.8 and 48.8 < lat[-1] < 48.9  # Black Sea
    assert lon.shape == (1920,)
    assert sst.shape == (1, 1208, 1920) and sst.dtype == np.int16
    assert sst.min() == -32768  # fill
    assert r.root.attrs["id"].startswith("OISST")
    a = r.root.datasets["analysed_sst"].attrs
    assert float(a["scale_factor"]) == pytest.approx(0.01)
    assert int(a["_FillValue"]) == -32768


def test_argo_netcdf4_v2_superblock():
    """Superblock v2, dense root links, shuffle+deflate chunks, char
    matrices joined into strings."""
    from beacon_spark.sources.hdf5lite import Hdf5Reader

    r = Hdf5Reader(ARGO)
    lat = r.read(r.root.datasets["LATITUDE"])
    assert lat.shape == (8,) and 50 < lat.mean() < 70  # Nordic floats
    temp = r.read(r.root.datasets["TEMP"])
    assert temp.shape == (8, 6)
    assert r.root.attrs["pi_name"] == "Tanguy Szekely"


def test_grid_assembly_and_cf_decode():
    from beacon_spark.sources.hdf5lite import read_hdf5_grid
    from beacon_spark.sources.nd import GridDataset

    ds = GridDataset(*read_hdf5_grid(GRIDDED))
    assert ds.grid() == ("time", "lat", "lon")
    assert ds.row_count() == 1208 * 1920
    # region slice: one corner; CF decode applies scale/offset + fill→NULL
    t = ds.flatten(region=[(0, 1), (0, 2), (0, 3)], attribute_columns=False)
    assert t.num_rows == 6
    sst = t.column("analysed_sst").to_pylist()
    assert all(v is None for v in sst)  # corner is land/fill
    assert str(t.schema.field("time").type).startswith("timestamp")
    # mid-sea box has real temperatures in Kelvin
    mid = ds.flatten(region=[(0, 1), (600, 602), (960, 962)], attribute_columns=False)
    vals = [v for v in mid.column("analysed_sst").to_pylist() if v is not None]
    assert vals and all(270 < v < 310 for v in vals)


def test_argo_string_join():
    from beacon_spark.sources.hdf5lite import read_hdf5_grid

    dims, variables, va, ga = read_hdf5_grid(ARGO)
    d, arr = variables["PLATFORM_NUMBER"]
    assert d == ("N_PROF",)
    vals = np.asarray(arr)
    assert vals.shape == (8,)
    assert all(isinstance(v, str) and v.strip() for v in vals)


def test_wod_ragged_profiles():
    """Real-world CF contiguous ragged file: sample_dimension detected,
    per-profile values gather onto observations."""
    from beacon_spark.sources.hdf5lite import read_hdf5_grid
    from beacon_spark.sources.nd import GridDataset

    ds = GridDataset(*read_hdf5_grid(WOD))
    spec = ds.ragged_spec()
    assert spec is not None
    sample_dim, inst_dim, counts = spec
    assert inst_dim == "casts" and counts.sum() == ds.dims[sample_dim]
    t = ds.flatten(attribute_columns=False, columns=["lat", "Salinity"])
    assert t.num_rows == ds.dims[sample_dim]
    lats = t.column("lat").to_pylist()
    # bounds per the file's own geospatial_lat_min/max attrs
    assert len(set(lats)) > 1 and all(-30.1 < v < 72.3 for v in lats)


def test_nested_groups_and_compound():
    from beacon_spark.sources.hdf5lite import read_hdf5_grid

    dims, variables, va, ga = read_hdf5_grid(NESTED)
    assert "observations/temperature" in variables
    assert ga["title"] if "title" in ga else True
    dims2, vars2, _, _ = read_hdf5_grid(COMPOUND)
    st = np.asarray(vars2["measurements.station"][1])
    note = np.asarray(vars2["measurements.note"][1])
    assert st.dtype.kind == "i" and len(st) == 4
    assert all(isinstance(v, str) for v in note)


def test_read_netcdf_sql_over_hdf5(spark, tmp_path):
    """read_netcdf through Engine.sql on a real NetCDF4 file — pushdown
    on the lat coordinate prunes the region."""
    import shutil

    from beacon_spark.engine import Engine

    shutil.copy(GRIDDED, tmp_path / "grid4.nc")
    eng = Engine(spark, datasets_root=str(tmp_path))
    rows = eng.sql(
        "SELECT lat, lon, analysed_sst FROM read_netcdf('grid4.nc') "
        "WHERE lat >= 43.0 AND lat <= 43.02 AND lon >= 34.0 AND lon <= 34.05 "
        "AND analysed_sst IS NOT NULL ORDER BY lat, lon"
    ).collect()
    assert rows, "mid-sea box must have values"
    for r in rows:
        assert 43.0 <= r.lat <= 43.02 and 34.0 <= r.lon <= 34.05
        assert 270 < r.analysed_sst < 310


def test_region_read_matches_full():
    """read_region decodes only intersecting chunks but must equal the
    full read's slice — validated on real libhdf5 chunked+filtered data."""
    from beacon_spark.sources.hdf5lite import Hdf5Reader

    r = Hdf5Reader(GRIDDED)
    for name, ds in _walk_datasets(r):
        if ds.dtype.cls == 9 or not ds.shape:
            continue
        full = r.read(ds)
        # interior region on every dim (exercises chunk clipping)
        region = [(s // 4, max(s // 4 + 1, 3 * s // 4)) for s in ds.shape]
        got = r.read_region(ds, region)
        want = full[tuple(slice(lo, hi) for lo, hi in region)]
        assert np.array_equal(got, want), name


def _walk_datasets(r):
    out = []

    def rec(g, prefix=""):
        out.extend((prefix + n, d) for n, d in g.datasets.items())
        for sub in g.groups.values():
            rec(sub, f"{prefix}{sub.name}/")

    rec(r.root)
    return out


def test_lazy_getitem_pushes_region(monkeypatch):
    """A basic slice on the lazy handle must go through read_region (no
    whole-variable materialization)."""
    from beacon_spark.sources import hdf5lite
    from beacon_spark.sources.hdf5lite import read_hdf5_grid

    calls = {"region": 0, "full": 0}
    orig_region = hdf5lite.Hdf5Reader.read_region
    orig_read = hdf5lite.Hdf5Reader.read

    def spy_region(self, ds, region):
        calls["region"] += 1
        return orig_region(self, ds, region)

    def spy_read(self, ds):
        calls["full"] += 1
        return orig_read(self, ds)

    monkeypatch.setattr(hdf5lite.Hdf5Reader, "read_region", spy_region)
    monkeypatch.setattr(hdf5lite.Hdf5Reader, "read", spy_read)

    _dims, variables, _va, _ga = read_hdf5_grid(GRIDDED)
    # find a 2-D+ numeric variable and slice it
    for name, (dims, arr) in variables.items():
        if isinstance(arr, hdf5lite._H5Lazy) and arr.ndim >= 2:
            _ = arr[0:2]
            break
    assert calls["region"] >= 1 and calls["full"] == 0


# -------------------------------------------- r11 decoder-review findings


def test_null_dataspace_attribute_is_harmless():
    """r11 review H15: a v2 NULL dataspace (h5py.Empty attribute) has
    ZERO elements; treating it as a scalar read one element from an
    empty buffer — and since Hdf5Error subclasses ValueError, the
    resulting plain ValueError escaped the skip-exotic-attrs guard and
    crashed the whole file read."""
    from beacon_spark.sources.hdf5lite import parse_dataspace

    # v2 dataspace: version=2, rank=0, flags=0, type=2 (NULL)
    assert parse_dataspace(bytes([2, 0, 0, 2])) == (0,)
    # scalar (type 0) still a scalar
    assert parse_dataspace(bytes([2, 0, 0, 0])) == ()


def test_fletcher32_matches_h5_reference_impl():
    """r11 review H38: the fletcher32 filter trailer is now VERIFIED.
    Pin the vectorized implementation against a direct per-word
    transliteration of H5_checksum_fletcher32 (H5checksum.c)."""
    import random

    from beacon_spark.sources.hdf5lite import _fletcher32

    def h5_ref(data: bytes) -> int:
        s1 = s2 = 0
        i, ln = 0, len(data) // 2
        while ln:
            t = min(ln, 360)
            ln -= t
            for _ in range(t):
                s1 += (data[i] << 8) | data[i + 1]
                i += 2
                s2 += s1
            s1 = (s1 & 0xFFFF) + (s1 >> 16)
            s2 = (s2 & 0xFFFF) + (s2 >> 16)
        if len(data) % 2:
            s1 += data[-1] << 8
            s2 += s1
            s1 = (s1 & 0xFFFF) + (s1 >> 16)
            s2 = (s2 & 0xFFFF) + (s2 >> 16)
        s1 = (s1 & 0xFFFF) + (s1 >> 16)
        s2 = (s2 & 0xFFFF) + (s2 >> 16)
        return (s2 << 16) | s1

    rng = random.Random(11)
    cases = [b"", b"\x00", b"ab", b"\xff" * 1025, bytes(range(256)) * 9]
    cases += [bytes(rng.randrange(256) for _ in range(n))
              for n in (3, 360 * 2, 360 * 2 + 1, 5000)]
    for c in cases:
        assert _fletcher32(c) == h5_ref(c), len(c)


def test_fletcher32_filter_verifies_and_rejects():
    from beacon_spark.sources.hdf5lite import (
        Filter,
        Hdf5Error,
        _fletcher32,
        apply_filters,
    )

    payload = bytes(range(256)) * 4 + b"x"  # odd length
    framed = payload + _fletcher32(payload).to_bytes(4, "little")
    flt = [Filter(3, ())]
    assert apply_filters(framed, flt, 0, 1) == payload
    bad = bytearray(framed)
    bad[7] ^= 0x40
    with pytest.raises(Hdf5Error, match="fletcher32 mismatch"):
        apply_filters(bytes(bad), flt, 0, 1)
    # a masked-out filter entry still skips (mask bit set = filter
    # skipped for this chunk, per spec)
    assert apply_filters(bytes(bad), flt, 0b1, 1) == bytes(bad)
