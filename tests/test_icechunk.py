"""Icechunk repository layer (sources/icechunklite.py; reference
beacon-icechunk/src/repository.rs). The array-decode gate is part of
the contract: it must fire AFTER detection + version resolution with a
message naming the FlatBuffers schema gap."""

import json

import pyarrow as pa
import pytest

from beacon_spark.sources import icechunklite as ic


def _mk_repo(root, commits=("snapA", "snapB"), tags=None):
    """Convention-following fixture: refs/branch.main/<counter>.json +
    zstd snapshot objects."""
    (root / "refs").mkdir(parents=True)
    bdir = root / "refs" / "branch.main"
    bdir.mkdir()
    for seq, snap in enumerate(commits):
        stem = ic.encode_ref_counter(seq)
        (bdir / f"{stem}.json").write_text(json.dumps({"snapshot": snap}))
    (root / "snapshots").mkdir()
    for snap in commits:
        payload = pa.Codec("zstd").compress(
            b"\x0c\x00\x00\x00flatbuffers-opaque-" + snap.encode()
        )
        (root / "snapshots" / snap).write_bytes(bytes(payload))
    for tag, snap in (tags or {}).items():
        tdir = root / "refs" / f"tag.{tag}"
        tdir.mkdir()
        (tdir / "ref.json").write_text(json.dumps({"snapshot": snap}))
    return str(root)


def test_ref_counter_orders_latest_first():
    stems = [ic.encode_ref_counter(i) for i in range(5)]
    # a LATER commit's ref file sorts lexicographically FIRST
    assert sorted(stems) == list(reversed(stems))
    for i, s in enumerate(stems):
        assert ic.decode_ref_counter(s) == i
    assert ic.encode_ref_counter(0) == "Z" * 8


def test_detection_vs_plain_zarr(tmp_path):
    repo = tmp_path / "repo"
    _mk_repo(repo)
    assert ic.is_icechunk_repository(str(repo))
    zarr = tmp_path / "store.zarr"
    zarr.mkdir()
    (zarr / "zarr.json").write_text("{}")
    assert not ic.is_icechunk_repository(str(zarr))
    plain = tmp_path / "plain"
    plain.mkdir()
    assert not ic.is_icechunk_repository(str(plain))


def test_branch_tag_snapshot_resolution(tmp_path):
    repo = _mk_repo(tmp_path / "r", commits=("s1", "s2", "s3"),
                    tags={"v1": "s1"})
    # branch tip = the LATEST commit
    assert ic.branch_tip(repo, "main") == "s3"
    assert ic.resolve_version(repo, ic.IcechunkVersion()) == "s3"
    assert ic.resolve_version(repo, ic.IcechunkVersion(tag="v1")) == "s1"
    assert ic.resolve_version(repo, ic.IcechunkVersion(snapshot="s2")) == "s2"
    assert ic.list_branches(repo) == ["main"]
    assert ic.list_tags(repo) == ["v1"]
    with pytest.raises(ic.IcechunkError, match="no branch 'dev'"):
        ic.branch_tip(repo, "dev")
    with pytest.raises(ic.IcechunkError, match="no tag 'v9'"):
        ic.tag_snapshot(repo, "v9")


def test_version_selectors_are_exclusive():
    with pytest.raises(ic.IcechunkError, match="at most one"):
        ic.IcechunkVersion(branch="dev", snapshot="abc")
    v = ic.IcechunkVersion()
    assert (v.kind, v.value) == ("branch", "main")


def test_snapshot_payload_zstd_roundtrip(tmp_path):
    repo = _mk_repo(tmp_path / "r", commits=("sX",))
    payload = ic.read_snapshot_payload(repo, "sX")
    assert payload.endswith(b"flatbuffers-opaque-sX")


def test_open_gates_at_flatbuffers_after_resolution(tmp_path):
    repo = _mk_repo(tmp_path / "r", commits=("s1", "s2"))
    with pytest.raises(NotImplementedError) as e:
        ic.open_icechunk(repo)
    msg = str(e.value)
    # the gate names what it resolved AND what is missing
    assert "'s2'" in msg and "FlatBuffers" in msg and "read_zarr" in msg
    # plain zarr store: redirected, not gated (repository.rs:369-374)
    zarr = tmp_path / "store.zarr"
    zarr.mkdir()
    (zarr / "zarr.json").write_text("{}")
    with pytest.raises(ic.IcechunkError, match="read_zarr"):
        ic.open_icechunk(str(zarr))


def test_engine_read_icechunk_routes(spark, tmp_path):
    from beacon_spark.engine import Engine

    repo = _mk_repo(tmp_path / "repo", commits=("sA",))
    eng = Engine(spark, datasets_root=str(tmp_path))
    with pytest.raises(NotImplementedError, match="FlatBuffers"):
        eng.resolve_from({"icechunk": {"paths": ["repo"]}})
