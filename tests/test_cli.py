"""Terminal client (beacon_spark/cli.py) against a live HTTP server.

Parity target: ``beacon-clients/beacon-datalake-cli`` — one-shot
subcommands, exports, the zstd-compressed Arrow IPC decode path, and
the interactive shell's statement loop.
"""

import io
import json

import pytest

from beacon_spark.cli import (BeaconCliClient, CliError, main, render_table,
                              repl)
from beacon_spark.engine import Engine
from beacon_spark.server.http import BeaconHttpServer


@pytest.fixture(scope="module")
def served(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("cli-lake")
    eng = Engine(spark, datasets_root=str(root))
    eng.sql("CREATE TABLE clit AS SELECT id, id % 3 AS g FROM range(30)")
    srv = BeaconHttpServer(eng, port=0)
    port = srv.serve_background()
    yield eng, f"http://127.0.0.1:{port}", root
    srv.shutdown()


def test_query_roundtrip_zstd_ipc(served):
    _eng, url, _root = served
    c = BeaconCliClient(url)
    t = c.query_arrow("SELECT count(*) AS n FROM clit")
    assert t.column("n").to_pylist() == [30]
    # the wire really is IPC with zstd body compression: 200 KB of
    # repeated text must arrive far smaller than its logical size
    raw = c._request(
        "/api/query",
        {"sql": "SELECT repeat('x', 10000) AS s FROM range(20)"},
    )
    assert len(raw) < 50_000
    import pyarrow as pa

    t2 = pa.ipc.open_stream(io.BytesIO(raw)).read_all()
    assert t2.num_rows == 20 and len(t2.column("s")[0].as_py()) == 10000


def test_one_shot_commands(served, capsys, tmp_path):
    _eng, url, _root = served
    assert main(["--url", url, "query", "SELECT count(*) AS n FROM clit",
                 "--format", "json"]) == 0
    assert json.loads(capsys.readouterr().out) == [{"n": 30}]

    assert main(["--url", url, "tables"]) == 0
    assert "clit" in capsys.readouterr().out

    assert main(["--url", url, "schema", "clit"]) == 0
    schema = json.loads(capsys.readouterr().out)
    assert "fields" in schema or "id" in json.dumps(schema)

    out = tmp_path / "e.parquet"
    assert main(["--url", url, "export",
                 "SELECT * FROM clit WHERE g = 0", str(out)]) == 0
    import pyarrow.parquet as pq

    assert pq.read_table(out).num_rows == 10

    assert main(["--url", url, "info"]) == 0
    assert "version" in capsys.readouterr().out.lower()


def test_query_error_is_clean(served, capsys):
    _eng, url, _root = served
    rc = main(["--url", url, "query", "SELECT * FROM nope_no_table"])
    assert rc == 1
    assert "error" in capsys.readouterr().err.lower()


def test_render_table_shapes():
    import pyarrow as pa

    t = pa.table({"a": [1, 2], "long_column": ["x" * 60, None]})
    s = render_table(t, max_width=10)
    assert "long_column" in s and "(2 rows)" in s
    assert "x" * 11 not in s  # clipped to max_width
    empty = pa.table({"a": pa.array([], pa.int64())})
    assert "(0 rows)" in render_table(empty)


def test_repl_loop(served, monkeypatch, capsys):
    _eng, url, _root = served
    lines = iter([
        ".help",
        ".tables",
        "SELECT count(*) AS n",   # multi-line statement
        "FROM clit;",
        ".format json",
        "SELECT 1 AS one;",
        ".quit",
    ])
    monkeypatch.setattr("builtins.input", lambda *_a: next(lines))
    repl(BeaconCliClient(url))
    out = capsys.readouterr().out
    assert "connected to" in out and "as super-user" in out
    assert "clit" in out          # .tables
    assert "| 30" in out or " 30 " in out  # table-rendered count
    assert '"one": 1' in out      # json mode


def test_access_level_reporting(served):
    _eng, url, _root = served
    # open server, no credentials: the embedded identity is super-user
    assert BeaconCliClient(url).access_level() == "super-user"


def test_connect_refused_is_clean():
    c = BeaconCliClient("http://127.0.0.1:9")  # discard port: refused
    with pytest.raises(CliError, match="could not connect"):
        c.tables()


def test_failed_export_never_clobbers_destination(served, tmp_path):
    """A failed export must not truncate an existing good file at the
    destination (the old open('wb')-first order did) nor leave a
    fragment behind."""
    import os

    _eng, url, _root = served
    dest = tmp_path / "out.parquet"
    dest.write_bytes(b"precious previous export")
    c = BeaconCliClient(url)
    with pytest.raises(CliError):
        c.export("SELECT * FROM no_such_table_xyz", str(dest))
    assert dest.read_bytes() == b"precious previous export"
    leftovers = [f for f in os.listdir(tmp_path) if "__export_" in f]
    assert leftovers == []
    # and a good export still lands
    n = c.export("SELECT * FROM clit", str(dest))
    assert n > 0 and dest.stat().st_size == n
