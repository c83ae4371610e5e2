"""Flight SQL protocol subset (server/flightsql.py; reference
beacon-server/src/flight_sql/service.rs:157-476).

The protobuf codec is pinned against the protobuf SPEC (exact byte
strings for deterministic encodings), not just round-tripped against
itself — so a FlightSQL client that encodes the same messages
interoperates."""

import json

import pyarrow as pa
import pyarrow.flight as fl
import pytest

from beacon_spark.engine import Engine
from beacon_spark.server.flightsql import (
    TYPE_PREFIX,
    decode_any,
    decode_fields,
    encode_any,
    encode_string_msg,
)


def test_protobuf_wire_format_pins():
    """Deterministic encodings checked byte-for-byte against the
    protobuf spec: tag=(field<<3)|wiretype, varint length prefix."""
    # CommandStatementQuery{query: "SELECT 1"}: field 1, wire type 2
    assert encode_string_msg(1, "SELECT 1") == b"\x0a\x08SELECT 1"
    # Any{type_url: ..., value: ...}: fields 1 and 2, wire type 2
    any_bytes = encode_any("CommandGetCatalogs", b"")
    url = (TYPE_PREFIX + "CommandGetCatalogs").encode()
    assert any_bytes == b"\x0a" + bytes([len(url)]) + url + b"\x12\x00"
    kind, payload = decode_any(any_bytes)
    assert kind == "CommandGetCatalogs" and payload == b""
    # varints > 127 use the continuation bit
    big = encode_string_msg(1, "x" * 300)
    assert big[:3] == b"\x0a\xac\x02"  # 300 = 0xAC 0x02 little-endian base-128
    assert decode_fields(big)[1][0] == b"x" * 300
    # JSON (the legacy protocol) is NOT mistaken for FlightSQL
    assert decode_any(json.dumps({"sql": "SELECT 1"}).encode()) is None


@pytest.fixture()
def fsql_server(spark, tmp_path):
    from beacon_spark.server import BeaconFlightServer

    import os

    root = str(tmp_path / "root")
    os.makedirs(root)
    eng = Engine(spark, datasets_root=root)
    eng.sql("CREATE TABLE fsq AS SELECT id, id % 3 AS g FROM range(30)")
    server = BeaconFlightServer(eng, port=0)
    port = server.serve_background()
    client = fl.FlightClient(f"grpc://127.0.0.1:{port}")
    yield eng, client
    server.shutdown()


def _cmd_descriptor(kind: str, payload: bytes) -> fl.FlightDescriptor:
    return fl.FlightDescriptor.for_command(encode_any(kind, payload))


def test_statement_query_flow(fsql_server):
    """The standard ad-hoc flow: get_flight_info(CommandStatementQuery)
    → do_get(TicketStatementQuery)."""
    _eng, client = fsql_server
    desc = _cmd_descriptor(
        "CommandStatementQuery",
        encode_string_msg(1, "SELECT g, count(*) AS n FROM fsq GROUP BY g"),
    )
    info = client.get_flight_info(desc)
    assert {f.name for f in info.schema} == {"g", "n"}
    t = client.do_get(info.endpoints[0].ticket).read_all()
    assert t.num_rows == 3 and sum(t.column("n").to_pylist()) == 30


def test_metadata_commands(fsql_server):
    _eng, client = fsql_server
    # GetCatalogs
    info = client.get_flight_info(_cmd_descriptor("CommandGetCatalogs", b""))
    t = client.do_get(info.endpoints[0].ticket).read_all()
    assert t.column("catalog_name").to_pylist() == ["beacon"]
    # GetTables with a LIKE-style filter (field 3)
    info = client.get_flight_info(_cmd_descriptor(
        "CommandGetTables", encode_string_msg(3, "fs%")))
    t = client.do_get(info.endpoints[0].ticket).read_all()
    assert "fsq" in t.column("table_name").to_pylist()
    assert set(t.schema.names) == {
        "catalog_name", "db_schema_name", "table_name", "table_type"}
    # GetTableTypes
    info = client.get_flight_info(_cmd_descriptor("CommandGetTableTypes", b""))
    t = client.do_get(info.endpoints[0].ticket).read_all()
    assert t.column("table_type").to_pylist() == ["TABLE"]
    # GetSqlInfo: zero rows, spec schema
    info = client.get_flight_info(_cmd_descriptor("CommandGetSqlInfo", b""))
    t = client.do_get(info.endpoints[0].ticket).read_all()
    assert t.num_rows == 0 and t.schema.names == ["info_name", "value"]


def test_get_tables_include_schema(fsql_server):
    _eng, client = fsql_server
    payload = encode_string_msg(3, "fsq") + b"\x28\x01"  # field 5 bool true
    info = client.get_flight_info(_cmd_descriptor("CommandGetTables", payload))
    t = client.do_get(info.endpoints[0].ticket).read_all()
    blob = t.column("table_schema").to_pylist()[0]
    schema = pa.ipc.read_schema(pa.py_buffer(blob))
    assert set(schema.names) == {"id", "g"}


def test_prepared_statement_flow(fsql_server):
    _eng, client = fsql_server
    body = encode_any(
        "ActionCreatePreparedStatementRequest",
        encode_string_msg(1, "SELECT count(*) AS n FROM fsq WHERE g = 0"),
    )
    results = list(client.do_action(fl.Action("CreatePreparedStatement", body)))
    kind, payload = decode_any(results[0].body.to_pybytes())
    assert kind == "ActionCreatePreparedStatementResult"
    fields = decode_fields(payload)
    handle = bytes(fields[1][0])
    schema = pa.ipc.read_schema(pa.py_buffer(bytes(fields[2][0])))
    assert schema.names == ["n"]
    # execute the prepared statement
    desc = _cmd_descriptor(
        "CommandPreparedStatementQuery",
        b"\x0a" + bytes([len(handle)]) + handle,
    )
    info = client.get_flight_info(desc)
    t = client.do_get(info.endpoints[0].ticket).read_all()
    assert t.column("n").to_pylist() == [10]
    # close releases the handle
    close = encode_any(
        "ActionClosePreparedStatementRequest",
        b"\x0a" + bytes([len(handle)]) + handle,
    )
    list(client.do_action(fl.Action("ClosePreparedStatement", close)))
    with pytest.raises(Exception, match="unknown prepared statement"):
        client.get_flight_info(desc)


def test_statement_update_via_do_put(fsql_server):
    eng, client = fsql_server
    before = eng.sql("SELECT count(*) AS n FROM fsq").collect()[0].n
    desc = _cmd_descriptor(
        "CommandStatementUpdate",
        encode_string_msg(1, "INSERT INTO fsq SELECT 900 + id, 9 FROM range(4)"),
    )
    schema = pa.schema([])
    writer, reader = client.do_put(desc, schema)
    writer.done_writing()
    buf = reader.read()
    writer.close()
    # DoPutUpdateResult{record_count} comes back in the app metadata
    fields = decode_fields(buf.to_pybytes())
    assert fields[1][0] >= 1
    after = eng.sql("SELECT count(*) AS n FROM fsq").collect()[0].n
    assert after == before + 4


def test_ddl_rejected_on_info_path(fsql_server):
    _eng, client = fsql_server
    desc = _cmd_descriptor(
        "CommandStatementQuery",
        encode_string_msg(1, "DROP TABLE fsq"),
    )
    with pytest.raises(Exception, match="read-only"):
        client.get_flight_info(desc)


def test_prepared_statement_parameter_bind(fsql_server):
    """The ADBC/JDBC bind flow (reference service.rs:362-380): create a
    parameterized prepared statement, do_put a one-row batch binding
    $1..$n, then execute — the ticket keeps the handle so do_get sees
    the bound values."""
    _eng, client = fsql_server
    body = encode_any(
        "ActionCreatePreparedStatementRequest",
        encode_string_msg(
            1, "SELECT count(*) AS n FROM fsq WHERE g = $1 AND id < $2"),
    )
    results = list(client.do_action(fl.Action("CreatePreparedStatement", body)))
    fields = decode_fields(decode_any(results[0].body.to_pybytes())[1])
    handle = bytes(fields[1][0])
    # parameterized: no dataset schema before binding
    assert bytes(fields[2][0]) == b""
    desc = _cmd_descriptor(
        "CommandPreparedStatementQuery",
        b"\x0a" + bytes([len(handle)]) + handle,
    )
    # bind g=1, id<10 via a single-row batch
    batch = pa.record_batch([pa.array([1]), pa.array([10])],
                            names=["p1", "p2"])
    writer, meta_reader = client.do_put(desc, batch.schema)
    writer.write_batch(batch)
    writer.done_writing()
    buf = meta_reader.read()
    kind, payload = decode_any(buf.to_pybytes())
    assert kind == "DoPutPreparedStatementResult"
    assert bytes(decode_fields(payload)[1][0]) == handle
    writer.close()
    # execute: rows 1,4,7 are g=1 under id<10 → n=3... (ids 0..29, g=id%3)
    info = client.get_flight_info(desc)
    t = client.do_get(info.endpoints[0].ticket).read_all()
    assert t.column("n").to_pylist() == [
        sum(1 for i in range(30) if i % 3 == 1 and i < 10)
    ]
    # re-bind changes the answer (same handle, fresh values)
    batch = pa.record_batch([pa.array([0]), pa.array([30])],
                            names=["p1", "p2"])
    writer, meta_reader = client.do_put(desc, batch.schema)
    writer.write_batch(batch)
    writer.done_writing()
    meta_reader.read()
    writer.close()
    t = client.do_get(client.get_flight_info(desc).endpoints[0].ticket).read_all()
    assert t.column("n").to_pylist() == [10]
    # multi-row bind fails loudly
    bad = pa.record_batch([pa.array([1, 2]), pa.array([3, 4])],
                          names=["p1", "p2"])
    with pytest.raises(Exception, match="exactly one row"):
        writer, meta_reader = client.do_put(desc, bad.schema)
        writer.write_batch(bad)
        writer.done_writing()
        meta_reader.read()
        writer.close()


def test_prepared_handles_are_per_create(fsql_server):
    """Review fix: two clients preparing the SAME sql must get distinct
    handles — handles carry mutable bound-parameter state, so a
    deterministic sha256(sql) handle would cross-contaminate them."""
    _eng, client = fsql_server
    sql = "SELECT count(*) AS n FROM fsq WHERE g = $1 AND id < $2"
    handles = []
    for _ in range(2):
        body = encode_any(
            "ActionCreatePreparedStatementRequest", encode_string_msg(1, sql)
        )
        res = list(client.do_action(fl.Action("CreatePreparedStatement", body)))
        fields = decode_fields(decode_any(res[0].body.to_pybytes())[1])
        handles.append(bytes(fields[1][0]))
    h_a, h_b = handles
    assert h_a != h_b

    def bind(handle, g, lim):
        desc = _cmd_descriptor(
            "CommandPreparedStatementQuery",
            b"\x0a" + bytes([len(handle)]) + handle,
        )
        batch = pa.record_batch([pa.array([g]), pa.array([lim])],
                                names=["p1", "p2"])
        writer, meta_reader = client.do_put(desc, batch.schema)
        writer.write_batch(batch)
        writer.done_writing()
        meta_reader.read()
        writer.close()
        return desc

    desc_a = bind(h_a, 1, 10)
    bind(h_b, 0, 30)  # client B's binding must not clobber A's
    info = client.get_flight_info(desc_a)
    t = client.do_get(info.endpoints[0].ticket).read_all()
    assert t.column("n").to_pylist() == [
        sum(1 for i in range(30) if i % 3 == 1 and i < 10)
    ]


def test_key_and_type_info_commands(fsql_server):
    """The metadata commands DataGrip/ADBC issue on connect must answer
    with the FlightSql.proto spec schemas instead of erroring the whole
    session: key enumerations are empty (no constraints in the engine),
    GetXdbcTypeInfo describes the SQL type set (r6-verdict item 6)."""
    _eng, client = fsql_server
    from beacon_spark.server.flightsql import _field_varint

    # primary keys on any table: zero rows, six spec columns
    info = client.get_flight_info(
        _cmd_descriptor("CommandGetPrimaryKeys", b"\x1a\x03fsq"))
    t = client.do_get(info.endpoints[0].ticket).read_all()
    assert t.num_rows == 0
    assert t.schema.names == ["catalog_name", "db_schema_name",
                              "table_name", "column_name", "key_sequence",
                              "key_name"]
    assert info.schema == t.schema  # info advertises the same schema

    for kind in ("CommandGetImportedKeys", "CommandGetExportedKeys",
                 "CommandGetCrossReference"):
        info = client.get_flight_info(_cmd_descriptor(kind, b""))
        t = client.do_get(info.endpoints[0].ticket).read_all()
        assert t.num_rows == 0
        assert t.schema.names[:4] == ["pk_catalog_name", "pk_db_schema_name",
                                      "pk_table_name", "pk_column_name"]
        assert t.schema.field("update_rule").type == pa.uint8()

    # type info: the engine's SQL types with java.sql.Types codes
    info = client.get_flight_info(
        _cmd_descriptor("CommandGetXdbcTypeInfo", b""))
    t = client.do_get(info.endpoints[0].ticket).read_all()
    names = t.column("type_name").to_pylist()
    assert "VARCHAR" in names and "BIGINT" in names and "TIMESTAMP" in names
    codes = dict(zip(names, t.column("data_type").to_pylist()))
    assert codes["VARCHAR"] == 12 and codes["BIGINT"] == -5
    assert t.schema.field("create_params").type == pa.list_(
        pa.field("item", pa.utf8(), False))

    # optional data_type filter (proto field 1, varint int32)
    info = client.get_flight_info(_cmd_descriptor(
        "CommandGetXdbcTypeInfo", _field_varint(1, 12)))
    t = client.do_get(info.endpoints[0].ticket).read_all()
    assert t.column("type_name").to_pylist() == ["VARCHAR"]

    # negative code filter rides as 64-bit two's complement varint
    info = client.get_flight_info(_cmd_descriptor(
        "CommandGetXdbcTypeInfo", _field_varint(1, -5)))
    t = client.do_get(info.endpoints[0].ticket).read_all()
    assert t.column("type_name").to_pylist() == ["BIGINT"]
