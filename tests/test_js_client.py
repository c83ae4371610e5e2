"""The dependency-free JS client (clients/js) against a LIVE server.

The reference ships a TypeScript SDK (beacon-clients/beacon-ts); this
repo's counterpart is JSDoc-typed ESM JavaScript (no package registry
offline, so no TS compiler and no apache-arrow — the Arrow IPC decoder
is from-spec, clients/js/src/arrow.mjs). This bridge spawns the real
HTTP server and runs the node test suite end-to-end: SQL + DSL queries
through the built-in Arrow decode, CSV, streaming, metadata routes,
error taxonomy, admin check.
"""

import os
import shutil
import subprocess

import pytest

JS_DIR = os.path.join(os.path.dirname(__file__), "..", "clients", "js")

pytestmark = pytest.mark.skipif(
    shutil.which("node") is None, reason="node not installed"
)


@pytest.fixture(scope="module")
def live_server(spark, tmp_path_factory):
    from beacon_spark import Engine
    from beacon_spark.server.http import BeaconHttpServer

    root = str(tmp_path_factory.mktemp("jsroot"))
    # a real table for the parquet-shaped tests
    shutil.copy("/root/testdata/sf0.001/lineitem.parquet",
                os.path.join(root, "lineitem.parquet"))
    eng = Engine(spark, datasets_root=root)
    hs = BeaconHttpServer(eng, port=0, token="tok")
    port = hs.serve_background()
    yield f"http://127.0.0.1:{port}"
    hs.shutdown()


def test_node_unit_suite():
    """The client's own unit tests (CSV, builder DSL shape, from-spec
    Arrow decode against pyarrow-written fixtures)."""
    proc = subprocess.run(
        ["node", "--test", "test/"],
        cwd=JS_DIR, capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr


def test_node_integration_suite(live_server):
    """Every integration test (skipped in the unit run) against the
    live server — including the Arrow stream decode, which exercises
    the x-beacon-ipc-compression negotiation end-to-end."""
    env = dict(
        os.environ,
        BEACON_URL=live_server,
        BEACON_TOKEN="tok",
        BEACON_PARQUET="lineitem.parquet",
    )
    proc = subprocess.run(
        ["node", "--test", "test/integration.test.mjs"],
        cwd=JS_DIR, env=env, capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "# skipped 0" in proc.stdout, proc.stdout


def test_node_webadmin_spa_suite(live_server):
    """r11 verdict #4: the /admin SPA (clients/js/web) against the live
    server — login via /api/admin/check, workbench run (Arrow decode),
    explain, tables page with schemas, auth + server pages — driven
    under node with a strict DOM stub (throws on non-Node children,
    like the real DOM)."""
    import json
    import urllib.request

    # a fixture table for the tables page
    req = urllib.request.Request(
        f"{live_server}/api/query",
        data=json.dumps({"sql": "CREATE TABLE IF NOT EXISTS jsweb_t AS "
                                "SELECT id, id * 2 AS v FROM range(9)",
                         "format": "json"}).encode(),
        headers={"Authorization": "Bearer tok",
                 "Content-Type": "application/json"}, method="POST")
    urllib.request.urlopen(req).read()

    env = dict(os.environ, BEACON_URL=live_server, BEACON_TOKEN="tok",
               BEACON_TABLE="jsweb_t")
    proc = subprocess.run(
        ["node", "--test", "test/webadmin.test.mjs"],
        cwd=JS_DIR, env=env, capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "# skipped 0" in proc.stdout, proc.stdout
