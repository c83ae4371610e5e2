"""OpenAPI 3 document for the HTTP surface.

The reference assembles an OpenAPI doc from its route annotations and
serves it at ``{base}/openapi.json`` with Swagger/Scalar viewers
(``beacon-server/src/axum/router.rs:61-77``). This module hand-authors
the equivalent document for our routes — the doc is the API contract a
client generator consumes, so every served route appears here (the
parity test walks this inventory against the handler)."""

from __future__ import annotations

__all__ = ["openapi_doc"]


def _op(summary: str, *, tag: str, params: list | None = None,
        body: bool = False, binary: bool = False) -> dict:
    op: dict = {"summary": summary, "tags": [tag],
                "responses": {"200": {"description": "success"}}}
    if params:
        op["parameters"] = [
            {"name": n, "in": "query", "required": req,
             "schema": {"type": "string"}}
            for n, req in params
        ]
    if body:
        ctype = "application/octet-stream" if binary else "application/json"
        schema = ({"type": "string", "format": "binary"} if binary
                  else {"type": "object"})
        op["requestBody"] = {
            "required": True,
            "content": {ctype: {"schema": schema}},
        }
    return op


def openapi_doc() -> dict:
    from beacon_spark.version import VERSION

    q = "query"
    a = "admin"
    m = "metadata"
    paths = {
        "/api/query": {"post": _op(
            "Run a SQL statement or JSON-DSL query; format=json returns "
            "rows, output.format returns a file download, default is an "
            "Arrow IPC stream", tag=q, body=True)},
        "/api/explain-query": {"post": _op(
            "Plan a statement and return its query execution plan",
            tag=q, body=True)},
        "/api/parse-query": {"post": _op(
            "Validate a statement and return its result schema",
            tag=q, body=True)},
        "/api/explain-analyze-query": {"post": _op(
            "Execute a statement and return its physical plan annotated "
            "with per-node runtime metrics", tag=q, body=True)},
        "/api/query/available-columns": {"get": _op(
            "Column names of the default table (deprecated: use "
            "/api/default-table-schema)", tag=q)},
        "/api/query/metrics/{query_id}": {"get": _op(
            "Execution metrics for a completed query", tag=q)},
        "/api/health": {"get": _op("Liveness probe", tag=m)},
        "/api/info": {"get": _op("Engine version", tag=m)},
        "/api/datasets": {"get": _op(
            "Every dataset under the root with its detected format",
            tag=m)},
        "/api/total-datasets": {"get": _op("Dataset count", tag=m)},
        "/api/tables": {"get": _op("Catalog table names", tag=m)},
        "/api/tables-with-schema": {"get": _op(
            "Every readable table with its schema fields", tag=m)},
        "/api/table-extensions": {"get": _op(
            "Extension documents attached to a table", tag=m)},
        "/api/table-schema": {"get": _op(
            "Schema of a catalog table (RBAC-gated)", tag=m,
            params=[("table", True)])},
        "/api/dataset-schema": {"get": _op(
            "Schema of a dataset file (RBAC-gated)", tag=m,
            params=[("dataset", True)])},
        "/api/default-table": {"get": _op("Default table name", tag=m)},
        "/api/default-table-schema": {"get": _op(
            "Schema of the default table", tag=m)},
        "/api/functions": {"get": _op("Callable scalar functions", tag=m)},
        "/api/table-functions": {"get": _op(
            "Callable read_* table functions", tag=m)},
        "/api/catalogs": {"get": _op("Catalog names", tag=m)},
        "/mcp": {"post": _op(
            "Model Context Protocol endpoint (streamable HTTP)",
            tag=q, body=True)},
        "/openapi.json": {"get": _op("This document", tag=m)},
        # ------------------------------------------------ admin surface
        "/api/admin/check": {"get": _op(
            "Admin availability check", tag=a)},
        "/api/admin/crawlers": {
            "get": _op("List crawlers", tag=a),
            "post": _op("Create a crawler {name, prefix?, schedule?}",
                        tag=a, body=True),
        },
        "/api/admin/crawlers/{name}": {
            "get": _op("One crawler", tag=a),
            "delete": _op("Drop a crawler", tag=a),
        },
        "/api/admin/crawlers/{name}/run": {"post": _op(
            "Run a crawler now; returns registered tables", tag=a)},
        "/api/admin/external-tables": {"post": _op(
            "Create an external table {name, format, location, options?}",
            tag=a, body=True)},
        "/api/admin/datasets": {"delete": _op(
            "Delete a dataset file (refused while referenced)", tag=a,
            params=[("path", True)])},
        "/api/admin/datasets/upload": {
            "post": _op("Upload a dataset file (streamed, size-capped)",
                        tag=a, params=[("path", True),
                                       ("overwrite", False)],
                        body=True, binary=True),
            "delete": _op("Abort a chunked upload session", tag=a,
                          params=[("upload_id", True)]),
        },
        "/api/admin/datasets/download": {"get": _op(
            "Download a dataset file", tag=a, params=[("path", True)])},
        "/api/admin/datasets/upload/initiate": {"post": _op(
            "Start a chunked upload; returns upload_id + part_size",
            tag=a, params=[("path", True), ("overwrite", False)])},
        "/api/admin/datasets/upload/part": {"post": _op(
            "Upload one in-order part", tag=a,
            params=[("upload_id", True), ("part_number", True)],
            body=True, binary=True)},
        "/api/admin/datasets/upload/complete": {"post": _op(
            "Commit a chunked upload to the store", tag=a,
            params=[("upload_id", True)])},
        "/api/admin/table-extensions/{table_name}": {
            "get": _op("Table extensions (mcp/preset/...)", tag=a),
            "put": _op("Set table extensions", tag=a, body=True),
        },
        "/api/admin/auth/users": {"get": _op("List users", tag=a)},
        "/api/admin/auth/roles": {"get": _op("List roles", tag=a)},
        "/api/admin/table-config": {"get": _op(
            "Retired; answers 410 with the replacement routes", tag=a)},
    }
    return {
        "openapi": "3.0.3",
        "info": {
            "title": "beacon_spark",
            "version": VERSION,
            "description": "PySpark-native analytics engine: SQL + "
                           "JSON-DSL queries over a scientific data "
                           "lake, with super-user admin management.",
        },
        "components": {"securitySchemes": {
            "bearer": {"type": "http", "scheme": "bearer"},
            "basic": {"type": "http", "scheme": "basic"},
        }},
        "security": [{"bearer": []}, {"basic": []}],
        "tags": [
            {"name": "query", "description": "Query execution"},
            {"name": "metadata", "description": "Catalog introspection"},
            {"name": "admin",
             "description": "Super-user management (HTTP Basic/Bearer)"},
        ],
        "paths": paths,
    }
