"""Terminal client for a running beacon_spark HTTP server.

Parity target: ``beacon-clients/beacon-datalake-cli`` (its README and
``cli.py``/``commands/*``) — one-shot subcommands for scripting plus an
interactive shell, talking only to the server's ``/api/*`` endpoints
and decoding the (zstd-compressed) Arrow IPC result stream with
pyarrow. Everything here is stdlib + pyarrow: argparse instead of
typer, a plain column-width table renderer instead of rich, readline
when available.

Like the reference, connection details are explicit arguments only —
the CLI does NOT read ``BEACON_SPARK_*`` environment variables (those
configure the *server*; inheriting them would silently connect with
the server's admin credentials).

Usage::

    python -m beacon_spark.cli --url http://127.0.0.1:5001 \
        query "SELECT * FROM t LIMIT 10"
    python -m beacon_spark.cli tables
    python -m beacon_spark.cli export "SELECT * FROM t" out.parquet
    python -m beacon_spark.cli            # interactive shell
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import sys
import urllib.error
import urllib.request

DEFAULT_URL = "http://127.0.0.1:5001"

#: file extension → the server's output.format name (query.rs:20-44)
EXPORT_FORMATS = {
    ".csv": "csv", ".parquet": "parquet", ".arrow": "arrow",
    ".ipc": "arrow", ".nc": "netcdf", ".odv": "odv", ".geoparquet":
    "geoparquet",
}


class CliError(RuntimeError):
    pass


class BeaconCliClient:
    """Thin HTTP client for the CLI (the reference's ``client.py`` role)."""

    def __init__(self, url: str = DEFAULT_URL, username: str | None = None,
                 password: str | None = None, token: str | None = None,
                 timeout: float = 60.0):
        # localhost → 127.0.0.1 (README: avoids the Windows IPv6-first
        # 2s stall against IPv4-only servers). Exact-host only — a bare
        # substring replace corrupted hosts merely STARTING with it
        # (localhost.run → 127.0.0.1.run)
        import re as _re

        self.url = _re.sub(
            r"//localhost(?=[:/]|$)", "//127.0.0.1", url).rstrip("/")
        self.timeout = timeout
        self._headers: dict[str, str] = {}
        if token:
            self._headers["Authorization"] = f"Bearer {token}"
        elif username is not None:
            creds = base64.b64encode(
                f"{username}:{password or ''}".encode()).decode()
            self._headers["Authorization"] = f"Basic {creds}"

    # ------------------------------------------------------------ http

    def _request(self, path: str, body: dict | None = None,
                 sink=None) -> bytes | int:
        """POST/GET ``path``; returns the body bytes, or — when ``sink``
        (a writable binary file) is given — streams the response into it
        chunk by chunk and returns the byte count, so a multi-GB export
        never sits in CLI memory."""
        data = json.dumps(body).encode() if body is not None else None
        req = urllib.request.Request(
            self.url + path, data=data,
            headers={**self._headers, "Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as r:
                if sink is None:
                    return r.read()
                total = 0
                while True:
                    chunk = r.read(1 << 20)
                    if not chunk:
                        return total
                    sink.write(chunk)
                    total += len(chunk)
        except urllib.error.HTTPError as e:
            try:
                msg = json.loads(e.read().decode())
            except Exception:
                msg = e.reason
            raise CliError(f"{e.code}: {msg}") from e
        except urllib.error.URLError as e:
            raise CliError(
                f"could not connect to {self.url}: {e.reason}") from e

    def _get_json(self, path: str):
        return json.loads(self._request(path))

    # ------------------------------------------------------------ api

    def query_arrow(self, sql: str):
        """Arrow table of a SQL result (the server streams zstd-
        compressed IPC; pyarrow decodes transparently)."""
        import pyarrow as pa

        raw = self._request("/api/query", {"sql": sql})
        return pa.ipc.open_stream(io.BytesIO(raw)).read_all()

    def export(self, sql: str, path: str, fmt: str | None = None) -> int:
        """Server-side export: the file-download response is written
        to ``path`` as received (never decoded into memory)."""
        if fmt is None:
            # longest suffix first: .geoparquet must not match .parquet
            for ext in sorted(EXPORT_FORMATS, key=len, reverse=True):
                if path.lower().endswith(ext):
                    fmt = EXPORT_FORMATS[ext]
                    break
        if fmt is None:
            raise CliError(
                f"cannot infer export format from {path!r}; use --format"
            )
        # spool to a sibling temp name and rename on success: a failed
        # query (or a connection dropped mid-stream) must never leave a
        # truncated file at the destination — especially not TRUNCATE an
        # existing good export the user is replacing
        import os
        import uuid as _uuid

        tmp = f"{path}.__export_{_uuid.uuid4().hex[:8]}"
        try:
            with open(tmp, "wb") as f:
                n = self._request(
                    "/api/query", {"sql": sql, "output": {"format": fmt}},
                    sink=f,
                )
            os.replace(tmp, path)
            return n
        except BaseException:
            with __import__("contextlib").suppress(OSError):
                os.unlink(tmp)
            raise

    def tables(self) -> list:
        return self._get_json("/api/tables")

    def datasets(self) -> list:
        return self._get_json("/api/datasets")

    def table_schema(self, table: str):
        from urllib.parse import quote

        return self._get_json(f"/api/table-schema?table={quote(table)}")

    def dataset_schema(self, path: str):
        from urllib.parse import quote

        return self._get_json(f"/api/dataset-schema?path={quote(path)}")

    def functions(self) -> list:
        return self._get_json("/api/functions")

    def info(self):
        return self._get_json("/api/info")

    def metrics(self, query_id: str):
        return self._get_json(f"/api/query/metrics/{query_id}")

    def access_level(self) -> str:
        """super-user / user / anonymous — resolved the way the
        reference greets (README: the shell reports the access level
        the server grants)."""
        try:
            self._get_json("/api/admin/check")
            return "super-user"
        except CliError as e:
            if str(e).startswith(("401", "403")):
                return "user" if self._headers else "anonymous"
            raise


# ------------------------------------------------------------ rendering


def render_table(table, max_rows: int = 100, max_width: int = 40) -> str:
    """Plain fixed-width table for a pyarrow Table (the rich-less
    analog of the reference's render/)."""
    cols = table.column_names
    head = table.slice(0, max_rows)  # render only what is shown
    rows = [
        ["" if v is None else str(v)[:max_width] for v in row]
        for row in zip(*[c.to_pylist() for c in head.columns])
    ] if table.num_columns else []
    widths = [
        max(len(c), *(len(r[i]) for r in rows)) if rows else len(c)
        for i, c in enumerate(cols)
    ]
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    out = [sep, "|" + "|".join(
        f" {c:<{w}} " for c, w in zip(cols, widths)) + "|", sep]
    for r in rows:
        out.append("|" + "|".join(
            f" {v:<{w}} " for v, w in zip(r, widths)) + "|")
    out.append(sep)
    extra = table.num_rows - len(rows)
    if extra > 0:
        out.append(f"({table.num_rows} rows, {extra} not shown)")
    else:
        out.append(f"({table.num_rows} row{'s' if table.num_rows != 1 else ''})")
    return "\n".join(out)


def _emit(table, fmt: str) -> str:
    if fmt == "table":
        return render_table(table)
    if fmt == "json":
        return json.dumps(table.to_pylist(), default=str, indent=1)
    if fmt == "csv":
        import pyarrow.csv as pacsv

        sink = io.BytesIO()
        pacsv.write_csv(table, sink)
        return sink.getvalue().decode()
    raise CliError(f"unknown output format {fmt!r}")


# ------------------------------------------------------------ commands


def cmd_query(client: BeaconCliClient, args) -> int:
    print(_emit(client.query_arrow(args.sql), args.format))
    return 0


def cmd_export(client: BeaconCliClient, args) -> int:
    n = client.export(args.sql, args.path, args.format)
    print(f"wrote {n} bytes to {args.path}")
    return 0


def cmd_tables(client: BeaconCliClient, args) -> int:
    for t in client.tables():
        print(t if isinstance(t, str) else json.dumps(t))
    return 0


def cmd_datasets(client: BeaconCliClient, args) -> int:
    for d in client.datasets():
        print(d if isinstance(d, str) else json.dumps(d))
    return 0


def cmd_schema(client: BeaconCliClient, args) -> int:
    print(json.dumps(client.table_schema(args.table), indent=1))
    return 0


def cmd_dataset_schema(client: BeaconCliClient, args) -> int:
    print(json.dumps(client.dataset_schema(args.path), indent=1))
    return 0


def cmd_functions(client: BeaconCliClient, args) -> int:
    for f in client.functions():
        print(f if isinstance(f, str) else json.dumps(f))
    return 0


def cmd_info(client: BeaconCliClient, args) -> int:
    print(json.dumps(client.info(), indent=1))
    return 0


def cmd_metrics(client: BeaconCliClient, args) -> int:
    print(json.dumps(client.metrics(args.query_id), indent=1, default=str))
    return 0


# ------------------------------------------------------------ repl


DOT_HELP = """\
.tables            list catalog tables
.datasets          list datasets
.schema <table>    show a table's schema
.format <mode>     output mode: table | json | csv
.export <sql> ; <file>   server-side export
.help              this help
.quit / .exit      leave the shell
Statements end with ';' and may span lines."""


def repl(client: BeaconCliClient, out=None) -> None:
    """Interactive shell: multi-line SQL ending in ';', dot-commands,
    readline history when the module is available."""
    if out is None:  # resolved at call time so test capture works
        out = sys.stdout
    try:
        import readline  # noqa: F401 — line editing + history
    except ImportError:
        pass
    level = client.access_level()
    print(f"connected to {client.url} as {level}", file=out)
    print("type .help for commands, .quit to leave", file=out)
    fmt = "table"
    buf: list[str] = []
    while True:
        try:
            line = input("beacon> " if not buf else "   ...> ")
        except (EOFError, KeyboardInterrupt):
            print(file=out)
            return
        if not buf and line.strip().startswith("."):
            parts = line.strip().split(None, 1)
            dot, arg = parts[0], parts[1] if len(parts) > 1 else ""
            try:
                if dot in (".quit", ".exit"):
                    return
                elif dot == ".help":
                    print(DOT_HELP, file=out)
                elif dot == ".tables":
                    for t in client.tables():
                        print(t if isinstance(t, str) else json.dumps(t),
                              file=out)
                elif dot == ".datasets":
                    for d in client.datasets():
                        print(d if isinstance(d, str) else json.dumps(d),
                              file=out)
                elif dot == ".schema" and arg:
                    print(json.dumps(client.table_schema(arg), indent=1),
                          file=out)
                elif dot == ".format" and arg in ("table", "json", "csv"):
                    fmt = arg
                elif dot == ".export" and ";" in arg:
                    sql, _, path = arg.rpartition(";")
                    n = client.export(sql.strip(), path.strip())
                    print(f"wrote {n} bytes to {path.strip()}", file=out)
                else:
                    print(f"unknown command {line.strip()!r} — .help",
                          file=out)
            except CliError as e:
                print(f"error: {e}", file=out)
            continue
        buf.append(line)
        if not line.rstrip().endswith(";"):
            continue
        sql = "\n".join(buf).rstrip().rstrip(";")
        buf = []
        if not sql.strip():
            continue
        try:
            print(_emit(client.query_arrow(sql), fmt), file=out)
        except CliError as e:
            print(f"error: {e}", file=out)


# ------------------------------------------------------------ main


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="beacon-spark-cli",
        description="Terminal client for a beacon_spark server.",
    )
    ap.add_argument("--url", "-u", default=DEFAULT_URL)
    ap.add_argument("--username", default=None)
    ap.add_argument("--password", default=None)
    ap.add_argument("--token", default=None,
                    help="bearer token (the transport super-identity)")
    ap.add_argument("--timeout", type=float, default=60.0)
    sub = ap.add_subparsers(dest="command")

    q = sub.add_parser("query", help="run SQL and print the result")
    q.add_argument("sql")
    q.add_argument("--format", "-f", default="table",
                   choices=["table", "json", "csv"])
    e = sub.add_parser("export", help="server-side export to a file")
    e.add_argument("sql")
    e.add_argument("path")
    e.add_argument("--format", "-f", default=None,
                   choices=sorted(set(EXPORT_FORMATS.values())))
    sub.add_parser("tables", help="list catalog tables")
    sub.add_parser("datasets", help="list datasets")
    s = sub.add_parser("schema", help="show a table schema")
    s.add_argument("table")
    ds = sub.add_parser("dataset-schema", help="show a dataset schema")
    ds.add_argument("path")
    sub.add_parser("functions", help="list SQL functions")
    sub.add_parser("info", help="server info")
    m = sub.add_parser("metrics", help="metrics for a query id")
    m.add_argument("query_id")
    sub.add_parser("repl", help="interactive shell (the default)")
    return ap


_COMMANDS = {
    "query": cmd_query, "export": cmd_export, "tables": cmd_tables,
    "datasets": cmd_datasets, "schema": cmd_schema,
    "dataset-schema": cmd_dataset_schema, "functions": cmd_functions,
    "info": cmd_info, "metrics": cmd_metrics,
}


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    client = BeaconCliClient(args.url, args.username, args.password,
                             args.token, args.timeout)
    try:
        if args.command in (None, "repl"):
            repl(client)
            return 0
        return _COMMANDS[args.command](client, args)
    except CliError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    raise SystemExit(main())
