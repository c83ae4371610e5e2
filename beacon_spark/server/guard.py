"""Read-only SQL gate shared by the HTTP/MCP and Flight transports.

The reference enforces read-only surfaces at the planner by clearing
the session's super-user flag (beacon-mcp server.rs:70-85); we have no
per-plan privilege bit, so the gate is lexical and deliberately
conservative: a statement passes only when it is SELECT-shaped AND
contains no write/DDL/admin keyword outside string literals AND does
not invoke ``remote_query()`` at all — the remote payload is a quoted
literal the engine would extract and execute on the attached remote
with full privileges, so no scan of the *outer* statement can vouch
for it.
"""

from __future__ import annotations

import re

__all__ = ["is_readonly_sql", "READONLY_START_RE", "WRITE_KEYWORD_RE"]

READONLY_START_RE = re.compile(
    r"^\s*(SELECT|WITH|SUMMARIZE|EXPLAIN|SHOW|DESCRIBE)\b",
    re.IGNORECASE,
)
# write/DDL/admin keywords that must not appear ANYWHERE outside string
# literals — a WITH-prefixed INSERT or an EXPLAIN ANALYZE of a COPY both
# start "read-only" but execute writes
WRITE_KEYWORD_RE = re.compile(
    r"\b(INSERT|UPDATE|DELETE|MERGE|DROP|CREATE|ALTER|TRUNCATE|COPY|"
    r"VACUUM|ATTACH|DETACH|ANALYZE|GRANT|REVOKE|DENY|SET|RUN|REFRESH|"
    r"OVERWRITE)\b",
    re.IGNORECASE,
)


def is_readonly_sql(sql: str) -> bool:
    if not READONLY_START_RE.match(sql):
        return False
    # remote_query is checked BEFORE literal blanking (see module doc)
    if re.search(r"\bremote_query\s*\(", sql, re.IGNORECASE):
        return False
    # blank out single-quoted literals ('' escape included) so quoted
    # text can't false-positive, then scan for write keywords
    stripped = re.sub(r"'(?:[^']|'')*'", "''", sql)
    return not WRITE_KEYWORD_RE.search(stripped)
