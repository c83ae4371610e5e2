"""Typed, consumer-facing table extensions (MCP descriptor, query presets).

Mirrors the reference's typed contract and strict validation
(``beacon-db/beacon-core/src/extensions.rs:1-460``): extensions are
metadata *about how to use* a table, parsed strictly — an unknown
extension kind, an unknown key, an ill-shaped value, or a column that
does not exist in the table schema is REJECTED at SET time with a clear
error, never silently ignored (docs server/extensions.md: "A spelling
error therefore gives an error. It does not switch the feature off in
silence").

Two kinds exist:

``mcp``
    How a downstream MCP server surfaces the table as a tool:
    ``{enabled, tool_name, title, description, exposed_columns,
    guardrails}``. ``tool_name`` must satisfy MCP tool-name rules (1-64
    chars of ``[A-Za-z0-9_-]``); ``exposed_columns`` entries are bare
    names or ``{"name", "description"}`` objects and must exist in the
    schema; ``guardrails`` is a free-form advisory map.

``preset``
    Named filter sets: ``{"presets": [{"name", "description",
    "filters": [{"column", "op", "value"}]}]}`` with ``op`` one of
    ``= != < <= > >= between in``; ``between`` needs a two-element
    array value, ``in`` a non-empty array; preset names are unique and
    filter columns must exist. One preset's filters combine with AND
    (``preset_where_sql``).
"""

from __future__ import annotations

import json
import re

PRESET_OPS = ("=", "!=", "<", "<=", ">", ">=", "between", "in")

_TOOL_NAME_RE = re.compile(r"^[A-Za-z0-9_-]{1,64}$")

_MCP_KEYS = {"enabled", "tool_name", "title", "description",
             "exposed_columns", "guardrails"}


class ExtensionError(ValueError):
    pass


def _ensure_only_keys(obj: dict, allowed: set, ctx: str) -> None:
    unknown = sorted(set(obj) - allowed)
    if unknown:
        raise ExtensionError(
            f"{ctx}: unknown field(s) {unknown}; allowed: {sorted(allowed)}")


def _ensure_column(columns: list[str] | None, col: str) -> None:
    if columns is not None and col not in columns:
        raise ExtensionError(
            f"column '{col}' does not exist in the table schema")


def validate_mcp(doc, columns: list[str] | None) -> dict:
    if not isinstance(doc, dict):
        raise ExtensionError("invalid 'mcp' extension payload: not an object")
    _ensure_only_keys(doc, _MCP_KEYS, "mcp extension")
    if not isinstance(doc.get("enabled", False), bool):
        raise ExtensionError("mcp 'enabled' must be a boolean")
    name = doc.get("tool_name")
    if name is not None and (
            not isinstance(name, str) or not _TOOL_NAME_RE.match(name)):
        raise ExtensionError(
            f"mcp tool_name {name!r} must be 1-64 characters of letters, "
            "digits, '_' or '-' (MCP tool-name rules)")
    for key in ("title", "description"):
        if key in doc and not isinstance(doc[key], str):
            raise ExtensionError(f"mcp '{key}' must be a string")
    cols = doc.get("exposed_columns")
    if cols is not None:
        if not isinstance(cols, list):
            raise ExtensionError("mcp 'exposed_columns' must be an array")
        for entry in cols:
            if isinstance(entry, str):
                _ensure_column(columns, entry)
            elif isinstance(entry, dict):
                _ensure_only_keys(
                    entry, {"name", "description"}, "mcp exposed column")
                if not isinstance(entry.get("name"), str):
                    raise ExtensionError(
                        "mcp exposed column object needs a 'name' string")
                _ensure_column(columns, entry["name"])
            else:
                raise ExtensionError(
                    "mcp exposed_columns entries are names or "
                    '{"name", "description"} objects')
    rails = doc.get("guardrails")
    if rails is not None and not isinstance(rails, dict):
        raise ExtensionError("mcp 'guardrails' must be a map")
    return doc


def validate_preset(doc, columns: list[str] | None) -> dict:
    if not isinstance(doc, dict):
        raise ExtensionError(
            "invalid 'preset' extension payload: not an object")
    _ensure_only_keys(doc, {"presets"}, "preset extension")
    presets = doc.get("presets")
    if not isinstance(presets, list):
        raise ExtensionError("preset extension needs a 'presets' array")
    seen: set[str] = set()
    for p in presets:
        if not isinstance(p, dict):
            raise ExtensionError("each preset must be an object")
        _ensure_only_keys(p, {"name", "description", "filters"}, "preset")
        pname = p.get("name")
        if not isinstance(pname, str) or not pname:
            raise ExtensionError("each preset needs a 'name' string")
        if pname in seen:
            raise ExtensionError(f"duplicate preset name '{pname}'")
        seen.add(pname)
        if "description" in p and not isinstance(p["description"], str):
            raise ExtensionError(f"preset '{pname}' description not a string")
        filters = p.get("filters")
        if not isinstance(filters, list):
            raise ExtensionError(f"preset '{pname}' needs a 'filters' array")
        for f in filters:
            if not isinstance(f, dict):
                raise ExtensionError(f"preset '{pname}': filter not an object")
            _ensure_only_keys(
                f, {"column", "op", "value"}, f"preset '{pname}' filter")
            if not isinstance(f.get("column"), str):
                raise ExtensionError(
                    f"preset '{pname}': filter needs a 'column' string")
            _ensure_column(columns, f["column"])
            op = f.get("op")
            if op not in PRESET_OPS:
                raise ExtensionError(
                    f"preset '{pname}': op {op!r} not one of {PRESET_OPS}")
            if "value" not in f:
                raise ExtensionError(f"preset '{pname}': filter needs 'value'")
            v = f["value"]
            where = f"preset '{pname}' filter on '{f['column']}'"
            if op == "between":
                if not (isinstance(v, list) and len(v) == 2):
                    raise ExtensionError(
                        f"{where} uses 'between' but value is not a "
                        "two-element array")
                for x in v:
                    _ensure_scalar(x, where)
            elif op == "in":
                if not (isinstance(v, list) and v):
                    raise ExtensionError(
                        f"{where} uses 'in' but value is not a "
                        "non-empty array")
                for x in v:
                    _ensure_scalar(x, where)
            else:
                # scalar comparisons: the value must render as ONE SQL
                # literal at use time — rejecting arrays/objects/null
                # HERE keeps the "no silent switch-off" promise (a bad
                # value would otherwise throw in preset_where_map and
                # blank every preset for the table)
                _ensure_scalar(v, where)
    return doc


def _ensure_scalar(v, ctx: str) -> None:
    if v is None or not isinstance(v, (str, int, float, bool)):
        raise ExtensionError(
            f"{ctx}: value {v!r} is not a scalar (string/number/boolean)")


_VALIDATORS = {"mcp": validate_mcp, "preset": validate_preset}


def parse_kind(kind: str, payload_json: str,
               columns: list[str] | None) -> dict:
    """Strictly parse + validate one extension kind's JSON payload.
    ``columns`` = the table's live column names (None skips existence
    checks — used when re-reading already-stored documents)."""
    validator = _VALIDATORS.get(kind.lower())
    if validator is None:
        raise ExtensionError(
            f"unknown extension kind '{kind}'; expected one of: mcp, preset")
    try:
        doc = json.loads(payload_json)
    except json.JSONDecodeError as e:
        raise ExtensionError(
            f"invalid '{kind}' extension payload: {e}") from e
    return validator(doc, columns)


def drop_kind_name(kind: str) -> str:
    """Validate a DROP EXTENSION kind (unknown kinds error, like set)."""
    k = kind.lower()
    if k not in _VALIDATORS:
        raise ExtensionError(
            f"unknown extension kind '{kind}'; expected one of: mcp, preset")
    return k


def exposed_column_names(mcp: dict) -> list[str] | None:
    """Names of the curated exposed columns (entries may be documented
    objects); None = expose everything. Tolerant of legacy pre-typed
    payloads (stored unvalidated): malformed entries are skipped, never
    raised — one bad stored doc must not break the whole tools listing."""
    cols = mcp.get("exposed_columns")
    if not isinstance(cols, list):
        return None
    out = []
    for c in cols:
        if isinstance(c, str):
            out.append(c)
        elif isinstance(c, dict) and isinstance(c.get("name"), str):
            out.append(c["name"])
    return out


def exposed_column_docs(mcp: dict) -> dict[str, str]:
    """{column: description} for the documented entries (legacy-tolerant,
    same contract as :func:`exposed_column_names`)."""
    cols = mcp.get("exposed_columns")
    if not isinstance(cols, list):
        return {}
    return {
        c["name"]: c["description"]
        for c in cols
        if isinstance(c, dict)
        and isinstance(c.get("name"), str)
        and isinstance(c.get("description"), str)
        and c["description"]
    }


def _sql_literal(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, str):
        # Spark-lexer-safe: preset filters are the MCP table tools'
        # NARROWING guard — a trailing backslash with ''-doubling alone
        # desynced the literal and silently widened what the tool serves
        from beacon_spark.server.guard import sql_string_literal

        return sql_string_literal(v)
    raise ExtensionError(f"unsupported preset filter value {v!r}")


def preset_where_sql(preset: dict) -> str:
    """One preset's filters as a SQL predicate — combined with AND
    (docs server/extensions.md; PresetOp::as_sql)."""
    parts = []
    for f in preset["filters"]:
        op, v = f["op"], f["value"]
        # backtick-quote like dsl._col: DSL column names are FLAT — a dot
        # is part of the name, never struct access — so 'obs.flag' must
        # not parse as a qualified reference
        col = "`" + f["column"].replace("`", "``") + "`"
        if op == "between":
            parts.append(
                f"{col} BETWEEN {_sql_literal(v[0])} AND {_sql_literal(v[1])}")
        elif op == "in":
            vals = ", ".join(_sql_literal(x) for x in v)
            parts.append(f"{col} IN ({vals})")
        else:
            parts.append(f"{col} {op} {_sql_literal(v)}")
    return " AND ".join(parts) if parts else "TRUE"


def preset_where_map(preset_doc: dict) -> dict[str, str]:
    """{preset name: WHERE-SQL} from a stored preset document. Accepts
    the typed shape; a legacy ``{name: "<where sql>"}`` map (pre-typed
    engines stored these) passes through so old catalogs keep serving."""
    if isinstance(preset_doc, dict) and isinstance(
            preset_doc.get("presets"), list):
        return {p["name"]: preset_where_sql(p)
                for p in preset_doc["presets"] if isinstance(p, dict)}
    if isinstance(preset_doc, dict) and all(
            isinstance(v, str) for v in preset_doc.values()):
        return dict(preset_doc)
    return {}
