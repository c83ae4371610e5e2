"""Users / roles / grants with deny-wins read authorization.

The Spark-side analog of the reference's auth stack
(``beacon-db/beacon-auth/src/role.rs`` — roles hold grant and deny rule
sets; ``statement_plan/authz.rs:25-41`` — every read target needs
``Select``, deny-wins, default-deny; ``statement_plan/mod.rs:58-78`` —
DDL/DML/statements are gated on the super-user flag).

Model, persisted in the catalog JSON under ``"auth"``:

    auth.users[name]  = {password: "pbkdf2$...", roles: [...],
                         super_user: bool}
    auth.roles[name]  = {grants: [rule...], denies: [rule...]}
    rule              = {privilege: SELECT|INSERT|UPDATE|DELETE|CREATE|
                         DROP|ALL,
                         target: null | {"all": true} | {"table": name}
                                | {"path": glob}}
    auth.enforce      = bool (default false — grants gate reads only
                        when enforcement is on, like the reference's
                        runtime flag; the super-user gate on DDL/DML is
                        unconditional once a caller identity is given)

Statement surface (mirrors ``parser/statement.rs:141-211``)::

    CREATE USER u WITH PASSWORD 'pw' [SUPERUSER]
    DROP USER u
    CREATE ROLE r / DROP ROLE r
    GRANT ROLE r TO USER u / REVOKE ROLE r FROM USER u
    GRANT <priv> [ON TABLE t | ON PATH 'glob' | ON ALL] TO ROLE r
    DENY  <priv> [ON ...] TO ROLE r
    REVOKE [DENY] <priv> [ON ...] FROM ROLE r
    SET AUTH ENFORCEMENT ON|OFF
    SHOW USERS / SHOW ROLES

Identity threading: ``Engine.sql(stmt, user="alice")``. ``user=None``
is the embedded caller — the implicit super-user, exactly the
reference's default identity when no auth is configured. Divergences
(documented): passwords hash with PBKDF2-HMAC-SHA256 (no Argon2 in the
stdlib), and SQL read targets are resolved lexically against the
catalog's table names + ``read_*`` path arguments rather than by
walking resolved TableScans — an over-approximation, so it errs toward
denial, never toward leaking. JSON-DSL queries check EXACTLY
(:func:`authorize_dsl`): the DSL's ``from`` spec names its tables and
paths. Views are DEFINER-rights objects (PostgreSQL semantics): a
SELECT grant on a view authorizes its whole definition — the
underlying tables are not re-checked against the caller's roles, so
grant views deliberately, as the curated projections they are.
"""

from __future__ import annotations

import fnmatch
import hashlib
import re
import secrets

__all__ = [
    "AuthError", "run_auth_statement", "authorize", "authorize_dsl",
    "require_super", "verify_user", "hash_password", "is_allowed",
]

PRIVILEGES = {"SELECT", "INSERT", "UPDATE", "DELETE", "CREATE", "DROP", "ALL"}


class AuthError(PermissionError):
    pass


# ------------------------------------------------------------ passwords

def hash_password(pw: str, iterations: int = 100_000) -> str:
    salt = secrets.token_hex(16)
    dk = hashlib.pbkdf2_hmac(
        "sha256", pw.encode(), bytes.fromhex(salt), iterations
    )
    return f"pbkdf2${iterations}${salt}${dk.hex()}"


def check_password(pw: str, stored: str) -> bool:
    try:
        _, iters, salt, want = stored.split("$")
        dk = hashlib.pbkdf2_hmac(
            "sha256", pw.encode(), bytes.fromhex(salt), int(iters)
        )
        return secrets.compare_digest(dk.hex(), want)
    except (ValueError, TypeError):
        return False


_DUMMY_HASH = hash_password("beacon-dummy-timing-pad")


def verify_user(engine, username: str, pw: str) -> bool:
    """Transport-side credential check (HTTP Basic → engine identity).
    Unknown usernames still pay the full PBKDF2 cost against a dummy
    hash — an early return would be a remote timing oracle enumerating
    valid usernames."""
    a = _auth(engine.catalog._load())
    u = a["users"].get(username)
    if not u:
        check_password(pw, _DUMMY_HASH)
        return False
    return check_password(pw, u.get("password", ""))


# ------------------------------------------------------------ evaluator

def _auth(cat: dict) -> dict:
    a = cat.setdefault("auth", {})
    a.setdefault("users", {})
    a.setdefault("roles", {})
    a.setdefault("enforce", False)
    return a


def _rule_matches(rule: dict, privilege: str, target: tuple[str, str]) -> bool:
    if rule["privilege"] not in (privilege, "ALL"):
        return False
    t = rule.get("target")
    if t is None or t.get("all"):
        return True
    kind, value = target
    if "table" in t:
        return kind == "table" and value == t["table"]
    if "path" in t:
        return kind == "path" and fnmatch.fnmatch(value, t["path"])
    return False


def is_allowed(auth: dict, roles: list[str], privilege: str,
               target: tuple[str, str]) -> bool:
    """Deny-wins over the user's roles; default-deny (role.rs:322-344)."""
    matched = [auth["roles"][r] for r in roles if r in auth["roles"]]
    if any(
        _rule_matches(rule, privilege, target)
        for role in matched for rule in role.get("denies", [])
    ):
        return False
    return any(
        _rule_matches(rule, privilege, target)
        for role in matched for rule in role.get("grants", [])
    )


# ------------------------------------------------------------ authorize

# Spark's direct-file scans: ``SELECT … FROM parquet.`/path```,
# csv.`…`, json.`…`, … — a read target with no catalog name. Runs on
# scrub_sql output, where comments are ONE space — a /*comment*/ between
# the format word and the dot can't break adjacency.
_FILE_SCAN_RE = re.compile(r"\b\w+\s*\.\s*`([^`]+)`")


def _path_candidates(engine, path: str) -> set[str]:
    """The spellings a path rule must be checked against: as written,
    normalized (``./hidden.parquet`` ≡ ``hidden.parquet`` — an alternate
    spelling must not dodge a DENY), and resolved against the engine's
    datasets root (the form the reader actually opens)."""
    import posixpath

    out = {path, posixpath.normpath(path)}
    root = getattr(engine, "datasets_root", None)
    if root is None or "://" in path:
        return out
    if not path.startswith("/"):
        joined = posixpath.normpath(f"{root}/{path}")
        out.add(joined)
        out.add(joined[len(root):].lstrip("/"))
    else:
        # absolute spelling of a file under the root must also hit
        # relative-form rules — '/root/data/x.parquet' ≡ 'x.parquet'
        norm = posixpath.normpath(path)
        nroot = posixpath.normpath(str(root))
        if norm == nroot or norm.startswith(nroot.rstrip("/") + "/"):
            rel = norm[len(nroot):].lstrip("/")
            if rel:
                out.add(rel)
                out.add(f"./{rel}")
    return out


def _check_path(engine, a: dict, roles: list[str], path: str) -> None:
    """Deny-wins across every spelling: ANY candidate matching a deny
    denies; otherwise ANY candidate matching a grant allows. A path
    containing glob metacharacters additionally checks every CONCRETE
    file the engine will expand it to — a char-class spelling like
    ``[s]ecret/x`` must not dodge a deny aimed at ``secret/*`` (the
    rules match text; the reader matches files)."""
    cands = _path_candidates(engine, path)
    if any(ch in path for ch in "*?["):
        from beacon_spark.sources.paths import resolve_globs

        try:
            resolved = resolve_globs(
                path, getattr(engine, "datasets_root", None))
        except FileNotFoundError:
            resolved = []  # nothing matches → the read itself will fail
        except Exception as exc:
            # fail CLOSED: a transient listing/storage error must not
            # skip the concrete-file deny check this expansion exists
            # for (a char-class spelling dodging a deny on secret/*)
            raise AuthError(
                f"permission denied: SELECT on path {path!r} "
                f"(glob expansion failed: {exc})"
            )
        for rp in resolved:
            cands |= _path_candidates(engine, rp)
    allowed = False
    for c in cands:
        matched = [a["roles"][r] for r in roles if r in a["roles"]]
        if any(
            _rule_matches(rule, "SELECT", ("path", c))
            for role in matched for rule in role.get("denies", [])
        ):
            raise AuthError(f"permission denied: SELECT on path {path!r}")
        allowed = allowed or any(
            _rule_matches(rule, "SELECT", ("path", c))
            for role in matched for rule in role.get("grants", [])
        )
    if not allowed:
        raise AuthError(f"permission denied: SELECT on path {path!r}")


class ExternalPrincipal(str):
    """A username authenticated by an EXTERNAL IdP (OIDC bearer token):
    the roles ride ON the principal (snapshotted from the verified
    token), and the local user directory NEVER resolves it — a token
    whose username claim collides with a local user (even a super-user)
    must not inherit that user's local privileges, and a directory
    lookup keyed by the bare name would do exactly that. str subclass,
    so grants/metrics/logging treat it as the plain username."""

    __slots__ = ("roles",)

    def __new__(cls, name: str, roles=()):
        self = super().__new__(cls, name)
        self.roles = list(roles)
        return self


def _resolve_ident(engine, a: dict, user: str) -> dict | None:
    """Directory user, or an EXTERNAL principal (OIDC/IdP-verified):
    the IdP owns the user, the token's role names map onto the local
    role/grant model, and external principals are NEVER super-users
    (reference oidc.rs:1-8 — the provider holds no user directory).
    The two populations never cross-resolve: an external principal is
    answered from its token roles even when a directory user shares
    the name, and a directory user never picks up token roles."""
    if isinstance(user, ExternalPrincipal):
        return {"roles": list(user.roles), "super_user": False}
    return a["users"].get(user)


def authorize(engine, statement: str, user: str | None) -> None:
    """Gate one statement for ``user``. ``None`` = embedded super-user
    (no checks). Super-user gate is unconditional; read grants are
    enforced only when ``auth.enforce`` is on (authz.rs:25-41)."""
    if user is None:
        return
    cat = engine.catalog._load() if engine.catalog is not None else {}
    a = _auth(cat)
    ident = _resolve_ident(engine, a, user)
    if ident is None:
        raise AuthError(f"unknown user {user!r}")
    if ident.get("super_user"):
        return
    from beacon_spark.server.guard import is_readonly_sql

    if not is_readonly_sql(statement):
        # validate_query_plan's reframed message (mod.rs:63-70)
        raise AuthError(
            "operation not permitted: this statement requires super-user "
            "privileges"
        )
    # metadata schemas (beacon.system.*, information_schema.*) are
    # super-user-only UNCONDITIONALLY — even with enforcement off, the
    # auth directory and other users' query texts must not be readable
    # on a default runtime (system_schema/mod.rs:50-66). scrub_sql is
    # the lexer-accurate blanking (backslash escapes, comments) shared
    # with the read-only gate — a desynced regex here let references
    # hide inside fake literals.
    from beacon_spark.server.guard import scrub_sql

    blanked_stmt = scrub_sql(statement)
    if re.search(
        r"(?<![\w.])(?:beacon\s*\.\s*)?(?:system|information_schema)\s*\.\s*\w",
        blanked_stmt, re.IGNORECASE,
    ):
        raise AuthError(
            "permission denied: metadata schemas are super-user-only"
        )
    # internal temp views (__beacon_system_*, __beacon_meta_*, …) are the
    # rewrite machinery's implementation detail — naming one directly
    # would read metadata schemas through the back door
    if re.search(r"(?<![\w.])__beacon\w*", blanked_stmt, re.IGNORECASE):
        raise AuthError(
            "permission denied: internal __beacon* names are super-user-only"
        )
    if not a.get("enforce"):
        return
    roles = ident.get("roles", [])
    blanked = blanked_stmt
    idents = {w.lower() for w in re.findall(r"\w+", blanked)}
    # a time-travel snapshot view (<table>__v<n>, left registered by an
    # earlier super-user query) is a read of its base table — grants and
    # DENYs on the base name apply to every pinned version of it
    for w in list(idents):
        m = re.fullmatch(r"(\w+?)__v\d+(?:_\d+)?", w)
        if m:
            idents.add(m.group(1))
    names = (
        list(cat.get("tables", {}))
        + list(cat.get("external_tables", {}))
        + list(cat.get("views", {}))
        + list(cat.get("materialized_views", {}))
    )
    for name in names:
        if name.lower() in idents and not is_allowed(
            a, roles, "SELECT", ("table", name)
        ):
            raise AuthError(f"permission denied: SELECT on table {name!r}")
    # attached-remote references (alias__tbl) are read targets too —
    # check them as tables under their full reference name
    for alias in cat.get("attachments", {}):
        for w in idents:
            if w.startswith(f"{alias.lower()}__") and not is_allowed(
                a, roles, "SELECT", ("table", w)
            ):
                raise AuthError(f"permission denied: SELECT on table {w!r}")
    # every quoted argument of every read_* call (multi-path calls read
    # ALL their paths), deny-wins across path spellings. The extraction
    # MIRRORS the engine's rewrite exactly — same regex, same
    # literal-span skip, same raw (unescaped) path text — so auth checks
    # precisely the paths the engine will read; a looser regex here once
    # let a ')' inside a quoted glob hide the whole arg list.
    from beacon_spark.engine import _READ_FN_RE, _in_literal, _literal_spans

    spans = _literal_spans(statement)
    for call in _READ_FN_RE.finditer(statement):
        if _in_literal(spans, call.start()):
            continue
        arglist = call.group(2) if call.group(2) is not None else call.group(3)
        for g in arglist.split(","):
            _check_path(engine, a, roles, g.strip()[1:-1])
    # Spark's direct-file scans (parquet.`/path`) are path reads with no
    # catalog name — without this they'd slip past both checks above
    for m in _FILE_SCAN_RE.finditer(blanked):
        _check_path(engine, a, roles, m.group(1))


def resolve_unauthenticated(engine) -> str | None:
    """Identity for a credential-less call on a token-less server —
    ONE rule for every transport (HTTP, Flight).

    Enforcement off → ``None`` (the embedded super-user: open server,
    embedded mode). Enforcement on → the provisioned ``anonymous``
    principal (``CREATE USER anonymous`` — the reference's
    ``set_anonymous_user`` contract, beacon-auth/context.rs:12,131-148),
    or :class:`AuthError` when none exists. A catalog read failure also
    raises — this gate must fail CLOSED: a transient store error while
    enforcement is on must never escalate a stranger to embedded super.
    """
    if engine.catalog is None:
        return None
    import time as _time

    now = _time.monotonic()
    cached = getattr(engine, "_unauth_cache", None)
    if cached is not None and cached[0] > now:
        ok, val = cached[1]
        if ok:
            return val
        raise AuthError(val)

    def _remember(ok, val):
        # 2 s TTL: this runs on EVERY credential-less request (health
        # probes, each Flight call) and a full catalog read per request
        # is store traffic on the hot path; 2 s bounds the staleness of
        # an enforcement flip, and failures cache too (still closed)
        engine._unauth_cache = (now + 2.0, (ok, val))

    try:
        a = _auth(engine.catalog._load())
    except Exception as e:  # noqa: BLE001 — any load failure = closed
        msg = f"auth state unavailable: {e}"
        _remember(False, msg)
        raise AuthError(msg) from e
    if not a.get("enforce"):
        _remember(True, None)
        return None
    if "anonymous" in a["users"]:
        _remember(True, "anonymous")
        return "anonymous"
    msg = ("authentication required (enforcement is on and no anonymous "
           "principal exists)")
    _remember(False, msg)
    raise AuthError(msg)


def require_super(engine, user: str | None, msg: str) -> None:
    """Raise unless ``user`` is the embedded caller or a super-user."""
    if user is None:
        return
    a = _auth(engine.catalog._load() if engine.catalog is not None else {})
    ident = _resolve_ident(engine, a, user)
    if ident is None:
        raise AuthError(f"unknown user {user!r}")
    if not ident.get("super_user"):
        raise AuthError(msg)


def authorize_dsl(engine, body: dict, user: str | None) -> None:
    """Gate a JSON-DSL query body for ``user``. The DSL is read-only by
    construction, and its ``from`` spec NAMES its targets — so this
    check is exact, not lexical: a table name checks a table grant,
    ``{"<fmt>": {"paths": [...]}}`` checks each path. An ``output``
    block writes files, so it stays super-user-only."""
    if user is None:
        return
    cat = engine.catalog._load() if engine.catalog is not None else {}
    a = _auth(cat)
    ident = _resolve_ident(engine, a, user)
    if ident is None:
        raise AuthError(f"unknown user {user!r}")
    if ident.get("super_user"):
        return
    if body.get("output"):
        raise AuthError(
            "operation not permitted: DSL file output requires super-user "
            "privileges"
        )
    # internal temp views leak metadata regardless of enforcement (same
    # unconditional gate as the SQL path)
    spec0 = body.get("from")
    if isinstance(spec0, str) and spec0.lower().startswith("__beacon"):
        raise AuthError(
            "permission denied: internal __beacon* names are super-user-only"
        )
    if not a.get("enforce"):
        return
    roles = ident.get("roles", [])
    # an EXPLICIT "from": null is the same read as an absent key — both
    # make resolve_from fall back to the engine's default table, so both
    # must check it (an early return here was a grant bypass)
    spec = body.get("from")
    if spec is None:
        spec = engine.default_table
    if spec is None:
        return
    if isinstance(spec, str):
        # a time-travel snapshot view (<t>__v<n> of a real catalog
        # table) is a read of its base table — check BOTH names,
        # deny-wins across them, exactly the SQL path's behavior (a
        # REAL table literally named t__v1 keeps its own grants/DENYs)
        targets = {spec}
        base = re.fullmatch(r"(\w+?)__v\d+(?:_\d+)?", spec)
        if base and base.group(1) in cat.get("tables", {}):
            targets.add(base.group(1))
            if spec not in cat.get("tables", {}):
                # a pure snapshot view: only the base name is a catalog
                # object, so only IT carries grants
                targets.discard(spec)
        for target in targets:
            if not is_allowed(a, roles, "SELECT", ("table", target)):
                raise AuthError(
                    f"permission denied: SELECT on table {target!r}")
        return
    if isinstance(spec, dict):
        ((_fmt, cfg),) = spec.items()
        paths = cfg.get("paths") if isinstance(cfg, dict) else None
        if paths is None and isinstance(cfg, dict) and cfg.get("location"):
            paths = [cfg["location"]]
        if isinstance(paths, str):
            # the engine accepts a bare string (resolve_globs wraps it);
            # iterating it here would authorize per CHARACTER
            paths = [paths]
        for p in paths or []:
            # same normalized deny-wins walk as the SQL path — a
            # './x' or absolute spelling must not dodge a DENY
            _check_path(engine, a, roles, str(p))
        if paths:
            return
    # unknown from shape: fail CLOSED, never leak
    raise AuthError("permission denied: unresolvable DSL from target")


# ------------------------------------------------------------ statements

_TARGET = r"(?:\s+ON\s+(?:TABLE\s+(\w+)|PATH\s+'([^']*)'|(ALL)))?"
_AUTH_RES: list[tuple[str, re.Pattern]] = [
    ("create_user", re.compile(
        r"^\s*CREATE\s+USER\s+(\w+)\s+WITH\s+PASSWORD\s+'((?:[^']|'')*)'"
        r"(\s+SUPERUSER)?;?\s*$", re.IGNORECASE)),
    ("drop_user", re.compile(r"^\s*DROP\s+USER\s+(\w+);?\s*$", re.IGNORECASE)),
    ("create_role", re.compile(r"^\s*CREATE\s+ROLE\s+(\w+);?\s*$", re.IGNORECASE)),
    ("drop_role", re.compile(r"^\s*DROP\s+ROLE\s+(\w+);?\s*$", re.IGNORECASE)),
    ("grant_role", re.compile(
        r"^\s*GRANT\s+ROLE\s+(\w+)\s+TO\s+USER\s+(\w+);?\s*$", re.IGNORECASE)),
    ("revoke_role", re.compile(
        r"^\s*REVOKE\s+ROLE\s+(\w+)\s+FROM\s+USER\s+(\w+);?\s*$", re.IGNORECASE)),
    ("grant_priv", re.compile(
        rf"^\s*GRANT\s+(\w+){_TARGET}\s+TO\s+ROLE\s+(\w+);?\s*$", re.IGNORECASE)),
    ("deny_priv", re.compile(
        rf"^\s*DENY\s+(\w+){_TARGET}\s+TO\s+ROLE\s+(\w+);?\s*$", re.IGNORECASE)),
    ("revoke_priv", re.compile(
        rf"^\s*REVOKE\s+(DENY\s+)?(\w+){_TARGET}\s+FROM\s+ROLE\s+(\w+);?\s*$",
        re.IGNORECASE)),
    ("set_enforce", re.compile(
        r"^\s*SET\s+AUTH\s+ENFORCEMENT\s+(ON|OFF);?\s*$", re.IGNORECASE)),
    ("show_users", re.compile(r"^\s*SHOW\s+USERS;?\s*$", re.IGNORECASE)),
    ("show_roles", re.compile(r"^\s*SHOW\s+ROLES;?\s*$", re.IGNORECASE)),
]


def _parse_target(tbl, path, allkw) -> dict | None:
    if tbl:
        return {"table": tbl}
    if path:
        return {"path": path}
    if allkw:
        return {"all": True}
    return None


def _priv(p: str) -> str:
    p = p.upper()
    if p not in PRIVILEGES:
        raise AuthError(f"unknown privilege {p!r}")
    return p


def run_auth_statement(engine, statement: str, user: str | None):
    """Execute an auth-management statement; None when ``statement``
    is not one. Auth DDL itself needs the super-user (the reference
    routes AuthStatement through the same super-user gate)."""
    for kind, rx in _AUTH_RES:
        m = rx.match(statement)
        if m:
            break
    else:
        return None
    cat = engine.catalog._load()
    a = _auth(cat)
    if user is not None:
        ident = _resolve_ident(engine, a, user)
        if ident is None or not ident.get("super_user"):
            raise AuthError(
                "operation not permitted: auth management requires "
                "super-user privileges"
            )

    def save():
        # commit through _mutate (lock + merge-on-conflict): a raw
        # whole-document save here erased concurrent non-auth catalog
        # commits (CREATE TABLE etc.). The auth SECTION replaces
        # wholesale — auth DDL is serialized admin activity, and the
        # merge protects the rest of the catalog.
        auth_doc = cat.get("auth")

        def apply(doc: dict) -> None:
            doc["auth"] = auth_doc

        engine.catalog._mutate(apply)
        engine._cat_sig = None
        # auth changed: the unauthenticated-resolution TTL cache must
        # not serve a pre-change decision in this process
        engine.__dict__.pop("_unauth_cache", None)

    if kind == "create_user":
        name, pw, sup = m.group(1), m.group(2).replace("''", "'"), m.group(3)
        if name in a["users"]:
            raise AuthError(f"user {name!r} already exists")
        a["users"][name] = {
            "password": hash_password(pw),
            "roles": [],
            "super_user": bool(sup),
        }
        save()
        return engine._status(status="ok", op="create_user", name=name)
    if kind == "drop_user":
        if a["users"].pop(m.group(1), None) is None:
            raise AuthError(f"unknown user {m.group(1)!r}")
        save()
        return engine._status(status="ok", op="drop_user", name=m.group(1))
    if kind == "create_role":
        name = m.group(1)
        if name in a["roles"]:
            raise AuthError(f"role {name!r} already exists")
        a["roles"][name] = {"grants": [], "denies": []}
        save()
        return engine._status(status="ok", op="create_role", name=name)
    if kind == "drop_role":
        name = m.group(1)
        if a["roles"].pop(name, None) is None:
            raise AuthError(f"unknown role {name!r}")
        for u in a["users"].values():
            u["roles"] = [r for r in u.get("roles", []) if r != name]
        save()
        return engine._status(status="ok", op="drop_role", name=name)
    if kind == "grant_role":
        role, uname = m.group(1), m.group(2)
        if role not in a["roles"]:
            raise AuthError(f"unknown role {role!r}")
        if uname not in a["users"]:
            raise AuthError(f"unknown user {uname!r}")
        if role not in a["users"][uname]["roles"]:
            a["users"][uname]["roles"].append(role)
        save()
        return engine._status(status="ok", op="grant_role", name=role)
    if kind == "revoke_role":
        role, uname = m.group(1), m.group(2)
        if uname not in a["users"]:
            raise AuthError(f"unknown user {uname!r}")
        a["users"][uname]["roles"] = [
            r for r in a["users"][uname]["roles"] if r != role
        ]
        save()
        return engine._status(status="ok", op="revoke_role", name=role)
    if kind in ("grant_priv", "deny_priv"):
        priv, role = _priv(m.group(1)), m.group(5)
        target = _parse_target(m.group(2), m.group(3), m.group(4))
        if role not in a["roles"]:
            raise AuthError(f"unknown role {role!r}")
        key = "denies" if kind == "deny_priv" else "grants"
        rule = {"privilege": priv, "target": target}
        if rule not in a["roles"][role][key]:
            a["roles"][role][key].append(rule)
        save()
        return engine._status(status="ok", op=kind, name=role)
    if kind == "revoke_priv":
        deny, priv, role = bool(m.group(1)), _priv(m.group(2)), m.group(6)
        target = _parse_target(m.group(3), m.group(4), m.group(5))
        if role not in a["roles"]:
            raise AuthError(f"unknown role {role!r}")
        key = "denies" if deny else "grants"
        rule = {"privilege": priv, "target": target}
        a["roles"][role][key] = [
            r for r in a["roles"][role][key] if r != rule
        ]
        save()
        return engine._status(status="ok", op="revoke_priv", name=role)
    if kind == "set_enforce":
        a["enforce"] = m.group(1).upper() == "ON"
        save()
        return engine._status(
            status="ok", op="set_auth_enforcement",
            name="on" if a["enforce"] else "off",
        )
    if kind == "show_users":
        # is_anonymous marks the unauthenticated-caller principal
        # (context.rs:12; the reference's user listing carries both
        # is_super_user and is_anonymous flags, test_rbac.py:88-95)
        rows = [
            (n, bool(u.get("super_user")), n == "anonymous",
             ",".join(sorted(u.get("roles", []))))
            for n, u in sorted(a["users"].items())
        ]
        return engine.spark.createDataFrame(
            rows,
            "user_name string, super_user boolean, is_anonymous boolean, "
            "roles string",
        )
    if kind == "show_roles":
        rows = [
            (n, len(r.get("grants", [])), len(r.get("denies", [])))
            for n, r in sorted(a["roles"].items())
        ]
        return engine.spark.createDataFrame(
            rows, "role_name string, grants int, denies int"
        )
    return None
