"""Launch a serving engine: ``python -m beacon_spark.server --root /data``.

The Spark analog of running the reference's server binary
(``beacon-server/src/main.rs:71``): one Spark session + Engine serving
HTTP (/api/* + /api/admin/* + /mcp) and Arrow Flight simultaneously
until interrupted.

Configuration follows the reference's envconfig pattern
(``beacon-server/beacon-server-config/src/lib.rs``): every flag has a
``BEACON_SPARK_*`` environment-variable default, so containerized
deployments configure the server without a command line. Flags win
over environment, environment over built-ins.

Reference-config parity notes:
  - ``--admin-username/--admin-password`` (AdminConfig) seed a
    SUPERUSER account at startup (idempotent - the password is reset
    to the configured one, the reference re-seeds the same way).
  - ``--auth-enforce`` (AuthConfig.enforce) switches on query-time
    read authorization; off keeps the backwards-compatible
    super-user-gate-only mode.
  - ``--crawler-daemon`` (CrawlerConfig) starts the background sweep
    that runs due crawlers on schedule.
  - ``--oidc-issuer/--oidc-jwks`` (OidcConfig) turn on offline
    OIDC bearer-JWT validation (server/oidc.py, RFC 7515/7517 RS256):
    the JWKS is a CONFIGURED local document rather than a fetched URL
    (outbound HTTPS is a deployment concern; discovery documents can be
    mirrored next to the config), tokens map to external principals
    whose roles ride the local grant model.
"""

from __future__ import annotations

import argparse
import os
import sys


def _env(name: str, default=None):
    return os.environ.get(f"BEACON_SPARK_{name}", default)


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="beacon_spark.server",
        description="Serve a beacon_spark Engine over HTTP + Arrow Flight",
    )
    ap.add_argument("--root", default=_env("ROOT"),
                    help="datasets root (local dir or object-store URI) "
                         "[env BEACON_SPARK_ROOT]")
    ap.add_argument("--host", default=_env("HOST", "127.0.0.1"))
    ap.add_argument("--http-port", type=int,
                    default=int(_env("HTTP_PORT", 8280)))
    ap.add_argument("--flight-port", type=int,
                    default=int(_env("FLIGHT_PORT", 50051)))
    ap.add_argument("--token", default=_env("TOKEN"),
                    help="bearer token (both transports) "
                         "[env BEACON_SPARK_TOKEN]")
    ap.add_argument("--master", default=_env("MASTER", "local[*]"))
    ap.add_argument("--max-rows", type=int,
                    default=int(_env("MAX_ROWS", 1_000_000)),
                    help="per-query row cap (0 = unlimited)")
    ap.add_argument("--max-bytes", type=int,
                    default=int(_env("MAX_BYTES", 256 << 20)),
                    help="per-query byte cap (0 = unlimited)")
    ap.add_argument("--timeout-seconds", type=float,
                    default=float(_env("TIMEOUT_SECONDS", 0)) or None,
                    help="per-query time budget (default: none)")
    ap.add_argument("--admin-username", default=_env("ADMIN_USERNAME"),
                    help="seed this SUPERUSER at startup "
                         "[env BEACON_SPARK_ADMIN_USERNAME]")
    ap.add_argument("--admin-password", default=_env("ADMIN_PASSWORD"),
                    help="[env BEACON_SPARK_ADMIN_PASSWORD]")
    ap.add_argument("--auth-enforce", action="store_true",
                    default=_env("AUTH_ENFORCE", "").lower()
                    in ("1", "true", "yes"),
                    help="enable query-time read authorization "
                         "[env BEACON_SPARK_AUTH_ENFORCE]")
    ap.add_argument("--crawler-daemon", action="store_true",
                    default=_env("CRAWLER_DAEMON", "").lower()
                    in ("1", "true", "yes"),
                    help="run due crawlers on schedule in the background "
                         "[env BEACON_SPARK_CRAWLER_DAEMON]")
    ap.add_argument("--crawler-poll-seconds", type=float,
                    default=float(_env("CRAWLER_POLL_SECONDS", 60)))
    ap.add_argument("--cors-origins", default=_env("CORS_ORIGINS"),
                    help="enable CORS for these origins ('*' or a "
                         "comma list) [env BEACON_SPARK_CORS_ORIGINS]")
    ap.add_argument("--default-table", default=_env("DEFAULT_TABLE"),
                    help="table the DSL queries when no from-spec is "
                         "given (BEACON_DEFAULT_TABLE) "
                         "[env BEACON_SPARK_DEFAULT_TABLE]")
    ap.add_argument("--enable-sys-info", action="store_true",
                    default=str(_env("ENABLE_SYS_INFO", "false")).lower()
                    in ("true", "1", "yes"),
                    help="include a host resource snapshot in /api/info "
                         "(the reference's BEACON_ENABLE_SYS_INFO) "
                         "[env BEACON_SPARK_ENABLE_SYS_INFO]")
    ap.add_argument("--oidc-issuer", default=_env("OIDC_ISSUER"),
                    help="expected iss claim; enables OIDC bearer-JWT "
                         "auth with --oidc-jwks "
                         "[env BEACON_SPARK_OIDC_ISSUER]")
    ap.add_argument("--oidc-jwks", default=_env("OIDC_JWKS"),
                    help="path to the issuer's JWKS JSON document "
                         "[env BEACON_SPARK_OIDC_JWKS]")
    ap.add_argument("--oidc-audience", default=_env("OIDC_AUDIENCE"),
                    help="expected aud claim (default: not checked)")
    ap.add_argument("--oidc-username-claim",
                    default=_env("OIDC_USERNAME_CLAIM",
                                 "preferred_username"))
    ap.add_argument("--oidc-roles-claim",
                    default=_env("OIDC_ROLES_CLAIM", "realm_access.roles"))
    ap.add_argument("--disable-sql", action="store_true",
                    default=str(_env("ENABLE_SQL", "true")).lower()
                    in ("false", "0", "no"),
                    help="reject raw SQL on /api/query; the JSON DSL "
                         "keeps working (the reference's "
                         "BEACON_ENABLE_SQL=false) "
                         "[env BEACON_SPARK_ENABLE_SQL]")
    return ap


def launch(args, spark=None):
    """Build the engine and both servers from parsed ``args`` and start
    them in the background. → (spark, engine, http_srv, flight_srv).
    Split from :func:`main` so tests can drive a fully-configured server
    on ephemeral ports."""
    from beacon_spark.engine import Engine
    from beacon_spark.server.flight import BeaconFlightServer
    from beacon_spark.server.http import BeaconHttpServer
    from beacon_spark.server.limits import QueryLimits
    from beacon_spark.session import get_spark

    if args.root is None:
        raise SystemExit("--root (or BEACON_SPARK_ROOT) is required")
    root = args.root
    if root.endswith(".db") and not os.path.isdir(root) and "://" not in root:
        # a single-file container database served over the network — the
        # reference's beacon.db behind beacon-server (embedded.rs:28-30:
        # "a beacon.db governed by a server")
        from beacon_spark.sources.container import container_uri

        root = container_uri(root)
    if spark is None:
        spark = get_spark(app_name="beacon_spark_server", master=args.master)
    engine = Engine(spark, datasets_root=root,
                    default_table=args.default_table)

    if args.admin_username:
        if not args.admin_password:
            raise SystemExit("--admin-username needs --admin-password")
        from beacon_spark import auth as _auth

        pw_hash = _auth.hash_password(args.admin_password)

        def seed(doc: dict) -> None:
            auth_doc = doc.setdefault("auth", {})
            seeded = auth_doc.setdefault("users", {})
            e = seeded.setdefault(args.admin_username, {"roles": []})
            # idempotent re-seed: password reset to the configured one,
            # super-user bit always on (the reference seeds AdminConfig
            # the same way on every boot). Rides _mutate so boot-time
            # seeding can't erase a concurrent engine's catalog commit.
            e["password"] = pw_hash
            e["super_user"] = True
            auth_doc.setdefault("roles", {})
            auth_doc.setdefault("enforce", False)

        engine.catalog._mutate(seed)
    if args.auth_enforce:
        engine.sql("SET AUTH ENFORCEMENT ON")
    if args.crawler_daemon:
        engine.start_crawler_scheduler(poll_secs=args.crawler_poll_seconds)

    oidc = None
    if args.oidc_issuer or args.oidc_jwks:
        if not (args.oidc_issuer and args.oidc_jwks):
            raise SystemExit("--oidc-issuer and --oidc-jwks go together")
        from beacon_spark.server.oidc import OidcValidator

        oidc = OidcValidator(
            issuer=args.oidc_issuer,
            jwks=args.oidc_jwks,
            audience=args.oidc_audience,
            username_claim=args.oidc_username_claim,
            roles_claim=args.oidc_roles_claim,
        )

    limits = QueryLimits(
        max_rows=args.max_rows or None,
        max_bytes=args.max_bytes or None,
        timeout_seconds=args.timeout_seconds,
    )
    http_srv = BeaconHttpServer(
        engine, host=args.host, port=args.http_port, token=args.token,
        limits=limits,
        cors=({"allowed_origins": args.cors_origins}
              if args.cors_origins else None),
        enable_sql=not args.disable_sql,
        sys_info=args.enable_sys_info,
        oidc=oidc,
    )
    flight_srv = BeaconFlightServer(
        engine, host=args.host, port=args.flight_port, token=args.token,
        limits=limits, oidc=oidc,
    )
    http_srv.serve_background()
    flight_srv.serve_background()
    return spark, engine, http_srv, flight_srv


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    spark, _engine, http_srv, flight_srv = launch(args)
    print(f"http   : http://{args.host}:{http_srv.port}/api/query  "
          f"(+ /api/admin, /mcp)", flush=True)
    print(f"flight : grpc://{args.host}:{flight_srv.port}", flush=True)
    try:
        flight_srv._thread.join()
    except KeyboardInterrupt:
        pass
    finally:
        http_srv.shutdown()
        flight_srv.shutdown()
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
