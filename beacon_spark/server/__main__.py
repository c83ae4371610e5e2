"""Launch a serving engine: ``python -m beacon_spark.server --root /data``.

The Spark analog of running the reference's server binary
(``beacon-server/src/main.rs:71``): one Spark session + Engine serving
HTTP (/api/* + /mcp) and Arrow Flight simultaneously until interrupted.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="beacon_spark.server",
        description="Serve a beacon_spark Engine over HTTP + Arrow Flight",
    )
    ap.add_argument("--root", required=True,
                    help="datasets root (local dir or object-store URI)")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--http-port", type=int, default=8280)
    ap.add_argument("--flight-port", type=int, default=50051)
    ap.add_argument("--token", default=None, help="bearer token (both transports)")
    ap.add_argument("--master", default="local[*]")
    ap.add_argument("--max-rows", type=int, default=1_000_000,
                    help="per-query row cap (0 = unlimited)")
    ap.add_argument("--max-bytes", type=int, default=256 << 20,
                    help="per-query byte cap (0 = unlimited)")
    ap.add_argument("--timeout-seconds", type=float, default=None,
                    help="per-query time budget (default: none)")
    args = ap.parse_args(argv)

    from beacon_spark.engine import Engine
    from beacon_spark.server.flight import BeaconFlightServer
    from beacon_spark.server.http import BeaconHttpServer
    from beacon_spark.server.limits import QueryLimits
    from beacon_spark.session import get_spark

    spark = get_spark(app_name="beacon_spark_server", master=args.master)
    engine = Engine(spark, datasets_root=args.root)
    limits = QueryLimits(
        max_rows=args.max_rows or None,
        max_bytes=args.max_bytes or None,
        timeout_seconds=args.timeout_seconds,
    )

    http_srv = BeaconHttpServer(
        engine, host=args.host, port=args.http_port, token=args.token,
        limits=limits,
    )
    flight_srv = BeaconFlightServer(
        engine, host=args.host, port=args.flight_port, token=args.token,
        limits=limits,
    )
    hp = http_srv.serve_background()
    fp = flight_srv.serve_background()
    print(f"http   : http://{args.host}:{hp}/api/query  (+ /mcp)", flush=True)
    print(f"flight : grpc://{args.host}:{fp}", flush=True)
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
