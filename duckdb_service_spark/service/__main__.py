"""Run the engine service: python -m duckdb_service_spark.service
[--addr HOST:PORT] [--warehouse DIR]

Mirrors the reference's single-binary startup (main.go:35-82) minus the
consensus layer: one SparkSession, one warehouse, one HTTP listener.
"""

from __future__ import annotations

import argparse
import os


def main() -> None:
    ap = argparse.ArgumentParser(description="duckdb-service-spark engine")
    ap.add_argument("--addr", default="127.0.0.1:4001")
    ap.add_argument("--warehouse", default=os.path.expanduser("~/.duckdb_service_spark"))
    args = ap.parse_args()
    host, _, port = args.addr.partition(":")

    from ..session import get_spark
    from .executor import Engine
    from .http_server import EngineHTTPServer

    spark = get_spark("duckdb-service-spark")
    engine = Engine(spark, args.warehouse)
    srv = EngineHTTPServer(engine, host=host, port=int(port or 0)).start()
    print(f"listening on http://{srv.host}:{srv.port} warehouse={args.warehouse}", flush=True)
    try:
        srv._thread.join()
    except KeyboardInterrupt:
        srv.stop()


if __name__ == "__main__":
    main()
