"""Run the HTTP search service (the reference's `npm start` equivalent).

    python jobs/serve.py --root /data/indexes --port 8080 \
        [--register name=/data/pages ...] [--cores 8]

Starts the stdlib ThreadingHTTPServer facade (search_engine_spark.server)
over an IndexCatalog root. Indexes created earlier (POST /index or
jobs/build_index.py into <root>/<name>) are listed by GET /; docs tables
for pre-existing indexes must be registered with --register so the Spark
fallback path and enrichment can reach the source rows. Endpoints:

    GET  /                      health + index listing
    POST /search/<name>         {query, from, size, aggregations}
    POST /index                 {indexName, docsPath, fields?, facetFields?}
    POST /index/<name>/documents  {documents: [...]} (LSM append)
    POST /index/<name>/snapshot   block + doc-values snapshot
    POST /index/<name>/flush      compact LSM runs
    GET  /performance           process metrics incl. served_by_blocks

Queries served off a fresh snapshot (the whole DSL + aggregations +
facets) answer in ~2-3 ms over the wire; everything else runs as a Spark
job (seconds). Auto-persistence is ON here (--no-auto-persist to opt
out): appends trigger an INCREMENTAL snapshot refresh after
--auto-batch-size docs or --auto-interval seconds (AutoPersistenceManager
parity), so the fast path stays warm without a manual POST /snapshot.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True, help="index catalog root dir")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    ap.add_argument("--register", action="append", default=[],
                    metavar="NAME=PARQUET_DIR",
                    help="register a docs table for an existing index "
                         "(repeatable)")
    ap.add_argument("--no-auto-persist", action="store_true",
                    help="disable the auto snapshot-refresh policy")
    ap.add_argument("--auto-batch-size", type=int, default=100,
                    help="refresh after this many appended docs")
    ap.add_argument("--auto-interval", type=float, default=30.0,
                    help="refresh pending appends after this many seconds")
    args = ap.parse_args(argv)

    from search_engine_spark.server import SearchService, make_server
    from search_engine_spark.session import get_spark

    spark = get_spark("serve", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    svc = SearchService(spark, args.root, auto_persist={
        "enabled": not args.no_auto_persist,
        "batch_size": args.auto_batch_size,
        "interval": args.auto_interval,
    })
    for spec in args.register:
        name, _, path = spec.partition("=")
        if not path:
            ap.error(f"--register needs NAME=PARQUET_DIR, got {spec!r}")
        svc.register_docs(name, spark.read.parquet(path))
    if not args.no_auto_persist:
        # the reference's setInterval auto-save timer
        # (AutoPersistenceManager.ts:30-38) as a daemon thread: flushes
        # indexes whose appends never crossed batch_size
        import threading

        def _tick():
            import time as _t
            while True:
                _t.sleep(max(args.auto_interval / 2, 1.0))
                try:
                    svc.maybe_auto_save()
                except Exception as e:  # noqa: BLE001 — keep ticking
                    print(f"auto-persist tick failed: {e}", flush=True)

        threading.Thread(target=_tick, daemon=True).start()
    httpd = make_server(svc, host=args.host, port=args.port)
    host, port = httpd.server_address[:2]
    print(f"serving on http://{host}:{port} (root={args.root}, "
          f"indexes={svc.catalog.list_indexes()})", flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
        spark.stop()


if __name__ == "__main__":
    main()
