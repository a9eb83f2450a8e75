"""spark-submit entry point for the CDC engine.

Production shape (north_rule: `spark-submit --py-files` on a multi-executor
cluster):

    zip -r engine.zip change_data_capturer_ms_spark
    spark-submit --py-files engine.zip main.py \
        --log /data/changelog --table /lake/repos --checkpoint /ckpt/repos \
        --key-cols repo,path --n-buckets 4096 --max-files-per-trigger 64

Boot order mirrors the reference service (/root/reference/src/index.ts:1-5 →
createApp eager-config-or-throw, src/utils/configReader.ts:38-44): validate
config first, then build the session, then start the streaming query. Per-batch
health/metrics are the `_lease/*.json` documents; `--serve-port` additionally
serves the reference's HTTP surface (GET /info -> {"status": "OK"},
src/app.ts:23-25) plus a live GET /status with the lease (health.py).

On a cluster, do NOT pass --master/--cores here; spark-submit owns cluster conf.
EngineConfig also reads CDC_* environment variables (configReader parity).
"""

from __future__ import annotations

import argparse
import json
import sys


def parse_args(argv: list[str]) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="CDC change-log -> lake MERGE pipeline")
    p.add_argument("--log", required=True, help="change-log directory (parquet)")
    p.add_argument("--table", required=True, help="lake table root directory")
    p.add_argument("--checkpoint", required=True, help="streaming checkpoint dir")
    p.add_argument("--key-cols", default="repo,path")
    p.add_argument("--source-id", default="changelog")
    p.add_argument("--n-buckets", type=int, default=None,
                   help="override CDC_N_BUCKETS for fresh tables")
    p.add_argument("--max-files-per-trigger", type=int, default=None)
    p.add_argument("--once", action="store_true",
                   help="drain available data then exit (availableNow); default")
    p.add_argument("--builtin-udfs", action="store_true",
                   help="use JVM builtin expressions instead of pandas UDFs")
    p.add_argument("--no-flatten", action="store_true")
    p.add_argument("--queue", default=None,
                   help="optional queue-json sink dir: every applied batch is "
                        "also produced as JSON message envelopes (K3/K4)")
    p.add_argument("--quarantine", default=None,
                   help="optional DLQ dir: schema-on-read validation split")
    p.add_argument("--serve-port", type=int, default=None,
                   help="serve the A1 health endpoint (GET /info -> "
                        '{"status": "OK"}, GET /status -> live lease) on '
                        "this port for the duration of the run")
    p.add_argument("--serve-host", default="0.0.0.0",
                   help="health endpoint bind address (default 0.0.0.0 — "
                        "the reference's app.listen(port) binds all "
                        "interfaces so external liveness probes can reach "
                        "the driver; pass 127.0.0.1 to keep it local)")
    p.add_argument("--master", default=None,
                   help="local testing only, e.g. local[8]")
    p.add_argument("--profile", default=None,
                   help="named Spark conf profile (session.py PROFILES), "
                        "e.g. 'cluster' = zstd lake + shuffle IO for "
                        "object-storage deployments (README knob table)")
    return p.parse_args(argv)


def main(argv: list[str] | None = None) -> int:
    args = parse_args(argv if argv is not None else sys.argv[1:])

    # 1) config: decode-or-throw before anything else (configReader.ts parity)
    from change_data_capturer_ms_spark.config import EngineConfig

    cfg = EngineConfig.from_env()
    if args.n_buckets:
        cfg = EngineConfig(**{**cfg.__dict__, "n_buckets": args.n_buckets})

    # 2) session
    from change_data_capturer_ms_spark.session import get_spark

    spark = get_spark(app_name="cdc-apply", master=args.master,
                      shuffle_partitions=cfg.shuffle_partitions,
                      profile=args.profile)

    # 3) resolve sink + pipeline through the registries (factory.ts parity)
    from change_data_capturer_ms_spark.sources import create_sink
    from change_data_capturer_ms_spark.streaming import CDCPipeline

    table = create_sink("lake-parquet", spark, args.table,
                        key_cols=tuple(args.key_cols.split(",")),
                        n_buckets=cfg.n_buckets)
    queue_sink = (create_sink("queue-json", spark, args.queue,
                              key_cols=tuple(args.key_cols.split(",")))
                  if args.queue else None)
    pipe = CDCPipeline(
        spark, args.log, table, args.checkpoint,
        source_id=args.source_id, cfg=cfg,
        use_pandas_udfs=not args.builtin_udfs,
        flatten_props=not args.no_flatten,
        quarantine_dir=args.quarantine,
        queue_sink=queue_sink,
    )
    health = None
    if args.serve_port is not None:
        from change_data_capturer_ms_spark.health import HealthServer

        health = HealthServer(
            args.serve_port,
            status_provider=lambda: {"lease": pipe.current_lease()},
            host=args.serve_host,
        ).start()
    try:
        pipe.run_stream(max_files_per_trigger=args.max_files_per_trigger)
        lease = pipe.current_lease()
        print(json.dumps({"status": "OK", "lease": lease}, default=str))
    finally:
        if health is not None:
            health.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
