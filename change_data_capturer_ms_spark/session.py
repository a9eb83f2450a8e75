"""SparkSession construction with engine-tuned defaults.

The session is the engine's `connect` step (reference `mongoConnect`/`cosmosConnect`,
/root/reference/src/capturer/mongo/utils.ts:15-19). Defaults are chosen for the
large-cluster execution model and only scaled down by callers for local tests:

- AQE on (runtime re-plan: skew-join split, partition coalescing),
- Arrow on (pandas UDF hot path is Arrow-batched, never per-row pickle),
- shuffle partitions explicit (prod: ~2-3x total cores; AQE coalesces down).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "change-data-capturer-ms-spark",
    master: str | None = None,
    shuffle_partitions: int = 32,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    conf = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        # parquet scan: vectorized reader + pushdown are defaults; keep explicit so a
        # misconfigured cluster profile can't silently disable them
        "spark.sql.parquet.filterPushdown": "true",
        "spark.sql.parquet.enableVectorizedReader": "true",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.driver.memory": "8g",
        # v2 committer: per-task direct rename instead of a sequential driver-side
        # move of every partition dir — cuts partitioned-write commit latency and
        # at cluster scale removes the O(files) driver bottleneck
        "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "2",
        # keep Python workers warm between Arrow UDF stages
        "spark.python.worker.reuse": "true",
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
