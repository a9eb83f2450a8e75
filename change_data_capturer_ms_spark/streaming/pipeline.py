"""The CDC pipeline: change-log tail → transform → MERGE apply → lease.

Re-expression of the reference's two service loops under one Structured Streaming
shape (SURVEY.md §3.2/§3.3 — push vs pull collapse into the micro-batch trigger):

reference (Cosmos pull loop, /root/reference/src/capturer/cosmos/cosmos.ts:51-112):
    for await page:  skip NotModified → processResults(page) → upsert lease
engine:
    readStream(log) → foreachBatch: prepare (filter/classify/flatten/hash, Arrow UDFs
    over salted partitions) → LakeTable.merge (idempotent, exactly-once) → lease JSON

Ordering note: the reference commits the lease *after* processing (at-least-once
delivery); we keep commit-after-apply but the apply itself is idempotent on batch_id,
upgrading the loop to exactly-once (SURVEY.md §2.2 E21). The Structured Streaming
checkpoint is the machine-readable resume state (reference resumeAfter token,
mongo.ts:65-88); the `_lease/*.json` files keep the reference's *inspectable* lease
contract {id, lease} (/root/reference/src/factory/types.ts:7-12) extended with
batch_id, per-partition lineage and metrics (north_star).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from change_data_capturer_ms_spark.config import EngineConfig
from change_data_capturer_ms_spark.functions.classify import classify_op_pandas, classify_op_builtin
from change_data_capturer_ms_spark.functions.flatten import flatten_json_col, PROPS_SCHEMA
from change_data_capturer_ms_spark.functions.hashing import (
    content_sha256_builtin,
    content_sha256_pandas,
)
from change_data_capturer_ms_spark.lake.table import LakeTable
from change_data_capturer_ms_spark.operators.dedupe import salted_repartition
from change_data_capturer_ms_spark.sources.changelog import ChangeLogReader

# Semantic version of the APPLY pipeline's WORK (what a timed run measures).
# Bump whenever prepare/merge semantics change the amount or kind of work per
# event — bench probe records carry this stamp and throughput folds ONLY
# within a matching stamp (BENCH/probes.jsonl history spanning a semantics
# change would otherwise report the lighter pipeline's best as the current
# engine's capability). r3c: op_class persists as a payload column, so the
# classify UDF is real per-event work (pre-r3c history measured a pipeline
# where Catalyst pruned it as dead code).
APPLY_SEMVER = "r3c"


def _hist_batch_id(p: str) -> int:
    """Commit order of a lease-history ring file (batch_<id>.json) from its
    PARSED batch id — the single ordering key shared by the ring pruner and
    monitor_drift, so retention and PSI pairing can never disagree.
    Malformed names sort first (pruned first, skipped as non-monitor
    payloads by readers)."""
    try:
        return int(os.path.basename(p)[len("batch_"):-len(".json")])
    except ValueError:
        return -1


def prepare_batch(
    df: DataFrame,
    cfg: EngineConfig | None = None,
    use_pandas_udfs: bool = True,
    flatten_props: bool = False,
) -> DataFrame:
    """Capture-side transform: op filter → salted repartition → classify + hash
    (Arrow UDFs) → optional flatten. Returns a merge-ready frame.

    - op filter: server-side $match parity (mongo.ts:21-25), pushed into the scan.
    - salted repartition: spreads a hot repo over salt_buckets partitions before the
      Python-worker stage; salt is a pure function of (repo, path) so per-key
      semantics downstream are unchanged (E17).
    - classify/hash: pandas/Arrow UDFs per north_star; builtin twins available for
      max-throughput deployments (use_pandas_udfs=False).
    """
    cfg = cfg or EngineConfig()
    out = df.filter(F.col("op").isin(*cfg.captured_ops))
    out = salted_repartition(out, hot_cols=["repo"], salt_cols=["path"],
                             salt_buckets=cfg.salt_buckets)
    classify = classify_op_pandas if use_pandas_udfs else classify_op_builtin
    sha = content_sha256_pandas if use_pandas_udfs else content_sha256_builtin
    out = out.withColumn("op_class", classify("op"))
    out = out.withColumn(
        "content_sha256",
        F.when(F.col("content").isNull(), F.lit(None).cast("string"))
         .otherwise(sha("content")),
    )
    if flatten_props:
        out = flatten_json_col(out, "props", PROPS_SCHEMA, prefix="p_", drop_source=True)
    # op_class PERSISTS as a payload column (the merge-action class consumers
    # filter on) — dropping it here would let Catalyst prune the classify UDF
    # entirely, making the advertised classify stage dead work. seq_bucket is
    # the LOG's partition column; it must not leak into the table payload.
    drop = [c for c in ("seq_bucket",) if c in out.columns]
    return out.drop(*drop)


class CDCPipeline:
    """End-to-end engine loop over one source table (reference ICDCService,
    /root/reference/src/factory/service.ts:32-41)."""

    def __init__(
        self,
        spark: SparkSession,
        log_path: str,
        table: LakeTable,
        checkpoint_dir: str,
        source_id: str = "changelog",
        cfg: EngineConfig | None = None,
        use_pandas_udfs: bool = True,
        collect_lineage: bool = True,
        flatten_props: bool = False,
        quarantine_dir: str | None = None,
        queue_sink=None,
        monitor_cols: list[str] | None = None,
        monitor_top_k: int = 20,
        audit_fn=None,
        wap_branch: str | None = None,
        event_dedup_watermark: str | None = None,
    ):
        self.spark = spark
        self.reader = ChangeLogReader(spark, log_path)
        self.table = table
        self.checkpoint_dir = checkpoint_dir
        self.source_id = source_id
        self.cfg = cfg or EngineConfig()
        self.use_pandas_udfs = use_pandas_udfs
        self.collect_lineage = collect_lineage
        self.flatten_props = flatten_props
        self.quarantine_dir = quarantine_dir
        # optional downstream queue (reference topology: capture → queue produce,
        # src/factory/service.ts + src/queue/*): each applied micro-batch is also
        # produced as JSON envelopes, idempotent on (source_id, batch_id)
        self.queue_sink = queue_sink
        # per-batch distribution monitor: top-K category counts of each listed
        # column ride the inspectable lease, so drift scoring over batches
        # (operators/drift.py psi_from_counts) costs zero further Spark jobs.
        # One extra column-pruned scan + map-side-combined groupBy + top-K per
        # column per batch — opt in for low-cardinality columns (lang, op).
        self.monitor_cols = list(monitor_cols or [])
        self.monitor_top_k = monitor_top_k
        # write-audit-publish gate: audit_fn(table, merge_result) runs AFTER the
        # merge commit but BEFORE the lease advances or the queue produces;
        # returning False / a reason string rolls the table back to the parent
        # snapshot (manifest-only — no data rewrite, and the rollback restores
        # the exactly-once ledger so the batch can legally re-apply later) and
        # quarantines the batch rows for replay_quarantine. Iceberg's
        # WAP / branch-validate-publish pattern on the engine's own primitives.
        self.audit_fn = audit_fn
        # wap_branch (requires audit_fn): stage each micro-batch's MERGE on a
        # BRANCH cut at the main head, audit the branch, and publish via
        # metadata-only fast_forward — main never exposes an unaudited
        # snapshot, not even transiently (the rollback-shaped gate above
        # commits to main first, so a concurrent reader could glimpse the
        # rejected snapshot between commit and rollback). Iceberg's
        # branch-WAP layout proper; a failed audit just drops the branch.
        if wap_branch is not None and audit_fn is None:
            raise ValueError("wap_branch requires audit_fn")
        self.wap_branch = wap_branch
        # at-least-once transport guard (operators/dedupe.py
        # streaming_dedupe_within_watermark): drop events whose identity
        # (`seq`) was already observed within the window, BEFORE the batch
        # pipeline — redelivered events are harmless to LWW state but inflate
        # metrics/audit/drift inputs and burn merge work
        self.event_dedup_watermark = event_dedup_watermark
        self.lease_dir = os.path.join(table.path, "_lease")

    # -- lease (inspectable resume state) ------------------------------------

    def _write_lease(self, lease: dict) -> None:
        """Mirror of the reference lease upsert: one doc per source id, LWW
        (cosmos.ts:91-105), plus a bounded per-batch history RING for audit
        and drift scoring (cfg.lease_history_keep): millions of micro-batches
        must not mean millions of sidecar files — boundedness is a soak
        invariant (tests/test_soak.py)."""
        os.makedirs(self.lease_dir, exist_ok=True)
        hist = os.path.join(self.lease_dir, f"batch_{lease['batch_id']}.json")
        cur_tmp = os.path.join(self.lease_dir, "_current.tmp")
        cur = os.path.join(self.lease_dir, f"{self.cfg.lease_prefix}.json")
        payload = json.dumps(lease, default=str, indent=1)
        with open(hist, "w") as f:
            f.write(payload)
        with open(cur_tmp, "w") as f:
            f.write(payload)
        os.replace(cur_tmp, cur)  # atomic LWW upsert on id
        self._prune_lease_history()

    def _prune_lease_history(self) -> None:
        """Drop history entries beyond the newest cfg.lease_history_keep
        batches (by batch id — resume-safe: ids are the stream's global
        micro-batch counter, monotone across restarts)."""
        import glob as _glob

        hist_files = _glob.glob(os.path.join(self.lease_dir, "batch_*.json"))
        keep = self.cfg.lease_history_keep
        if len(hist_files) <= keep:
            return
        for p in sorted(hist_files, key=_hist_batch_id)[:-keep]:
            try:
                os.remove(p)
            except OSError:
                pass  # concurrent prune/inspection; the ring stays bounded

    def current_lease(self) -> dict | None:
        """Decode-or-None: a corrupt or schema-drifted lease file reads as None
        (⇒ the caller starts from the beginning), never an exception — the
        reference's io-ts decode of the lease item behaves exactly this way
        (/root/reference/src/capturer/cosmos/utils.ts:76-91)."""
        cur = os.path.join(self.lease_dir, f"{self.cfg.lease_prefix}.json")
        if not os.path.exists(cur):
            return None
        try:
            with open(cur) as f:
                payload = json.load(f)
        except (json.JSONDecodeError, OSError, UnicodeDecodeError):
            return None
        return payload if isinstance(payload, dict) else None

    def monitor_drift(self, col: str) -> list[dict]:
        """PSI of `col`'s captured-batch mix between consecutive committed
        batches, computed from the lease history files alone — zero Spark
        jobs (the counts were folded during each batch's own commit; enable
        with `monitor_cols=[col]`). Returns `[{batch_id, psi}]` in commit
        order; alert on the conventional psi > 0.2 threshold."""
        import glob as _glob

        from change_data_capturer_ms_spark.operators.drift import psi_from_counts

        # order by PARSED batch id — the same key the ring pruner uses —
        # never file mtime: after a prune + restore/copy (or coarse mtime
        # granularity) mtime order can diverge from commit order and pair
        # non-consecutive batches in the PSI
        files = sorted(
            _glob.glob(os.path.join(self.lease_dir, "batch_*.json")),
            key=_hist_batch_id,
        )
        out: list[dict] = []
        prev = None
        for p in files:
            try:
                with open(p) as f:
                    payload = json.load(f)
            except (json.JSONDecodeError, OSError):
                continue  # decode-or-skip, same posture as current_lease
            cur = (payload.get("monitor") or {}).get(col)
            if cur is None:
                continue
            if prev is not None:
                out.append({"batch_id": payload.get("batch_id"),
                            "psi": psi_from_counts(prev, cur)})
            prev = cur
        return out

    # -- apply ----------------------------------------------------------------

    def _quarantine_audit_reject(self, batch_df: DataFrame, batch_id,
                                 reason: str) -> None:
        """Audit-rejected batch rows go to the DLQ for replay_quarantine; with
        no DLQ configured, refuse loudly rather than drop the batch silently."""
        if self.quarantine_dir:
            captured = batch_df.filter(F.col("op").isin(*self.cfg.captured_ops))
            (captured
             .withColumn("_reasons", F.array(F.lit(f"audit:{reason}")))
             .withColumn("_batch_id", F.lit(batch_id))
             .write.mode("append").parquet(self.quarantine_dir))
        else:
            raise RuntimeError(
                f"audit failed for batch {batch_id} ({reason}) and no "
                "quarantine_dir is configured — refusing to drop the "
                "batch silently")

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> dict:
        """foreachBatch body: [validate →] prepare → merge (idempotent) → lease."""
        # exactly-once short-circuit FIRST: a batch redelivered after a crash
        # between the merge commit and the streaming checkpoint would otherwise
        # (a) append its invalid rows to the DLQ a second time — every
        # still-quarantined row counted and replayed twice forever — and
        # (b) burn the full validate + planning scan before merge() no-ops.
        if self.table.exists():
            m0 = self.table.manifest()
            if m0.is_committed(self.source_id, batch_id):
                return {"skipped": True, "version": m0.version,
                        "batch_id": batch_id}
        if self.quarantine_dir:
            # schema-on-read enforcement (reference io-ts decode-or-Left,
            # cosmos/utils.ts:76-91): invalid rows go to the DLQ, valid rows on
            from change_data_capturer_ms_spark.functions.validate import validate_batch

            batch_df, quarantine = validate_batch(batch_df)
            (quarantine.withColumn("_batch_id", F.lit(batch_id))
             .write.mode("append").parquet(self.quarantine_dir))
        prepared = prepare_batch(batch_df, self.cfg, self.use_pandas_udfs,
                                 flatten_props=self.flatten_props)
        if not self.table.exists():
            # CREATE TABLE IF NOT EXISTS semantics (reference getOrCreateMongoCollection,
            # /root/reference/src/capturer/mongo/utils.ts:51-70): payload schema =
            # prepared minus the seq/op control columns
            from pyspark.sql import types as T
            payload = [f for f in prepared.schema.fields if f.name not in ("seq", "op")]
            self.table.create(T.StructType(payload))

        # ONE cheap planning job over pruned raw columns yields BOTH the
        # per-input-partition lineage (north_star) and the per-bucket stats the
        # MERGE needs — via GROUPING SETS ((p), (_bucket)), so the collect is
        # bounded by partitions + buckets rows (NOT their cross product: at the
        # 100 TB config — O(10^4-10^5) buckets × thousands of input partitions —
        # the old (p, bucket) grouping would be a multi-GB driver collect).
        # Still a single shuffle/job; the Arrow-UDF transform is untouched here
        # (columns pruned) and runs only in the MERGE write job.
        from change_data_capturer_ms_spark.lake.table import bucket_expr

        m = self.table.manifest()  # bucket layout is the manifest's, not cfg's
        keys = m.key_cols
        pre = (
            batch_df.filter(F.col("op").isin(*self.cfg.captured_ops))
            .select(*keys, "seq")
            .withColumn("_bucket", bucket_expr(m.bucket_key, m.n_buckets))
            .withColumn("p", F.spark_partition_id())
        )
        rows = (
            pre.groupingSets([["p"], ["_bucket"]], "p", "_bucket")
            .agg(F.min("seq").alias("lo"), F.max("seq").alias("hi"),
                 F.count(F.lit(1)).alias("n"),
                 F.grouping_id().alias("gid"))  # 1 ⇒ per-partition, 2 ⇒ per-bucket
            .collect()
        )
        lineage = None
        if self.collect_lineage:
            lineage = [
                {"partition": int(r["p"]), "first_seq": int(r["lo"]),
                 "last_seq": int(r["hi"]), "rows": int(r["n"])}
                for r in sorted((r for r in rows if r["gid"] == 1),
                                key=lambda r: int(r["p"]))
            ]
        planning_stats = [
            (int(r["_bucket"]), int(r["n"]), int(r["hi"]))
            for r in rows if r["gid"] == 2
        ]

        merge_kwargs = dict(
            seq_col="seq",
            op_col="op",
            batch_id=batch_id,
            source_id=self.source_id,
            tiebreakers=["token"],
            lineage=lineage,
            planning_stats=planning_stats,
        )
        if self.wap_branch is not None:
            # branch-WAP proper: stage the merge on a branch cut at the main
            # head (dropping any stale ref a previously rejected batch left),
            # audit the BRANCH, publish metadata-only via fast_forward. Main
            # never exposes an unaudited snapshot, not even transiently; a
            # failed audit costs one dropped ref, no rollback commit. A crash
            # after fast_forward redelivers the batch, which no-ops on the
            # published ledger (exactly-once preserved).
            self.table.drop_branch(self.wap_branch)
            self.table.create_branch(self.wap_branch)
            staged = self.table.branch(self.wap_branch)
            result = staged.merge(prepared, **merge_kwargs)
            if not result.get("skipped"):
                verdict = self.audit_fn(staged, result)
                if verdict is not None and verdict is not True:
                    reason = ("audit rejected batch" if verdict is False
                              else str(verdict))
                    main_v = self.table.manifest().version
                    self.table.drop_branch(self.wap_branch)
                    self._quarantine_audit_reject(batch_df, batch_id, reason)
                    return {"skipped": False, "audit_failed": True,
                            "reason": reason, "version": main_v,
                            "batch_id": batch_id,
                            "metrics": {"rows": 0, "upserts": 0, "deletes": 0}}
            self.table.fast_forward(self.wap_branch)
            self.table.drop_branch(self.wap_branch)
        else:
            result = self.table.merge(prepared, **merge_kwargs)
        if (self.wap_branch is None and self.audit_fn is not None
                and not result.get("skipped")):
            verdict = self.audit_fn(self.table, result)
            if verdict is not None and verdict is not True:
                reason = "audit rejected batch" if verdict is False else str(verdict)
                # the merge's parent from the manifest ancestry, NOT version-1:
                # versions allocate from a global counter once branches exist
                parent = self.table.manifest(int(result["version"])).parent
                self.table.rollback(version=parent)
                restored = self.table.lease()
                if restored:  # empty ⇒ rolled back to the pre-first-batch table
                    self._write_lease(restored)  # sidecar follows the table
                self._quarantine_audit_reject(batch_df, batch_id, reason)
                return {"skipped": False, "audit_failed": True, "reason": reason,
                        "version": parent, "batch_id": batch_id,
                        "metrics": {"rows": 0, "upserts": 0, "deletes": 0}}
        if not result.get("skipped"):
            lease = self.table.lease()
            if self.monitor_cols:
                captured = batch_df.filter(F.col("op").isin(*self.cfg.captured_ops))
                lease["monitor"] = self._monitor_summary(captured)
            self._write_lease(lease)
        if self.queue_sink is not None:
            # produce the RAW captured rows (the reference queues the change
            # documents themselves) — no UDF columns, so this extra pass stays
            # a cheap scan; the sink's marker makes replays no-ops
            captured = batch_df.filter(F.col("op").isin(*self.cfg.captured_ops))
            result["queue"] = self.queue_sink.produce(
                captured, batch_id=batch_id, source_id=self.source_id
            )
        return result

    def _monitor_summary(self, captured: DataFrame) -> dict:
        """Per-batch top-K value counts for every monitored column in ONE
        Spark job — GROUPING SETS ((c1), (c2), ...) over the pruned monitored
        columns, mirroring the planning agg above. The old shape ran one
        groupBy job PER column, i.e. N scans of the batch per micro-batch.

        Within a grouping set only that set's column varies (the others are
        null constants), so a single window ordered by (count desc, c1, ...,
        cN) reproduces each column's native-type deterministic tiebreak
        exactly. Collect is bounded by N * top_k rows. Internal aliases are
        double-underscore-prefixed so a user column literally named `gid`,
        `n` or `_rk` (all plausible) cannot AMBIGUOUS_REFERENCE the plan."""
        from pyspark.sql.window import Window

        cols = list(self.monitor_cols)
        w = Window.partitionBy("__cdc_gid").orderBy(
            F.desc("__cdc_n"), *[F.col(c) for c in cols])
        top = (
            captured.select(*cols)
            .groupingSets([[c] for c in cols], *cols)
            .agg(F.count(F.lit(1)).alias("__cdc_n"),
                 F.grouping_id().alias("__cdc_gid"))
            .withColumn("__cdc_rk", F.row_number().over(w))
            .filter(F.col("__cdc_rk") <= self.monitor_top_k)
            .collect()
        )
        # grouping_id bit i (MSB-first in declared column order) set ⇔ column
        # ABSENT from the set, so column i's rows carry gid = full ^ its bit
        full = (1 << len(cols)) - 1
        monitor = {}
        for i, c in enumerate(cols):
            gid = full ^ (1 << (len(cols) - 1 - i))
            monitor[c] = {
                ("<null>" if r[c] is None else str(r[c])): int(r["__cdc_n"])
                for r in sorted(
                    (r for r in top if int(r["__cdc_gid"]) == gid),
                    key=lambda r: int(r["__cdc_rk"]))
            }
        return monitor

    # -- DLQ replay ------------------------------------------------------------

    def replay_quarantine(self, fix=None, replay_id: int | str = 0) -> dict:
        """Replay the DLQ: re-validate quarantined rows — after an optional
        repair transform `fix(df) -> df` over the original batch columns —
        and MERGE the now-valid ones; rows that still fail validation remain
        quarantined. The retry half of the reference's per-message failure
        aggregation (/root/reference/src/queue/eventhub/utils.ts:55-69),
        applied on the ingest side.

        Exactly-once + crash safety, in commit order:
          1. the surviving (still-invalid) rows are STAGED to a sibling tmp
             dir — nothing destructive yet;
          2. the repaired rows merge under batch_id `dlq-replay-{replay_id}`
             through the table ledger — a crashed or re-run replay never
             double-applies, and the resume cursor cannot regress (the lake's
             max_seq watermark is monotone);
          3. only after the commit does the staged generation swap in; a
             crash mid-swap is healed on the next call (tmp preferred, else
             the renamed-away old dir is restored).
        """
        if not self.quarantine_dir:
            raise ValueError("replay_quarantine: pipeline has no quarantine_dir")
        import shutil

        qdir = self.quarantine_dir
        tmp, old = qdir + ".replay.tmp", qdir + ".replay.old"
        if not os.path.exists(qdir):
            # heal an interrupted swap: the staged generation wins if it was
            # fully written (step 3 got past the rename-away), else restore
            if os.path.exists(tmp):
                os.rename(tmp, qdir)
            elif os.path.exists(old):
                os.rename(old, qdir)
            else:
                return {"replayed": 0, "still_quarantined": 0}
        from change_data_capturer_ms_spark.functions.validate import validate_batch

        q = self.spark.read.parquet(qdir).drop("_reasons", "_batch_id")
        cand = fix(q) if fix is not None else q
        valid, still_bad = validate_batch(cand)

        shutil.rmtree(tmp, ignore_errors=True)
        (still_bad.withColumn("_batch_id", F.lit(f"dlq-replay-{replay_id}"))
         .write.mode("overwrite").parquet(tmp))
        n_bad = self.spark.read.parquet(tmp).count()

        prepared = prepare_batch(valid, self.cfg, self.use_pandas_udfs,
                                 flatten_props=self.flatten_props)
        if not self.table.exists():
            from pyspark.sql import types as T
            payload = [f for f in prepared.schema.fields if f.name not in ("seq", "op")]
            self.table.create(T.StructType(payload))
        result = self.table.merge(
            prepared, seq_col="seq", op_col="op",
            batch_id=f"dlq-replay-{replay_id}", source_id=self.source_id,
            tiebreakers=["token"],
        )
        if result.get("skipped"):
            # the ledger already holds this replay_id (an earlier replay used
            # it): NOTHING was applied, so swapping the DLQ now would delete
            # valid rows that never reached the table — silent data loss for
            # any rows quarantined SINCE that earlier replay. Leave the
            # quarantine untouched and surface the collision in the result.
            shutil.rmtree(tmp, ignore_errors=True)
            return {"replayed": 0, "still_quarantined": int(n_bad),
                    "merge": result, "skipped_swap": True,
                    "reason": f"replay_id {replay_id!r} already committed — "
                              "pass a fresh replay_id to replay the current "
                              "quarantine"}
        self._write_lease(self.table.lease())

        shutil.rmtree(old, ignore_errors=True)
        os.rename(qdir, old)
        os.rename(tmp, qdir)
        shutil.rmtree(old, ignore_errors=True)
        return {"replayed": int(result.get("metrics", {}).get("rows", 0)),
                "still_quarantined": int(n_bad), "merge": result}

    # -- run ------------------------------------------------------------------

    def run_stream(
        self,
        max_files_per_trigger: int | None = None,
        timeout_sec: float | None = None,
    ) -> None:
        """Bounded streaming run: availableNow drains everything new since the
        checkpoint then stops (reference closeStream timeout semantics,
        mongo.ts:43-63, made deterministic)."""
        stream = self.reader.read_stream(max_files_per_trigger)
        if self.event_dedup_watermark is not None:
            from change_data_capturer_ms_spark.operators.dedupe import (
                streaming_dedupe_within_watermark)

            stream = streaming_dedupe_within_watermark(
                stream, keys=["seq"], ts_col="ts",
                watermark=self.event_dedup_watermark)
        query = (
            stream.writeStream.foreachBatch(
                lambda df, bid: self.apply_batch(df, bid) and None
            )
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination(timeout_sec) if timeout_sec else query.awaitTermination()

    def run_batch(self, batch_id: int | str | None = None) -> dict:
        """One-shot batch apply resuming after the last committed seq — the pull-loop
        shape (cosmos.ts:51-112) without the streaming engine.

        The default batch_id derives from the RESUME CURSOR (`manual-<after>`),
        not a constant: a fixed default ("manual-0") collides in the
        exactly-once ledger across invocations, so every call after the first
        would silently no-op all newly arrived events (the delete_where
        default-batch_id bug class). Distinct cursor ⇒ distinct id; same
        cursor ⇒ the events read are the same set, and the ledger no-op is
        exactly the dedupe you want."""
        lease = self.table.lease() if self.table.exists() else {}
        try:
            after = int(lease["lease"]) if lease.get("lease") else None
        except (TypeError, ValueError):
            # decode-or-None (reference cosmos/utils.ts:76-91): an undecodable
            # lease token restarts from the beginning; the idempotent MERGE
            # ledger makes the replay exactly-once
            after = None
        if batch_id is None:
            batch_id = f"manual-{-1 if after is None else after}"
        batch = self.reader.read_batch(after_seq=after)
        return self.apply_batch(batch, batch_id)
