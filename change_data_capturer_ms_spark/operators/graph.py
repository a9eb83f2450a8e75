"""Connected components over a pair graph — the step that turns near-dup PAIR
mining (dedup_docs.py / similarity.py emit `(id_a, id_b)` candidates) into
duplicate GROUPS with one canonical survivor each. Without it a transitive
chain a~b~c dedups to two docs instead of one.

Algorithm: alternating large-star / small-star (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) — the shuffle-native formulation:
each round is one groupBy(min) + one join, no vertex-program framework needed,
and it converges in O(log² n) rounds even on pathological long chains (naive
min-label propagation needs O(diameter) rounds, which on a 100 TB crawl with
chained near-dups is the difference between 8 rounds and 800).

Scale shape per round: groupBy(u).min(v) is a partial-aggregatable shuffle on
the node id; the join back is on the same key so AQE reuses the exchange. Edge
frames are `localCheckpoint()`-ed each round — iterative plans otherwise grow
lineage exponentially and stall the optimizer (on a real cluster prefer
`sparkContext.setCheckpointDir` + `checkpoint()` so blocks survive executor
loss; localCheckpoint is the single-JVM equivalent).

Reference parity note: the reference (pagopa/change-data-capturer-ms) has no
graph step — this extends the engine's training-data surface the way its
pair miners already do (SURVEY.md §2.2 extras).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


class _Ckpointer:
    """Materialize iterative frames, truncating lineage, WITHOUT leaking.

    checkpoint_dir=None (default) uses localCheckpoint — right for single-JVM
    / local-mode runs; blocks live in executor storage and the block manager
    reclaims them. A durable dir (HDFS/S3 on a cluster) makes each round a
    parquet write+read under `<dir>/cc-<run>/round-<n>` — blocks then survive
    executor loss mid-iteration, which at 100 TB is not optional. Unlike
    `df.checkpoint()` (whose ReliableCheckpointRDD files Spark only deletes
    with `spark.cleaner.referenceTracking.cleanCheckpoints=true`, default
    false — up to 2·max_iter full edge-frame copies left behind per run),
    superseded rounds are deleted here as soon as the fixpoint test no longer
    reads them (keep-last-2), via the Hadoop FileSystem of whatever scheme
    the dir uses. Only the final round survives the run — the returned labels
    frame still reads it — so callers own `cleanup()` / the run dir once the
    result is consumed (dedup_keep_canonical's anti-join, a write, ...).
    """

    def __init__(self, checkpoint_dir: str | None):
        self.dir = checkpoint_dir
        self.n = 0
        self.live: list[str] = []
        if checkpoint_dir is not None:
            import uuid
            self.run_dir = f"{checkpoint_dir.rstrip('/')}/cc-{uuid.uuid4().hex[:12]}"

    def __call__(self, df: DataFrame) -> DataFrame:
        if self.dir is None:
            return df.localCheckpoint(eager=True)
        path = f"{self.run_dir}/round-{self.n}"
        self.n += 1
        df.write.mode("overwrite").parquet(path)
        out = df.sparkSession.read.parquet(path)
        self.live.append(path)
        while len(self.live) > 2:
            self._delete(df.sparkSession, self.live.pop(0))
        return out

    def _delete(self, spark, path: str) -> None:
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(path)
        fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
        fs.delete(p, True)

    def cleanup(self, spark) -> None:
        """Drop the whole run dir — call after the labels are consumed."""
        if self.dir is not None:
            self._delete(spark, self.run_dir)


def _canon(edges: DataFrame) -> DataFrame:
    """Orient every edge (greater, smaller), drop self-loops, distinct."""
    u, v = F.col("u"), F.col("v")
    return (
        edges.filter(u != v)
        .select(F.greatest(u, v).alias("u"), F.least(u, v).alias("v"))
        .distinct()
    )


def _large_star(e_dir: DataFrame) -> DataFrame:
    """Large-star round: for each node u, connect every strictly-greater
    neighbor to min(Γ⁺(u)). Input oriented (u > v); output oriented too
    (emitted (v, m) always has v > u ≥ m)."""
    sym = e_dir.union(
        e_dir.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(
            F.col("v").alias("u"),
            F.least(F.col("u"), F.col("mn")).alias("v"),
        )
        .distinct()
    )


def _small_star(e_dir: DataFrame) -> DataFrame:
    """Small-star round: for each node u with smaller-neighbor set N(u),
    m = min(N(u)); connect u and every other member of N(u) to m."""
    mins = e_dir.groupBy("u").agg(F.min("v").alias("m"))
    moved = (
        e_dir.join(mins, "u")
        .where(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    self_edge = mins.select("u", F.col("m").alias("v"))
    return moved.union(self_edge).distinct()


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 30,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Label every node that appears in `pairs` with its component id — the
    MINIMUM node id reachable from it (so labels are deterministic and the
    root is itself a member). Returns columns `(id, component)`.

    Nodes with no pair never appear in the input and are absent from the
    output by contract (a left join downstream treats NULL component as
    "singleton"); `dedup_keep_canonical` handles that for the corpus case.

    `max_iter` is a safety bound: O(log² n) convergence means 30 rounds
    covers any graph this engine will ever see; non-convergence raises
    rather than returning a partial labeling.

    `checkpoint_dir`: None = localCheckpoint (single-JVM); a durable path
    (HDFS/S3 on a cluster) = fault-tolerant parquet round-checkpoints with
    keep-last-2 pruning — identical labels either way (tested), different
    failure semantics (see `_Ckpointer`).
    """
    _ckpt = _Ckpointer(checkpoint_dir)
    e = _canon(pairs.select(F.col(src).alias("u"), F.col(dst).alias("v")))
    e = _ckpt(e)
    for _ in range(max_iter):
        nxt = _ckpt(_small_star(_large_star(e)))
        # fixpoint = SET equality, in ONE job: both frames are distinct, so
        # the sets are equal iff no (u, v) group in the tagged union is
        # single-sided (count 1). Count-equality alone would NOT suffice (a
        # round can swap edges keeping the count); count+anti-join is correct
        # but costs 3 jobs per round — on near-dup graphs each round's edge
        # frame is tiny and fixed job overhead dominates, so one job matters.
        if (
            nxt.union(e)
            .groupBy("u", "v")
            .count()
            .filter(F.col("count") < 2)
            .isEmpty()
        ):
            e = nxt
            break
        e = nxt
    else:
        raise RuntimeError(
            f"connected_components: no fixpoint after {max_iter} rounds"
        )
    members = e.select(F.col("u").alias("id"), F.col("v").alias("component"))
    roots = e.select(F.col("v").alias("id"), F.col("v").alias("component"))
    return members.union(roots).distinct()


def component_stats(labels: DataFrame) -> DataFrame:
    """Per-component size over a `(id, component)` labeling — one
    partial-aggregatable groupBy. Columns `(component, n_members)`."""
    return labels.groupBy("component").agg(
        F.count("*").cast("long").alias("n_members")
    )


def dedup_keep_canonical(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
    src: str = "id_a", dst: str = "id_b",
    broadcast_losers: bool = True,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """The end-to-end corpus dedup: drop every doc in a duplicate component
    except its min-id root; docs in no pair (singletons) pass through.

    Scale shape: the anti-join side is one row per NON-canonical duplicate.
    `broadcast_losers=True` (default) pins the broadcast so the corpus never
    shuffles — right whenever the loser list fits an executor (typical: pair
    mining already thresholded). At EXTREME dup rates (loser list beyond the
    broadcast limit — e.g. a raw crawl that is half mirror copies) pass
    False: the join falls back to shuffle, and AQE still converts it back to
    broadcast at runtime if the measured size allows. A forced broadcast of
    an unbounded side is the failure mode to avoid, not the shuffle.
    """
    cc = connected_components(pairs, src=src, dst=dst,
                              checkpoint_dir=checkpoint_dir)
    losers = cc.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    if broadcast_losers:
        losers = F.broadcast(losers)
    return docs.join(losers, id_col, "left_anti")
