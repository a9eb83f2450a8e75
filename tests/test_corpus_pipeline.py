"""End-to-end training-corpus curation: the operators compose into the full
pipeline a 100 TB data-prep job runs — quality filter → near-dup mining →
connected components → keep-canonical → decontamination → corpus mixing →
split + sequence packing. Each stage is unit-tested elsewhere; this pins the
COMPOSITION (schemas line up, determinism survives the chain, no stage
resurrects what an earlier stage dropped)."""

from pyspark.sql import functions as F

from change_data_capturer_ms_spark.operators import (
    connected_components,
    decontaminate,
    dedup_keep_canonical,
    gopher_filter,
    gopher_rules,
    mix_corpora,
    ngram_jaccard_pairs,
    pack_concat_chunks,
    hash_split,
    repetition_profile,
    text_profile,
    token_count_ws,
)


def _corpus(spark):
    """60 web docs + 20 book docs; planted: a near-dup triple (1,2,3), an
    eval-contaminated doc (7), and short low-quality docs (id % 10 == 9)."""
    base = "the quick brown fox jumps over the lazy dog and runs far away"
    rows = []
    for i in range(60):
        if i in (1, 2, 3):
            text = f"{base} variant common tail of shared words number {i}"
        elif i == 7:
            text = "held out benchmark sentence that must never train " + base
        elif i % 10 == 9:
            text = "tiny"
        else:
            # per-doc-unique filler words: no accidental cross-doc shingle
            # overlap beyond the 3 stopword-run shingles (J ≈ 0.04 << 0.5)
            text = " ".join(f"w{i}_{j} the of and to in" for j in range(12))
        rows.append((i, text, "web"))
    for i in range(100, 120):
        rows.append((i, " ".join(
            f"b{i}_{j} is that it on a" for j in range(12)), "books"))
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_full_curation_chain(spark):
    docs = _corpus(spark)
    evals = spark.createDataFrame(
        [(0, "held out benchmark sentence that must never train")],
        "doc_id long, text string",
    )

    # 1) quality filter (thresholds scaled to the tiny synthetic docs)
    prof = text_profile(docs).join(
        repetition_profile(docs).withColumnRenamed("id", "doc_id"),
        "doc_id", "left")
    rules = gopher_rules(min_tokens=5, max_tokens=10_000, min_mean_tok=1.0,
                         max_mean_tok=20.0, min_distinct=0.05,
                         max_dup_line=1.0, max_top_g2=1.0, max_dup_g5=1.0,
                         require_stopwords=True)
    keep_ids = gopher_filter(prof, rules=rules).filter("keep").select("doc_id")
    kept = docs.join(keep_ids, "doc_id", "left_semi")
    kept_set = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert all(i not in kept_set for i in range(9, 60, 10))  # 'tiny' dropped
    assert {1, 2, 3, 7} <= kept_set

    # 2) near-dup pairs → components → one canonical survivor
    pairs = ngram_jaccard_pairs(kept, n=3, threshold=0.5, df_cap=100)
    assert pairs.count() >= 1  # the planted triple collides
    deduped = dedup_keep_canonical(kept, pairs)
    dd = {r["doc_id"] for r in deduped.select("doc_id").collect()}
    assert 1 in dd and not {2, 3} <= dd  # min-id canonical survives
    comp = connected_components(pairs)
    assert {r["component"] for r in comp.collect()} == {1}

    # 3) decontamination vs the eval set
    clean = decontaminate(deduped, evals, n=5)
    cl = {r["doc_id"] for r in clean.select("doc_id").collect()}
    assert 7 not in cl and 1 in cl

    # 4) deterministic mixture: books kept whole, web downsampled
    web = clean.filter("source = 'web'").drop("source")
    books = clean.filter("source = 'books'").drop("source")
    mixed = mix_corpora({"web": (web, 0.5), "books": (books, 1.0)}, "doc_id")
    n_books = mixed.filter("mix_source = 'books'").count()
    assert n_books == books.count()

    # 5) split + packing: gapless per-shard offsets
    t = mixed.withColumn("n_tokens", token_count_ws("text"))
    packed = pack_concat_chunks(hash_split(t, "doc_id"), id_col="doc_id",
                                tokens_col="n_tokens", budget=64, n_shards=2,
                                keep_cols=["split", "mix_source", "n_tokens"])
    rows = packed.orderBy("shard", "start_offset").collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard_rows in by_shard.values():
        pos = 0
        for r in shard_rows:
            assert r["start_offset"] == pos
            pos += r["n_tokens"]

    # determinism: the whole chain re-run over a repartitioned input is
    # row-identical (every decision is a pure function of content/keys)
    again = mix_corpora(
        {"web": (web.repartition(7), 0.5), "books": (books, 1.0)}, "doc_id")
    a = mixed.select("doc_id", "mix_source")
    b = again.select("doc_id", "mix_source")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
