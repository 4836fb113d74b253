"""Invariant tests for the qcorpus query faces (round-3 breadth pass).

The Spark-vs-DuckDB value equality is the oracle gate's job
(tools/check_oracle.py); these tests pin the SEMANTIC invariants the
hash compare can't articulate: chunk coverage, decontamination
soundness, compaction correctness vs a window twin, stratum rates.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from dbpedia_spotlight_db_spark.queries import qcorpus

SF = "/root/testdata/sf0.001"


def test_crawl_latest_matches_window_twin(spark):
    got = qcorpus.Q["crawl_latest"](spark, SF)
    e = spark.read.parquet(f"{SF}/events.parquet")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    want = (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("latest_event_id"),
            F.col("ts").alias("latest_ts"),
            F.col("event_type").alias("latest_type"),
        )
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # exactly one row per key
    n_keys = e.select("user_id").distinct().count()
    assert got.count() == n_keys


def test_decontaminate_sound_and_complete(spark):
    n = qcorpus._DECON_N
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    tok = docs.select("doc_id", F.split("text", " ").alias("arr")).filter(
        F.size("arr") >= n
    )
    grams = tok.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(arr) - {n - 1}),"
                f" i -> array_join(slice(arr, i, {n}), ' '))"
            )
        ).alias("gram"),
    )
    bench = grams.filter(F.col("doc_id") % 97 == 0).select("gram").distinct()
    survivors = qcorpus.Q["decontaminate"](spark, SF)
    # soundness: no surviving doc shares any n-gram with the benchmark
    leaked = (
        grams.join(survivors, "doc_id", "left_semi")
        .join(bench, "gram", "left_semi")
        .count()
    )
    assert leaked == 0
    # completeness: every long-enough benchmark doc decontaminates itself
    bench_docs = tok.filter(F.col("doc_id") % 97 == 0).select("doc_id")
    assert survivors.join(bench_docs, "doc_id", "left_semi").count() == 0


def test_text_chunks_cover_and_tile(spark):
    k, s = qcorpus._CHUNK_LEN, qcorpus._CHUNK_STRIDE
    chunks = qcorpus.Q["text_chunks"](spark, SF)
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tok")
    )
    stats = (
        chunks.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.max(F.col("chunk_start") + F.col("n_tokens")).alias("covered"),
            F.min("chunk_start").alias("first_start"),
        )
        .join(docs, "doc_id")
    )
    bad = stats.filter(
        (F.col("first_start") != 0)
        | (F.col("covered") != F.col("n_tok"))
        | (F.col("n_chunks") != F.ceil(F.col("n_tok") / F.lit(s)))
    )
    assert bad.count() == 0
    # every chunk except a doc's last is exactly stride-aligned and,
    # when the doc continues, full-width up to the tail
    assert (
        chunks.filter(F.col("chunk_start") % s != 0).count() == 0
    )
    assert chunks.filter(F.col("n_tokens") > k).count() == 0


def test_sample_stratified_rates_and_determinism(spark):
    got = qcorpus.Q["sample_stratified"](spark, SF)
    again = qcorpus.Q["sample_stratified"](spark, SF)
    assert got.exceptAll(again).count() == 0
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_en = docs.filter(F.col("lang") == "en").count()
    got_en = got.filter(F.col("lang") == "en").count()
    # en stratum targets 8/16; tolerate small-fixture variance
    assert 0.25 <= got_en / max(n_en, 1) <= 0.75
    # sample is a subset of the corpus
    assert got.join(docs, "doc_id", "left_anti").count() == 0


def test_token_topk_rank_contract(spark):
    top = qcorpus.Q["token_topk"](spark, SF).collect()
    assert 0 < len(top) <= 100
    by_rank = sorted(top, key=lambda r: r.rnk)
    assert [r.rnk for r in by_rank] == list(range(1, len(top) + 1))
    counts = [r.c for r in by_rank]
    assert counts == sorted(counts, reverse=True)


def test_bm25_only_matching_docs_positive_scores(spark):
    scored = qcorpus.Q["bm25_search"](spark, SF)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    terms = list(qcorpus._BM25_TERMS)
    has_term = docs.filter(
        F.arrays_overlap(
            F.split("text", " "),
            F.array(*[F.lit(x) for x in terms]),
        )
    ).select("doc_id")
    assert scored.join(has_term, "doc_id", "left_anti").count() == 0
    assert has_term.join(scored, "doc_id", "left_anti").count() == 0
    assert scored.filter(F.col("score") <= 0).count() == 0


def test_doc_tfidf_topterms_per_doc_limit(spark):
    got = qcorpus.Q["doc_tfidf_topterms"](spark, SF)
    per_doc = got.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    assert per_doc.filter(F.col("n") > 3).count() == 0
    # top term actually occurs in its document
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    joined = got.join(docs, "doc_id").filter(
        ~F.array_contains(F.split("text", " "), F.col("tk"))
    )
    assert joined.count() == 0


def test_kg_disambiguate_matches_e1_back_half(spark):
    """E2 (/disambiguate, spans given) must agree with E1's argmax on
    the same spans: kg_annotate_prior restricted to the synthesized
    span subset == kg_disambiguate's entity commits."""
    from dbpedia_spotlight_db_spark.queries import qpipe

    e1 = (
        qpipe.Q["kg_annotate_prior"](spark, SF)
        .filter(F.col("pos") % 3 == 1)
        .select("doc_id", "pos", "surface_form", "uri")
    )
    e2 = qpipe.Q["kg_disambiguate"](spark, SF).select(
        "doc_id", "pos", "surface_form", "uri"
    )
    assert e1.exceptAll(e2).count() == 0
    assert e2.exceptAll(e1).count() == 0
    # srr is a valid confidence: in [0, 1], 0 iff single-candidate sf
    srr = qpipe.Q["kg_disambiguate"](spark, SF)
    assert srr.filter(
        (F.col("second_rank_ratio") < 0) | (F.col("second_rank_ratio") > 1)
    ).count() == 0
