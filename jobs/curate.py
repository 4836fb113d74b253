"""End-to-end training-corpus curation as a spark-submit job: raw
documents -> (optional) latest-snapshot compaction -> quality +
language filter -> (optional) benchmark decontamination -> (optional)
corpus-level duplicate-line removal -> (optional) repetition filter ->
near-dup removal (MinHash-LSH + connected components) -> (optional)
PII redaction -> training chunks + (optional) stratified split +
(optional) sequence packing, every stage written through the catalog
seam with a row-count manifest.

    spark-submit --py-files dist/engine.zip jobs/curate.py \
        --docs <parquet of (doc_id, text[, lang, ...])> --out <dir> \
        [--key-col url --ts-col warc_ts]      # compaction stage \
        [--min-quality 0.3] [--langs en,fr]   # filter stage \
        [--benchmark <parquet>] [--decon-n 8] # anti-leak stage \
        [--line-dedup-width 3]                # C4 boilerplate-line drop \
        [--max-top-bigram 0.2]                # Gopher repetition filter \
        [--skip-dedup]                        # LSH+CC stage \
        [--redact-pii]                        # compliance scrub \
        [--chunk-len 32] [--stride 16]        # chunking stage \
        [--stratify "en=0.5,*=0.0625"]        # split stage \
        [--pack-ctx 2048]                     # sequence packing

Outputs under --out (each with a JSON manifest):
    filtered/    quality+lang survivors (post-compaction)
    clean/       after decontamination + line/doc dedup + scrubbing
    chunks/      (doc_id, chunk_start, n_tokens, chunk_text)
    sampled/     stratified split (only with --stratify)
    packed/      (doc_id, shard, n_tokens, tok_start, seq_id)

Plan shape (the 100TB story): compaction is one map-side-combinable
max_by agg (the exchange carries one candidate per key per map task —
hot keys can't skew it); quality/langid/repetition/PII are pure column
math on the scan (repetition's max-bigram is an in-row fold — zero
shuffle); the benchmark shingle set broadcasts; line dedup counts
blocks with a vocabulary-sized agg and anti-joins the hot set back
UNHINTED; doc dedup follows jobs/dedup.py (banded LSH, pointer-jump
CC, unhinted survivors anti-join); chunking/packing are map-only array
math plus one shard-keyed window. Stage outputs are parquet, so a
failed run resumes from the last completed stage's table instead of
recomputing the lineage.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse_stratify(spec: str) -> tuple[dict[str, float], float]:
    fractions: dict[str, float] = {}
    default = 0.0
    for part in spec.split(","):
        k, v = part.split("=", 1)
        if k.strip() == "*":
            default = float(v)
        else:
            fractions[k.strip()] = float(v)
    return fractions, default


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--lang-col", default="lang")
    ap.add_argument("--key-col", default=None,
                    help="compaction key (e.g. url); skipped if absent")
    ap.add_argument("--ts-col", default=None,
                    help="compaction recency column (e.g. warc_ts)")
    ap.add_argument("--min-quality", type=float, default=0.3)
    ap.add_argument("--langs", default=None,
                    help="comma list; docs in other languages are dropped")
    ap.add_argument("--benchmark", default=None,
                    help="parquet of eval docs to decontaminate against")
    ap.add_argument("--decon-n", type=int, default=8)
    ap.add_argument("--line-dedup-width", type=int, default=0,
                    help="block width for C4-style duplicate-line removal;"
                         " 0 (default) skips the stage")
    ap.add_argument("--line-dedup-count", type=int, default=3,
                    help="corpus occurrence threshold for a block to drop")
    ap.add_argument("--max-top-bigram", type=float, default=None,
                    help="drop docs whose most frequent bigram covers more"
                         " than this token fraction (Gopher repetition rule)")
    ap.add_argument("--max-dup-block", type=float, default=None,
                    help="drop docs whose repeated-block fraction exceeds this")
    ap.add_argument("--redact-pii", action="store_true",
                    help="replace emails/phones with typed placeholders")
    ap.add_argument("--skip-dedup", action="store_true")
    ap.add_argument("--n-hashes", type=int, default=4)
    ap.add_argument("--bands", type=int, default=4)
    ap.add_argument("--shingle-n", type=int, default=3)
    ap.add_argument("--chunk-len", type=int, default=32)
    ap.add_argument("--stride", type=int, default=16)
    ap.add_argument("--stratify", default=None,
                    help='per-lang sample fractions, e.g. "en=0.5,*=0.0625"')
    ap.add_argument("--pack-ctx", type=int, default=0,
                    help="training-sequence length for greedy packing;"
                         " 0 (default) skips the stage")
    ap.add_argument("--pack-shards", type=int, default=64)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from dbpedia_spotlight_db_spark.functions.text import (
        langid_ngram_col,
        quality_score_col,
    )
    from dbpedia_spotlight_db_spark.operators import curation
    from dbpedia_spotlight_db_spark.operators import dedup as dd
    from dbpedia_spotlight_db_spark.session import get_spark
    from dbpedia_spotlight_db_spark.sources import catalog

    spark = get_spark("kg-curate")
    docs = spark.read.parquet(args.docs)
    id_col, text_col = args.id_col, args.text_col

    # ---- stage 1: latest-snapshot compaction (optional) -------------
    if args.key_col and args.ts_col:
        payload = [c for c in docs.columns if c != args.key_col]
        ordk = F.struct(F.col(args.ts_col), F.col(id_col))
        docs = (
            docs.groupBy(args.key_col)
            .agg(F.max_by(F.struct(*payload), ordk).alias("b"))
            .select(args.key_col, "b.*")
        )

    # ---- stage 2: quality + language filter --------------------------
    # when the corpus carries no language tags, MATERIALIZE the derived
    # langid as the lang column: later stages (--stratify) reference it
    # as a physical column and must not crash after the expensive
    # compaction/dedup stages have already run
    if args.lang_col not in docs.columns:
        docs = docs.withColumn(
            args.lang_col, langid_ngram_col(F.col(text_col))
        )
    filtered = docs.withColumn("quality", quality_score_col(F.col(text_col)))
    filtered = filtered.filter(F.col("quality") >= args.min_quality)
    if args.langs:
        filtered = filtered.filter(
            F.col(args.lang_col).isin(*args.langs.split(","))
        )
    catalog.save(filtered, "filtered", args.out)
    filtered = catalog.load(spark, "filtered", args.out)

    # ---- stage 3: benchmark decontamination (optional) ---------------
    clean = filtered
    if args.benchmark:
        bench = spark.read.parquet(args.benchmark)
        clean = curation.decontaminate(
            clean, bench, n=args.decon_n, id_col=id_col, text_col=text_col
        )

    # ---- stage 3b: corpus-level duplicate-line removal (optional) -----
    if args.line_dedup_width > 0:
        ld = curation.line_dedup(
            clean,
            width=args.line_dedup_width,
            min_count=args.line_dedup_count,
            id_col=id_col,
            text_col=text_col,
        )
        clean = clean.drop(text_col).join(
            ld.select(id_col, F.col("clean_text").alias(text_col)), id_col
        )
        # a doc whose every block was boilerplate is pure boilerplate
        clean = clean.filter(F.col(text_col) != "")

    # ---- stage 3c: repetition filter (optional, map-only signals) -----
    if args.max_top_bigram is not None or args.max_dup_block is not None:
        sig = curation.repetition_signals(
            clean, id_col=id_col, text_col=text_col
        )
        too_rep = F.lit(False)
        if args.max_top_bigram is not None:
            too_rep = too_rep | (
                F.col("top_bigram_frac") > args.max_top_bigram
            )
        if args.max_dup_block is not None:
            too_rep = too_rep | (F.col("dup_block_frac") > args.max_dup_block)
        clean = clean.join(
            sig.filter(too_rep).select(id_col), id_col, "left_anti"
        )

    # ---- stage 4: near-dup removal (MinHash-LSH + CC) -----------------
    if not args.skip_dedup:
        sigs = dd.minhash_signatures(
            clean, id_col, text_col,
            n_hashes=args.n_hashes, shingle_n=args.shingle_n,
        )
        pairs = dd.lsh_pairs(sigs, n_hashes=args.n_hashes, bands=args.bands)
        comp = dd.connected_components(pairs)
        catalog.save(comp, "components", args.out)
        comp = catalog.load(spark, "components", args.out)
        losers = comp.filter(F.col("id") != F.col("component")).select(
            F.col("id").alias(id_col)
        )
        # UNHINTED anti-join (losers is corpus-proportional; AQE decides)
        clean = clean.join(losers, id_col, "left_anti")

    # ---- stage 4b: PII redaction (optional, map-only) ------------------
    if args.redact_pii:
        red = curation.pii_redact(clean, id_col=id_col, text_col=text_col)
        clean = clean.drop(text_col).join(
            red.select(id_col, F.col("clean_text").alias(text_col)), id_col
        )
    catalog.save(clean, "clean", args.out)
    clean = catalog.load(spark, "clean", args.out)

    # ---- stage 5: training chunks ------------------------------------
    chunks = curation.chunk_tokens(
        clean, id_col, text_col,
        chunk_len=args.chunk_len, stride=args.stride,
    )
    catalog.save(chunks, "chunks", args.out)

    # ---- stage 6: stratified split (optional) -------------------------
    if args.stratify:
        fractions, default = _parse_stratify(args.stratify)
        sampled = curation.stratified_sample(
            clean, args.lang_col, fractions, default, id_col=id_col
        )
        catalog.save(sampled, "sampled", args.out)

    # ---- stage 7: greedy sequence packing (optional) -------------------
    if args.pack_ctx > 0:
        packed = curation.pack_greedy(
            clean,
            ctx_len=args.pack_ctx,
            n_shards=args.pack_shards,
            id_col=id_col,
            text_col=text_col,
        )
        catalog.save(packed, "packed", args.out)

    # counts come from the manifests the saves wrote — no extra actions
    parts = []
    for name in ("filtered", "clean", "chunks", "sampled", "packed"):
        try:
            parts.append(f"{name}={catalog.manifest(args.out, name)['rows']}")
        except FileNotFoundError:
            pass
    print(f"curate: {' '.join(parts)} -> {args.out}")


if __name__ == "__main__":
    main()
