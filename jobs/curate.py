"""End-to-end training-corpus curation as a spark-submit job: raw
documents -> (optional) latest-snapshot compaction -> quality +
language filter -> (optional) benchmark decontamination -> near-dup
removal (MinHash-LSH + connected components) -> training chunks +
(optional) stratified split, every stage written through the catalog
seam with a row-count manifest.

    spark-submit --py-files dist/engine.zip jobs/curate.py \
        --docs <parquet of (doc_id, text[, lang, ...])> --out <dir> \
        [--key-col url --ts-col warc_ts]      # compaction stage \
        [--min-quality 0.3] [--langs en,fr]   # filter stage \
        [--benchmark <parquet>] [--decon-n 8] # anti-leak stage \
        [--skip-dedup]                        # LSH+CC stage \
        [--chunk-len 32] [--stride 16]        # chunking stage \
        [--stratify "en=0.5,*=0.0625"]        # split stage

Outputs under --out (each with a JSON manifest):
    filtered/    quality+lang survivors (post-compaction)
    clean/       after decontamination + near-dup removal
    chunks/      (doc_id, chunk_start, n_tokens, chunk_text)
    sampled/     stratified split (only with --stratify)

Plan shape (the 100TB story): compaction is one map-side-combinable
max_by agg (the exchange carries one candidate per key per map task —
hot keys can't skew it); quality/langid are pure column math on the
scan; the benchmark shingle set broadcasts; dedup follows
jobs/dedup.py (banded LSH, pointer-jump CC, UNHINTED survivors
anti-join); chunking is map-only array math. Stage outputs are
parquet, so a failed run resumes from the last completed stage's
table instead of recomputing the lineage.
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
    ap.add_argument("--skip-dedup", action="store_true")
    ap.add_argument("--n-hashes", type=int, default=4)
    ap.add_argument("--bands", type=int, default=4)
    ap.add_argument("--shingle-n", type=int, default=3)
    ap.add_argument("--chunk-len", type=int, default=32)
    ap.add_argument("--stride", type=int, default=16)
    ap.add_argument("--stratify", default=None,
                    help='per-lang sample fractions, e.g. "en=0.5,*=0.0625"')
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
    lang = (
        F.col(args.lang_col)
        if args.lang_col in docs.columns
        else langid_ngram_col(F.col(text_col))
    )
    filtered = docs.withColumn("quality", quality_score_col(F.col(text_col)))
    filtered = filtered.filter(F.col("quality") >= args.min_quality)
    if args.langs:
        filtered = filtered.filter(lang.isin(*args.langs.split(",")))
    catalog.save(filtered, "filtered", args.out)
    filtered = catalog.load(spark, "filtered", args.out)

    # ---- stage 3: benchmark decontamination (optional) ---------------
    clean = filtered
    if args.benchmark:
        bench = spark.read.parquet(args.benchmark)
        clean = curation.decontaminate(
            clean, bench, n=args.decon_n, id_col=id_col, text_col=text_col
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

    # counts come from the manifests the saves wrote — no extra actions
    parts = []
    for name in ("filtered", "clean", "chunks", "sampled"):
        try:
            parts.append(f"{name}={catalog.manifest(args.out, name)['rows']}")
        except FileNotFoundError:
            pass
    print(f"curate: {' '.join(parts)} -> {args.out}")


if __name__ == "__main__":
    main()
