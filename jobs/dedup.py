"""Near-duplicate removal as a spark-submit job: documents ->
MinHash-LSH candidate pairs -> connected components (dup clusters) ->
survivors (min-id keeper per cluster), written through the catalog
seam.

    spark-submit --py-files dist/engine.zip jobs/dedup.py \
        --docs <parquet of (doc_id, text, ...)> --out <dir> \
        [--n-hashes 4] [--bands 4] [--shingle-n 3]

Outputs under --out:
    components/  (id, component)        one row per doc in any cluster
    survivors/   (full input row)       input minus non-keeper dups

Plan shape (the 100TB story): shingle explode is map-only; signatures
are one map-side-combinable agg; the band self-join is bucketed with a
hot-bucket cap; components converge in O(log diameter) pointer-jumping
rounds over a parquet-checkpointed edge set; the final drop is an
UNHINTED anti-join against the written components table (losers is
corpus-proportional at real dup rates, so AQE — not a forced
broadcast — decides the join strategy).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--n-hashes", type=int, default=4)
    ap.add_argument("--bands", type=int, default=4)
    ap.add_argument("--shingle-n", type=int, default=3)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from dbpedia_spotlight_db_spark.operators import dedup as dd
    from dbpedia_spotlight_db_spark.session import get_spark
    from dbpedia_spotlight_db_spark.sources import catalog

    spark = get_spark("kg-dedup")
    docs = spark.read.parquet(args.docs)

    sigs = dd.minhash_signatures(
        docs, args.id_col, args.text_col,
        n_hashes=args.n_hashes, shingle_n=args.shingle_n,
    )
    pairs = dd.lsh_pairs(sigs, n_hashes=args.n_hashes, bands=args.bands)
    comp = dd.connected_components(pairs)
    catalog.save(comp, "components", args.out)

    # re-read components from the table just written: the survivors
    # join then scans a few parquet files instead of re-executing the
    # whole LSH + CC lineage
    comp = catalog.load(spark, "components", args.out)
    losers = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(args.id_col)
    )
    # UNHINTED anti-join: losers is O(dup_fraction x corpus) — at real
    # web dup rates (30-80%) a forced broadcast ships a corpus-sized
    # relation to every executor; AQE picks broadcast only when the
    # runtime size fits
    survivors = docs.join(losers, args.id_col, "left_anti")
    catalog.save(survivors, "survivors", args.out)

    # counts come from the manifests the saves just wrote (plus the
    # tiny losers relation) — no extra full action over the corpus
    n_removed = losers.count()
    n_out = catalog.manifest(args.out, "survivors")["rows"]
    print(
        f"dedup: {n_out + n_removed} docs in, {n_out} survivors "
        f"({n_removed} near-duplicates removed) -> {args.out}"
    )


if __name__ == "__main__":
    main()
