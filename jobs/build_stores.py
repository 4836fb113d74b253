"""Offline model build (P0) as a spark-submit job: annotated corpus ->
the six count stores, written through the catalog seam (Iceberg in
prod, partitioned Parquet + manifest locally).

    spark-submit --py-files dist/engine.zip jobs/build_stores.py \
        --corpus <parquet of (doc_id, text, links)> \
        --out <store warehouse root> [--redirects <parquet src_uri,dst_uri>]

This is the equivalent of the reference's wikistats ingestion + store
serialization, re-expressed as salted, skew-aware aggregations.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# production physical layout (SURVEY.md §4.3): every store table is
# bucketed + sorted on the key the annotate pipeline joins it on, so
# the sort-merge-bucket fallback (stores beyond the broadcast budget)
# shuffles ONLY the probe side — tests/test_bucketed.py pins that the
# bucketed scan contributes no Exchange and no Sort
STORE_BUCKET_KEYS = {
    "entities": "entity_id",        # J1/J5 canonical lookup
    "surface_forms": "sf_id",       # T3->J1 spot attach
    "candidate_map": "sf_id",       # J1 candidate lookup
    "tokens": "token_id",           # T2 vocabulary attach
    "context_counts": "entity_id",  # J3 context attach
    "entity_vectors": "entity_id",  # J3/C2 vector attach
    "icf": "token_id",              # A5 weight attach
}


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--redirects", default=None)
    ap.add_argument("--salt-n", type=int, default=32)
    ap.add_argument("--n-buckets", type=int, default=8)
    args = ap.parse_args(argv)

    from dbpedia_spotlight_db_spark.plans.build_stores import build_stores
    from dbpedia_spotlight_db_spark.session import get_spark
    from dbpedia_spotlight_db_spark.sources import catalog

    spark = get_spark("kg-build-stores")
    corpus = spark.read.parquet(args.corpus)
    # corpus-scale regime: corpus-proportional intermediates go
    # through parquet_checkpoint, not deserialized cache (GC storm
    # at multi-M rows — plans/build_stores.py docstring)
    stores = build_stores(spark, corpus, salt_n=args.salt_n, checkpoint=True)
    for name, key in STORE_BUCKET_KEYS.items():
        catalog.save_bucketed(
            stores[name], name, args.out, key, n_buckets=args.n_buckets
        )
    if args.redirects:
        catalog.save(spark.read.parquet(args.redirects), "redirects", args.out)
    print(
        f"wrote {len(STORE_BUCKET_KEYS)} store tables to {args.out} "
        f"(bucketed x{args.n_buckets} on their join keys)"
    )


if __name__ == "__main__":
    main()
