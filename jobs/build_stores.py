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

STORE_TABLES = (
    "entities", "surface_forms", "candidate_map",
    "tokens", "context_counts", "entity_vectors", "icf",
)


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--redirects", default=None)
    ap.add_argument("--salt-n", type=int, default=32)
    args = ap.parse_args(argv)

    from dbpedia_spotlight_db_spark.plans.build_stores import build_stores
    from dbpedia_spotlight_db_spark.session import get_spark
    from dbpedia_spotlight_db_spark.sources import catalog

    spark = get_spark("kg-build-stores")
    corpus = spark.read.parquet(args.corpus)
    stores = build_stores(spark, corpus, salt_n=args.salt_n)
    for name in STORE_TABLES:
        catalog.save(stores[name], name, args.out)
    if args.redirects:
        catalog.save(spark.read.parquet(args.redirects), "redirects", args.out)
    print(f"wrote {len(STORE_TABLES)} store tables to {args.out}")


if __name__ == "__main__":
    main()
