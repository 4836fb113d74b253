#!/usr/bin/env python3
"""Headline benchmark (driver contract).

Default mode runs the headline queries at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and
prints ONE JSON line::

    {"metric": "headline_total", "value": <sec>, "unit": "sec",
     "queries": {"kg_flagship": sec, ...}, "sf": 0.1, ...}

Extra keys: ``throughput`` (flagship docs/sec + triples/sec) and
``scaling`` (the N->4N efficiency record from the most recent
``tools/bench_scaling.py`` run, if present).

Leg mode (used by tools/bench_scaling.py for the two-cluster-size
scaling evidence; BASELINE.md "scaling efficiency" row)::

    python bench.py --leg <cores> <replicate>

builds the stores once (untimed — the fixed-size offline model build),
then times P1-P3 (extract -> tokenize -> spot -> disambiguate ->
canonicalize -> triples) over the documents table replicated
<replicate>x, on local[<cores>], and prints one JSON line with
docs/sec + triples/sec.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

REPO = Path(__file__).resolve().parent

# headline operator queries (registry keys) — the shuffle/join/UDF-heavy
# representatives of SURVEY.md §2.6 + the training-data ops
HEADLINE = [
    "kg_annotate_prior",
    "spot_mentions",
    "agg_salted",
    "agg_counts",
    "join_sortmerge",
    "win_topk",
    "dedup_minhash",
    "dedup_lsh_pairs",
    "ann_cosine_topk",
    "text_quality",
    "json_fns",
]


def _force(df) -> int:
    """Fully execute a plan without driver-side materialization cost."""
    return df.write.format("noop").mode("overwrite").save() or 0


def headline_mode() -> None:
    from dbpedia_spotlight_db_spark.entrypoint import flagship
    from dbpedia_spotlight_db_spark.queries import QUERIES
    from dbpedia_spotlight_db_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench", cores=cores)
    # warm the JVM/codegen path so timings measure the queries
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    times: dict[str, float] = {}

    t0 = time.perf_counter()
    triples = flagship(spark, sf_dir)
    n_triples = triples.count()
    flagship_sec = time.perf_counter() - t0
    times["kg_flagship"] = round(flagship_sec, 3)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        _force(fn(spark, sf_dir))
        times[name] = round(time.perf_counter() - t0, 3)

    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = None

    out = {
        "metric": "headline_total",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "cores": cores,
        "throughput": {
            "flagship_docs_per_sec": round(n_docs / flagship_sec, 2),
            "flagship_triples_per_sec": round(n_triples / flagship_sec, 2),
            "flagship_triples": n_triples,
        },
    }
    scaling_file = REPO / "BENCH_SCALING.json"
    if scaling_file.exists():
        try:
            out["scaling"] = json.loads(scaling_file.read_text())
        except Exception:
            pass
    print(json.dumps(out))


def leg_mode(cores: int, replicate: int) -> None:
    from dbpedia_spotlight_db_spark.entrypoint import (
        annotate_to_triples,
        documents_as_pages,
        replicate_docs,
        world_stores,
    )
    from dbpedia_spotlight_db_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        f"bench-leg-{cores}",
        cores=cores,
        # partitions >= 4x cores at BOTH levels so the 4N run is never
        # under-partitioned (SURVEY.md §4.3)
        shuffle_partitions=max(128, cores * 4),
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # fixed-size offline model build (the reference's one-off
    # SpotlightModel load) — materialized + broadcast, untimed
    from dbpedia_spotlight_db_spark.entrypoint import world_model_bc

    stores = world_stores(spark, docs)
    for v in stores.values():
        if hasattr(v, "count"):
            v.count()
    model_bc = world_model_bc(spark, stores)

    npart = max(128, cores * 4)
    # round-robin repartition AFTER replication: hash(doc_id) over only
    # 5000 distinct keys leaves 2.6x partition skew; round-robin over
    # the replicated narrow rows balances the pandas-UDF map stage
    big = replicate_docs(docs, replicate).repartition(npart)
    pages = documents_as_pages(big)
    n_docs = big.count()

    # warm the executor pool (spawn all Python workers + deliver the
    # broadcast model to each) with a tiny pass over every partition —
    # on a long-lived cluster these are one-off costs, not throughput
    warm = documents_as_pages(
        docs.limit(256).repartition(npart, "doc_id")
    )
    annotate_to_triples(spark, warm, stores, model_bc=model_bc).count()

    t0 = time.perf_counter()
    triples = annotate_to_triples(spark, pages, stores, model_bc=model_bc)
    n_triples = triples.count()
    sec = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "cores": cores,
                "replicate": replicate,
                "docs": n_docs,
                "triples": n_triples,
                "sec": round(sec, 3),
                "docs_per_sec": round(n_docs / sec, 2),
                "triples_per_sec": round(n_triples / sec, 2),
            }
        )
    )


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "--leg":
        leg_mode(int(sys.argv[2]), int(sys.argv[3]))
    else:
        headline_mode()
