"""Linking evaluation as a spark-submit job: emitted annotations vs a
gold standard -> per-annotation alignment (tp/fp/fn) + one-row P/R/F1
metrics, written through the catalog seam.

    spark-submit --py-files dist/engine.zip jobs/evaluate.py \
        --emitted <parquet of (url, start, end, uri, ...)> \
        --gold <parquet of (url, start, end, uri, ...)> \
        --out <dir> [--min-f1 0.95]

Outputs under --out:
    alignment/  (url, start, end, uri, status)   one row per annotation
                                                 in either set
    metrics/    (tp, fp, fn, precision, recall, f1)   one row

This is the day-2 face of operators/evaluate.py (J6): the north_rule
judges the pipeline at P/R >= 0.95 vs reference annotations, so the
production loop is annotate -> evaluate -> gate a model/store rollout
on --min-f1 (non-zero exit on regression, the CI contract). Scale
shape: the alignment is one full-outer join on the 4-part match key
(both sides shuffle once, no window, no collect); the metrics row is
a single map-side-combinable conditional-count agg over the written
alignment table — the corpus is never touched twice.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--emitted", required=True)
    ap.add_argument("--gold", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument(
        "--min-f1",
        type=float,
        default=None,
        help="exit 1 if f1 falls below this (rollout gate)",
    )
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from dbpedia_spotlight_db_spark.operators.evaluate import align
    from dbpedia_spotlight_db_spark.session import get_spark
    from dbpedia_spotlight_db_spark.sources import catalog

    spark = get_spark("kg-evaluate")
    emitted = spark.read.parquet(args.emitted)
    gold = spark.read.parquet(args.gold)

    aligned = align(emitted, gold)
    catalog.save(aligned, "alignment", args.out)

    # one conditional-count agg over the table just written (a few
    # parquet files), not a re-execution of the join lineage
    aligned = catalog.load(spark, "alignment", args.out)
    tp = F.sum((F.col("status") == "tp").cast("long")).alias("tp")
    fp = F.sum((F.col("status") == "fp").cast("long")).alias("fp")
    fn = F.sum((F.col("status") == "fn").cast("long")).alias("fn")
    m = aligned.agg(tp, fp, fn).select(
        "tp",
        "fp",
        "fn",
        (F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1)))
        .alias("precision"),
        (F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1)))
        .alias("recall"),
    )
    m = m.select(
        "*",
        F.when(
            F.col("precision") + F.col("recall") > 0,
            2 * F.col("precision") * F.col("recall")
            / (F.col("precision") + F.col("recall")),
        )
        .otherwise(F.lit(0.0))
        .alias("f1"),
    )
    catalog.save(m, "metrics", args.out)

    row = catalog.load(spark, "metrics", args.out).first()
    print(
        f"evaluate: tp={row.tp} fp={row.fp} fn={row.fn} "
        f"P={row.precision:.4f} R={row.recall:.4f} F1={row.f1:.4f} "
        f"-> {args.out}"
    )
    if args.min_f1 is not None and row.f1 < args.min_f1:
        print(f"evaluate: F1 {row.f1:.4f} < gate {args.min_f1} — FAILING")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
