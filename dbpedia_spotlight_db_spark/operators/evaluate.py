"""J6 — gold alignment / linking evaluation (SURVEY.md §2.3).

Reference lineage: the eval module (EvaluateParagraphDisambiguator,
canonical upstream path in SURVEY.md §1.1, UNVERIFIED-LOCALLY) scores
the annotator against gold corpora with precision/recall on matched
annotations — the same P/R framing the north_rule uses ("P/R >= 0.95
vs reference annotations"). While the local reference checkout is
empty (SURVEY.md §0), frozen golden annotations under tests/golden/
stand in for the reference's outputs.

Match key: (url, start, end, uri) — exact span + canonical entity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

KEY = ["url", "start", "end", "uri"]


def align(emitted: DataFrame, gold: DataFrame) -> DataFrame:
    """Full outer join on the match key -> one row per annotation in
    either set with match status (tp / fp / fn)."""
    e = emitted.select(*KEY).distinct().withColumn("_e", F.lit(1))
    g = gold.select(*KEY).distinct().withColumn("_g", F.lit(1))
    return (
        e.join(g, KEY, "full_outer")
        .withColumn(
            "status",
            F.when(F.col("_e").isNotNull() & F.col("_g").isNotNull(), "tp")
            .when(F.col("_e").isNotNull(), "fp")
            .otherwise("fn"),
        )
        .drop("_e", "_g")
    )


def precision_recall(emitted: DataFrame, gold: DataFrame) -> dict:
    """-> {'precision':…, 'recall':…, 'f1':…, 'tp':…, 'fp':…, 'fn':…}"""
    counts = {
        r.status: r["count"]
        for r in align(emitted, gold).groupBy("status").count().collect()
    }
    tp = counts.get("tp", 0)
    fp = counts.get("fp", 0)
    fn = counts.get("fn", 0)
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return {"precision": p, "recall": r, "f1": f1, "tp": tp, "fp": fp, "fn": fn}
