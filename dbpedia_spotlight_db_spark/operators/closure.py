"""Redirect closure + canonicalization (SURVEY.md §2.3 J4/J5).

Reference semantics (WikipediaToDBpediaClosure, canonical upstream
path in SURVEY.md §1.1, UNVERIFIED-LOCALLY): follow Wikipedia redirect
edges transitively to a canonical DBpedia URI; drop annotations whose
target is a disambiguation page.

Spark-first design: the closure is computed by **pointer jumping**
(iterated self-join, f := f∘f), which converges in O(log(longest
chain)) shuffles instead of O(chain) — 12 iterations covers chains of
4096. Each iteration is localCheckpoint()ed to cut lineage growth.

Cycle semantics (matching the reference's visited-set bailout: a
redirect chain that loops is treated as no redirect): even cycles
(a↔b) collapse to self-loops under f∘f and are dropped; odd cycles
oscillate and never stabilize, so after the loop any row whose target
is still a non-stable redirect source (f(dst) exists and != dst) is
dropped — cycle members and chains that dead-end in a cycle all
canonicalize to themselves, deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def redirect_closure(redirects: DataFrame, max_iter: int = 12) -> DataFrame:
    """(src_uri, dst_uri) edges -> fixpoint map src_uri -> canonical dst_uri.

    Pointer jumping: each pass rewrites dst := f(dst) when dst is
    itself a redirect source, doubling resolved path length per pass.
    """
    cur = redirects.select("src_uri", "dst_uri").dropDuplicates(["src_uri"])
    for _ in range(max_iter):
        nxt = (
            cur.alias("a")
            .join(
                cur.alias("b"),
                F.col("a.dst_uri") == F.col("b.src_uri"),
                "left",
            )
            .select(
                F.col("a.src_uri").alias("src_uri"),
                F.coalesce(F.col("b.dst_uri"), F.col("a.dst_uri")).alias(
                    "dst_uri"
                ),
                (
                    F.col("b.dst_uri").isNotNull()
                    & (F.col("b.dst_uri") != F.col("a.dst_uri"))
                ).alias("_changed"),
            )
        )
        nxt = nxt.localCheckpoint(eager=True)
        changed = nxt.filter(
            F.col("_changed") & (F.col("src_uri") != F.col("dst_uri"))
        ).count()
        cur = nxt.drop("_changed")
        if changed == 0:
            break
    # drop rows whose target never stabilized: f(dst) exists and
    # differs from dst ⇒ dst sits on (or the chain feeds into) a
    # cycle that f∘f cannot collapse (odd length) — treat as no
    # redirect, like the reference's visited-set bailout
    stable = (
        cur.alias("a")
        .join(
            cur.alias("b"),
            F.col("a.dst_uri") == F.col("b.src_uri"),
            "left",
        )
        .filter(
            F.col("b.src_uri").isNull()
            | (F.col("b.dst_uri") == F.col("a.dst_uri"))
        )
        .select(F.col("a.src_uri").alias("src_uri"), F.col("a.dst_uri").alias("dst_uri"))
    )
    # even cycles became self-loops -> canonical form is "no redirect"
    return stable.filter(F.col("src_uri") != F.col("dst_uri"))


def canonicalize(
    annotations: DataFrame,
    closure: DataFrame,
    disambiguations: DataFrame,
    uri_col: str = "uri",
) -> DataFrame:
    """J5: rewrite uri through the closure (broadcast left join +
    coalesce), then drop disambiguation-page targets (left_anti)."""
    out = (
        annotations.join(
            F.broadcast(closure),
            annotations[uri_col] == closure["src_uri"],
            "left",
        )
        .withColumn(uri_col, F.coalesce(F.col("dst_uri"), F.col(uri_col)))
        .drop("src_uri", "dst_uri")
    )
    return out.join(
        F.broadcast(disambiguations),
        out[uri_col] == disambiguations["uri"],
        "left_anti",
    )
