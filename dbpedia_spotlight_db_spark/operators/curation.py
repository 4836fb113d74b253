"""Corpus-curation operators: the reusable building blocks behind the
qcorpus query faces and the end-to-end ``jobs/curate.py`` pipeline.

Everything here is pure DataFrame composition (no UDFs): shingling and
chunking are array HOFs, decontamination is a broadcast semi-join +
anti-join, sampling is an md5 threshold filter. Scale notes live on
each function; tools/explain_audit.py asserts the plan shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def word_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, gram) rows: all ``n``-word shingles per document
    (whitespace tokens). Map-only: split -> transform over start
    offsets -> explode; docs shorter than ``n`` contribute nothing."""
    return (
        df.select(id_col, F.split(text_col, " ").alias("arr"))
        .filter(F.size("arr") >= n)
        .select(
            id_col,
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(arr) - {n - 1}),"
                    f" i -> array_join(slice(arr, i, {n}), ' '))"
                )
            ).alias("gram"),
        )
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Drop every doc sharing any ``n``-word shingle with ``bench``
    (the benchmark/eval corpus) — the anti-leak pass before training.

    Scale shape: the benchmark shingle set is benchmark-sized
    (thousands of docs), so it BROADCASTS; the corpus side is a
    map-only shingle expansion -> broadcast semi-join -> distinct on
    id -> anti-join. The corpus is never shuffled by gram; the only
    wide exchange is the id-distinct of the (small) contaminated set."""
    bench_g = word_shingles(bench, id_col, text_col, n).select(
        "gram"
    ).distinct()
    dirty = (
        word_shingles(docs, id_col, text_col, n)
        .join(F.broadcast(bench_g), "gram", "left_semi")
        .select(id_col)
        .distinct()
    )
    return docs.join(dirty, id_col, "left_anti")


def chunk_tokens(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_len: int = 32,
    stride: int = 16,
) -> DataFrame:
    """Overlapping fixed-window token chunks — how documents become
    training examples. Pure map-side array math (split -> sequence of
    starts -> slice per start): no shuffle, no UDF. ``chunk_start``
    is the 0-based token offset, so (id, chunk_start) is the stable
    chunk key downstream dedup/shuffle can hang onto."""
    return (
        df.select(id_col, F.split(text_col, " ").alias("arr"))
        .select(
            id_col,
            F.size("arr").alias("n"),
            F.explode(F.expr(f"sequence(1, size(arr), {stride})")).alias("i"),
            F.col("arr"),
        )
        .select(
            id_col,
            (F.col("i") - 1).cast("int").alias("chunk_start"),
            F.least(F.lit(chunk_len), F.col("n") - (F.col("i") - 1))
            .cast("int")
            .alias("n_tokens"),
            F.expr(f"array_join(slice(arr, i, {chunk_len}), ' ')").alias(
                "chunk_text"
            ),
        )
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    default_frac: float,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum sampling by md5-of-key threshold:
    the same row lands in the same split on every engine, run, and
    cluster size (sampleBy()'s RNG draw order is partitioning-
    dependent — useless as a reproducible split). Fractions quantize
    to 1/16 steps (first hex digit compare); a pure map-side filter
    that composes with scan pushdown."""

    def _hex_cut(frac: float) -> str:
        k = max(0, min(16, round(frac * 16)))
        return format(k - 1, "x") if k > 0 else ""

    h = F.substring(F.md5(F.col(id_col).cast("string")), 1, 1)
    expr = None
    for stratum, frac in sorted(fractions.items()):
        cut = _hex_cut(frac)
        cond = (F.col(strata_col) == stratum) & (
            (h <= cut) if cut else F.lit(False)
        )
        expr = cond if expr is None else (expr | cond)
    dcut = _hex_cut(default_frac)
    in_strata = F.col(strata_col).isin(*fractions) if fractions else F.lit(
        False
    )
    default_cond = (~in_strata) & ((h <= dcut) if dcut else F.lit(False))
    keep = default_cond if expr is None else (expr | default_cond)
    return df.filter(keep)
