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


def doc_blocks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 3,
) -> DataFrame:
    """(id, pos, block) rows: NON-overlapping ``width``-token blocks
    per document ("lines" for corpora whose text carries no newlines
    — the C4 line unit generalized). Map-only; the tail block may be
    shorter than ``width``. ``pos`` is the 0-based block index, so
    (id, pos) reconstructs document order downstream."""
    return (
        df.select(id_col, F.split(text_col, " ").alias("arr"))
        .select(
            id_col,
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, size(arr), {width}),"
                    f" i -> array_join(slice(arr, i, {width}), ' '))"
                )
            ).alias("pos", "block"),
        )
    )


def line_dedup(
    docs: DataFrame,
    width: int = 3,
    min_count: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C4-style corpus-level duplicate-line removal: drop every
    ``width``-token block whose exact string occurs >= ``min_count``
    times ACROSS the corpus (boilerplate: nav bars, cookie banners,
    license footers), then reassemble each document from its
    surviving blocks in order.

    Scale shape: block counting is a map-side-combinable agg whose
    shuffle is block-vocabulary-sized, never corpus-sized; the bad
    set joins back as a plain left_anti on the block string (no
    forced broadcast — boilerplate sets at crawl scale are large, so
    AQE decides; cf. the dedup_survivors lesson, VERDICT r2 #1). The
    rebuild is one groupBy on the doc id with an in-group
    array_sort — per-doc state is bounded by document length.
    Output: (id, clean_text, n_kept, n_dropped) for EVERY input doc
    (a fully-boilerplate doc survives with clean_text='')."""
    blocks = doc_blocks(docs, id_col, text_col, width)
    bad = (
        blocks.groupBy("block")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= min_count)
        .select("block")
    )
    kept = blocks.join(bad, "block", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "block"))),
                lambda s: s["block"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).cast("int").alias("n_kept"),
    )
    n_blocks = docs.select(
        id_col,
        F.size(
            F.expr(f"sequence(1, size(split({text_col}, ' ')), {width})")
        ).alias("_n_blocks"),
    )
    return (
        n_blocks.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_kept", F.lit(0)).cast("int").alias("n_kept"),
            (F.col("_n_blocks") - F.coalesce("n_kept", F.lit(0)))
            .cast("int")
            .alias("n_dropped"),
        )
    )


# fold over the sorted bigram array: longest run of equal adjacent
# elements == the max bigram frequency, computed INSIDE the row
_MAX_RUN = (
    "aggregate(array_sort({arr}),"
    " named_struct('prev', '', 'run', 0, 'best', 0),"
    " (acc, x) -> named_struct("
    "   'prev', x,"
    "   'run', IF(x = acc.prev, acc.run + 1, 1),"
    "   'best', greatest(acc.best, IF(x = acc.prev, acc.run + 1, 1))),"
    " acc -> acc.best)"
)


def repetition_signals(
    docs: DataFrame,
    block_width: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher-style within-document repetition signals, entirely
    MAP-ONLY (array HOFs; zero shuffle, zero UDF — each doc's state
    never leaves its row):

    - ``top_bigram_frac``: fraction of tokens covered by the single
      most frequent bigram (2 * max bigram count / n_tokens) — the
      "duplicate top-2-gram" rule;
    - ``dup_block_frac``: fraction of non-overlapping ``block_width``-
      token blocks that are repeats of an earlier block in the SAME
      doc — the "duplicate line fraction" rule;
    - ``distinct_frac``: type/token ratio (vocabulary diversity).

    The max-bigram count folds over the sorted bigram array with a
    run-length accumulator (``_MAX_RUN``) instead of a per-doc
    groupBy: at 10^12 docs that replaces a corpus-wide shuffle with
    per-row compute."""
    bg = (
        f"transform(sequence(1, size(arr) - 1),"
        f" i -> concat(arr[i - 1], ' ', arr[i]))"
    )
    blocks = (
        f"transform(sequence(1, size(arr), {block_width}),"
        f" i -> array_join(slice(arr, i, {block_width}), ' '))"
    )
    return (
        docs.select(id_col, F.split(text_col, " ").alias("arr"))
        .select(
            id_col,
            F.size("arr").alias("n_tokens"),
            F.when(
                F.size("arr") >= 2,
                F.expr(_MAX_RUN.format(arr=bg)) * 2.0 / F.size("arr"),
            )
            .otherwise(F.lit(0.0))
            .alias("_tbf"),
            F.expr(f"size({blocks})").alias("_nb"),
            F.expr(f"size(array_distinct({blocks}))").alias("_ndb"),
            F.size(F.array_distinct("arr")).alias("_ndt"),
        )
        .select(
            id_col,
            "n_tokens",
            F.round("_tbf", 6).alias("top_bigram_frac"),
            F.round(
                (F.col("_nb") - F.col("_ndb")) / F.col("_nb"), 6
            ).alias("dup_block_frac"),
            F.round(F.col("_ndt") / F.col("n_tokens"), 6).alias(
                "distinct_frac"
            ),
        )
    )


def pack_greedy(
    docs: DataFrame,
    ctx_len: int = 256,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Greedy concatenate-then-split sequence packing: the step that
    turns a curated corpus into fixed-length training sequences.
    Documents are sharded by ``id % n_shards``, deterministically
    ordered within the shard by md5(id) (reproducible across runs,
    engines, and cluster sizes — same reasoning as stratified_sample),
    laid end to end by a running token offset, and assigned to the
    ``ctx_len``-token sequence where they START (``seq_id``).

    Scale shape: one shuffle, keyed by the shard; the running sum is
    a per-shard window cumsum, and shards are the parallelism unit —
    at 10^12 docs n_shards becomes O(cluster cores) so no shard's
    window outgrows a task. Output: (id, shard, n_tokens, tok_start,
    seq_id)."""
    from pyspark.sql import Window

    d = docs.select(
        id_col,
        (F.col(id_col) % n_shards).cast("int").alias("shard"),
        F.md5(F.col(id_col).cast("string")).alias("_h"),
        F.size(F.split(text_col, " ")).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return d.select(
        id_col,
        "shard",
        "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens"))
        .cast("long")
        .alias("tok_start"),
    ).withColumn(
        "seq_id",
        F.floor(F.col("tok_start") / ctx_len).cast("int"),
    )


_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE_RE = "555-[0-9]{4}"


def pii_redact(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """PII scrubbing: replace email addresses and (toy) phone numbers
    with typed placeholders and count what was redacted — the
    compliance pass every web corpus runs before training. Map-only
    column expressions (regexp_replace / regexp_count compile once
    per task and run JVM-side); the patterns are RE2-compatible so
    the DuckDB twin executes the identical regex."""
    c = F.col(text_col)
    return docs.select(
        id_col,
        F.regexp_replace(
            F.regexp_replace(c, _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ).alias("clean_text"),
        F.regexp_count(c, F.lit(_EMAIL_RE)).cast("int").alias("n_emails"),
        F.regexp_count(c, F.lit(_PHONE_RE)).cast("int").alias("n_phones"),
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
    # NULL-stratum rows route to the DEFAULT branch (matching the SQL
    # twin's CASE ELSE): a bare ~isin() is NULL for NULL input and
    # would silently drop every untagged row from every split
    in_strata = (
        F.coalesce(F.col(strata_col).isin(*fractions), F.lit(False))
        if fractions
        else F.lit(False)
    )
    default_cond = (~in_strata) & ((h <= dcut) if dcut else F.lit(False))
    keep = default_cond if expr is None else (expr | default_cond)
    return df.filter(keep)
