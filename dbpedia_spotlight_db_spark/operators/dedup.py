"""Deduplication operators for large-scale training-data pipelines:
exact, MinHash(+LSH), SimHash, n-gram Jaccard.

Engine-portable hashing: all hash material derives from ``md5`` hex
strings (identical in Spark and DuckDB), so every operator here is
SQL-oracle checkable — a deliberate choice over xxhash/murmur, whose
implementations differ across engines. At production scale md5 cost
is dwarfed by the shuffle it feeds; swap `_HASH` for xxhash64 when
oracle parity is not required.

Scale shapes:
- exact: one salted groupBy on the content hash — embarrassingly
  parallel, no skew (hashes are uniform).
- MinHash/LSH: shingle explode -> per-doc min-agg (map-side combinable)
  -> band-key equi-join. The band join is self-join on a uniform key;
  at 10^12 docs, bucket counts bound the pair blow-up (hot buckets are
  capped by `max_bucket` before pairing).
- Jaccard: candidate pairs come only from shared shingles (inverted
  index join), never a cross join.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F


def _words(text_col):
    return F.split(F.lower(text_col), r"\s+")


def parquet_checkpoint(df: DataFrame, tag: str) -> DataFrame:
    """Materialize a multiply-consumed relation to columnar storage and
    re-read it. Deliberately NOT .persist(): at multi-M rows the
    deserialized cache is a GC storm, while a parquet round-trip
    through spark.local.dir (tmpfs here) measured faster (CLAUDE.md
    perf note). Each call writes a UNIQUE path (pid + atomic counter):
    a fixed per-tag path would let a later call clobber the files
    behind a previously returned lazy DataFrame (and race across
    processes/threads). Space lifecycle: all generations are removed
    at interpreter exit (atexit), and per tag only the newest
    ``_CKPT_KEEP`` generations are kept. CONTRACT: a returned
    DataFrame must be consumed before ``_CKPT_KEEP`` newer
    checkpoints of the SAME tag are written — a caller holding a lazy
    result across a longer parameter sweep must materialize it first
    (every in-repo caller consumes within the same query). Registry
    mutations are lock-guarded (build_model submits Spark actions
    from a thread pool)."""
    spark = df.sparkSession
    base = spark.conf.get("spark.local.dir", "/tmp").split(",")[0]
    path = os.path.join(
        base,
        "spark_graft_ckpt",
        f"{tag}-{os.getpid()}-{next(_CKPT_COUNTER)}",
    )
    df.write.mode("overwrite").parquet(path)
    with _CKPT_LOCK:
        _CKPT_PATHS.setdefault(tag, []).append(path)
        stale = _CKPT_PATHS[tag][:-_CKPT_KEEP]
        _CKPT_PATHS[tag] = _CKPT_PATHS[tag][-_CKPT_KEEP:]
    import shutil

    for p in stale:
        shutil.rmtree(p, ignore_errors=True)
    return spark.read.parquet(path)


import atexit
import itertools
import threading

_CKPT_COUNTER = itertools.count()
_CKPT_PATHS: dict[str, list[str]] = {}
_CKPT_KEEP = 4
_CKPT_LOCK = threading.Lock()


@atexit.register
def _cleanup_checkpoints() -> None:
    import shutil

    for paths in _CKPT_PATHS.values():
        for p in paths:
            shutil.rmtree(p, ignore_errors=True)


def shingle_df(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """(id, shingle) — word n-gram shingles, generated per-row with
    array HOFs (zero shuffle)."""
    arr = _words(F.col(text_col))
    expr = F.expr(
        f"""
        transform(
            sequence(0, size(split(lower({text_col}), '\\\\s+')) - {n}),
            i -> concat_ws(' ', slice(split(lower({text_col}), '\\\\s+'), i + 1, {n}))
        )
        """
    )
    return df.filter(F.size(arr) >= n).select(
        F.col(id_col).alias("id"), F.explode(expr).alias("shingle")
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup by content hash: (text_hash, dup_count, keeper)."""
    return (
        df.select(F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).alias("dup_count"),
            F.min("id").alias("keeper"),
        )
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash signature per doc: ONE md5 per shingle, sliced into
    ``n_hashes`` disjoint fixed-width hex ranges — each slice is an
    independent uniform hash of the shingle, and hex-string min ==
    numeric min for fixed-width lowercase hex. One hash call instead
    of n per exploded shingle row (the explode is the dominant cost
    of the minhash/LSH family at corpus scale). ``n_hashes`` must
    divide 32 (md5 hex length) and be <= 4, keeping every slice >=
    32 bits: narrower slices (e.g. 16-bit at n_hashes=8) saturate
    toward 0 on large documents and the LSH band join then produces
    spurious collisions far above the Jaccard estimate. For more than
    4 hash functions, derive extra slices from md5 of a salted
    shingle instead. Output: id, mh0..mh{n-1}.

    No per-doc shingle dedup: MIN is idempotent over duplicates, so
    the distinct that jaccard needs would only add a full shuffle of
    the exploded relation here — the single groupBy(id) min-agg is
    map-side combinable and is the only exchange."""
    assert 32 % n_hashes == 0 and n_hashes <= 4, (
        "n_hashes must divide 32 and be <= 4 (slices stay >= 32 bits)"
    )
    L = 32 // n_hashes
    sh = shingle_df(df, id_col, text_col, shingle_n).withColumn(
        "_h", F.md5(F.col("shingle"))
    )
    aggs = [
        F.min(F.substring("_h", i * L + 1, L)).alias(f"mh{i}")
        for i in range(n_hashes)
    ]
    return sh.groupBy("id").agg(*aggs)


def lsh_pairs(
    sigs: DataFrame, n_hashes: int = 4, bands: int = 4, max_bucket: int = 1000
) -> DataFrame:
    """Band the signature (rows-per-band = n_hashes/bands); docs
    sharing any full band become candidate pairs (id_a < id_b).
    Hot buckets above ``max_bucket`` are dropped (logged upstream) to
    bound the self-join blow-up at scale."""
    rows_per_band = n_hashes // bands
    banded = None
    for b in range(bands):
        cols = [f"mh{b * rows_per_band + j}" for j in range(rows_per_band)]
        part = sigs.select(
            "id",
            F.lit(b).alias("band"),
            F.concat_ws("|", *cols).alias("bucket"),
        )
        banded = part if banded is None else banded.unionByName(part)
    # hot-bucket cap via partial-agg count + anti-join — not a window
    # over (band, bucket), which would sort-shuffle every banded row;
    # the overfull-bucket relation is tiny (few hot buckets by
    # definition) and broadcasts
    counts = banded.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("_n")
    )
    banded = banded.join(
        F.broadcast(counts.filter(F.col("_n") > max_bucket)),
        ["band", "bucket"],
        "left_anti",
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_df: int = 1000,
) -> DataFrame:
    """n-gram Jaccard over distinct shingle sets, computed via an
    inverted-index self-join (only pairs sharing >=1 shingle are ever
    materialized). Output: id_a, id_b, jaccard (rounded 6dp for
    engine-portable comparison).

    Skew guard: a stop-phrase shingle ("of the and") with document
    frequency d would emit O(d^2) join rows in ONE key group — the
    quadratic hot-key blow-up that kills the self-join at corpus
    scale. Shingles with df > ``max_df`` are therefore removed from
    the shingle UNIVERSE (both intersection and union sides), i.e.
    the operator computes df-capped Jaccard — the standard stopword
    treatment in production near-dup pipelines. The hot-shingle
    relation is tiny by definition (few shingles exceed the cap), so
    the exclusion is a partial-agg count + broadcast anti-join (the
    same pattern as lsh_pairs' hot-bucket cap, dedup.py lsh_pairs).
    Pairs sharing no hot shingle are bit-identical to the uncapped
    result (tests/test_dedup_cap.py property)."""
    sh = parquet_checkpoint(
        shingle_df(df, id_col, text_col, shingle_n).dropDuplicates(
            ["id", "shingle"]
        ),
        "jaccard_shingles",
    )
    hot = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") > max_df)
        .select("shingle")
    )
    sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a")
    sb = sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b")
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("n_a") + F.col("n_b") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_pairs(
    fingerprints: DataFrame,
    bits: int = 16,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate pairs by banded Hamming search over simhash
    fingerprints. Pigeonhole guarantee: with ``bands`` chunks, any two
    fingerprints within Hamming distance ``bands - 1`` share at least
    one unchanged chunk — so for ``max_hamming < bands`` the banded
    candidate generation has EXACT recall (unlike MinHash-LSH's
    probabilistic bands). Chunk-equality buckets are the join key (a
    chunk-keyed self-join, never all-pairs); exact Hamming distance
    is computed inside the row with array HOFs.

    NO hot-bucket cap here, deliberately: exact recall forbids
    dropping buckets (unlike lsh_pairs, whose bands are already
    probabilistic), and the bucket space is only 2^(bits/bands) per
    band — at corpus scale the join is bounded by WIDENING the
    fingerprint (e.g. bits=64, bands=4 -> 16-bit chunks), which
    shrinks every bucket quadratically, not by discarding candidates.
    Output: id_a, id_b, hamming."""
    assert bits % bands == 0 and max_hamming < bands
    chunk = bits // bands
    banded = None
    for b in range(bands):
        part = fingerprints.select(
            "id",
            "simhash",
            F.lit(b).alias("band"),
            F.substring("simhash", b * chunk + 1, chunk).alias("bucket"),
        )
        banded = part if banded is None else banded.unionByName(part)
    a, b_ = banded.alias("a"), banded.alias("b")
    hamming = F.expr(
        f"size(filter(sequence(1, {bits}),"
        " i -> substring(a.simhash, i, 1) != substring(b.simhash, i, 1)))"
    )
    return (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Duplicate-cluster assignment: connected components over the
    candidate-pair graph (the step after pair generation in every
    dedup pipeline — each component keeps one representative).
    Output: (id, component) with component = min id in the component.

    Algorithm: min-label propagation with a pointer-jump step each
    round (label := label-of-label), so chains collapse in
    O(log diameter) shuffles like the redirect closure's pointer
    jumping — not O(diameter). Near-dup components are shallow by
    construction (pairs come from shared buckets), so convergence is
    a handful of rounds; each round localCheckpoints to cut lineage.
    At web scale the production refinement is the large-star /
    small-star alternation (same join shapes, better skew behavior on
    giant components); the fixpoint semantics checked by the DuckDB
    recursive-CTE oracle are identical."""
    # checkpoint the symmetric edge set ONCE: each convergence round
    # runs two jobs over it (propagate + changed-count), and `pairs`
    # upstream is typically the expensive LSH self-join — without the
    # checkpoint every round would re-execute that whole lineage.
    # parquet_checkpoint, not localCheckpoint: the edge set is the
    # multi-M-row multiply-consumed relation the repo's cache rule
    # covers (deserialized JVM cache = GC storm; CLAUDE.md)
    edges = parquet_checkpoint(
        pairs.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .unionByName(
            pairs.select(F.col(dst).alias("s"), F.col(src).alias("d"))
        ),
        "cc_edges",
    )
    lab = (
        edges.select(F.col("s").alias("v"))
        .distinct()
        .withColumn("l", F.col("v"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # propagate: every neighbor's label reaches v
        prop = (
            edges.join(lab, edges["s"] == lab["v"])
            .select(F.col("d").alias("v"), F.col("l"))
        )
        new = (
            lab.unionByName(prop)
            .groupBy("v")
            .agg(F.min("l").alias("l"))
        )
        # pointer jump: l := label(l) (labels are node ids)
        jump = lab.select(
            F.col("v").alias("_lv"), F.col("l").alias("_ll")
        )
        new = (
            new.join(jump, new["l"] == jump["_lv"], "left")
            .select("v", F.least("l", F.coalesce("_ll", "l")).alias("l"))
        )
        new = new.localCheckpoint(eager=True)
        changed = (
            new.alias("n")
            .join(lab.alias("o"), "v")
            .filter(F.col("n.l") != F.col("o.l"))
            .count()
        )
        lab = new
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "iterations — component labels would be silently wrong; "
            "raise max_iter (pointer jumping needs O(log diameter) "
            "rounds, so this indicates a pathologically deep graph)"
        )
    return lab.select(F.col("v").alias("id"), F.col("l").alias("component"))


def simhash(
    df: DataFrame, id_col: str, text_col: str, bits: int = 32
) -> DataFrame:
    """SimHash fingerprint: bit j of a token's hash = parity of the
    j-th nibble of md5(token); document bit j = majority vote over
    tokens. Engine-portable (md5-only). Output: id, simhash:string of
    0/1 (msb-first)."""
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(_words(F.col(text_col))).alias("tok")
    ).withColumn("h", F.md5(F.col("tok")))
    bit_votes = [
        F.sum(
            F.when(
                F.substring("h", j + 1, 1).isin(
                    "1", "3", "5", "7", "9", "b", "d", "f"
                ),
                1,
            ).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(bits)
    ]
    voted = toks.groupBy("id").agg(*bit_votes)
    bit_cols = [
        F.when(F.col(f"v{j}") > 0, F.lit("1")).otherwise(F.lit("0"))
        for j in range(bits)
    ]
    return voted.select("id", F.concat(*bit_cols).alias("simhash"))
