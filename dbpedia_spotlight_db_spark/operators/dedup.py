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

    No per-doc shingle dedup: MIN is idempotent over duplicates.

    MAP-ONLY: the signature is an array-HOF reduction INSIDE the row
    (``transform`` the shingle array to md5s, ``array_min`` each hex
    slice) — zero Exchange and zero exploded-row materialization,
    where the explode -> groupBy(id) formulation paid the dominant
    minhash/LSH cost in row churn (the agg itself was map-side
    combinable, but Tungsten still materialized |shingles| rows).
    Values are identical: min over the array == min over the exploded
    rows. EXPLAIN_AUDIT asserts the 0-Exchange shape."""
    assert 32 % n_hashes == 0 and n_hashes <= 4, (
        "n_hashes must divide 32 and be <= 4 (slices stay >= 32 bits)"
    )
    L = 32 // n_hashes
    arr = _words(F.col(text_col))
    base = df.filter(F.size(arr) >= shingle_n).select(
        F.col(id_col).alias("id"), arr.alias("_arr")
    )
    hs = F.expr(
        f"""
        transform(
            sequence(0, size(_arr) - {shingle_n}),
            i -> md5(concat_ws(' ', slice(_arr, i + 1, {shingle_n})))
        )
        """
    )
    sel = base.select("id", hs.alias("_hs"))
    mh_cols = [
        F.array_min(
            F.expr(f"transform(_hs, h -> substring(h, {i * L + 1}, {L}))")
        ).alias(f"mh{i}")
        for i in range(n_hashes)
    ]
    return sel.select("id", *mh_cols)


def lsh_pairs(
    sigs: DataFrame, n_hashes: int = 4, bands: int = 4, max_bucket: int = 1000
) -> DataFrame:
    """Band the signature (rows-per-band = n_hashes/bands); docs
    sharing any full band become candidate pairs (id_a < id_b).
    Hot buckets above ``max_bucket`` are dropped (logged upstream) to
    bound the self-join blow-up at scale.

    The signature relation is consumed three times (bucket counts +
    both self-join sides) and each band needs its own row — naively
    that re-runs the upstream shingle+minhash map up to bands x 3
    times. Signatures are therefore checkpointed ONCE (tiny: a few
    fixed-width hashes per doc, ~1% of the raw text the upstream pass
    reads — materializing them is what a production LSH pipeline does
    anyway), and the per-band melt is a single-pass ``stack`` instead
    of a bands-way union, so the expensive text scan happens exactly
    once regardless of band count or consumer count."""
    rows_per_band = n_hashes // bands
    sigs = parquet_checkpoint(
        sigs.select(
            "id", *[f"mh{i}" for i in range(rows_per_band * bands)]
        ),
        "lsh_sigs",
    )
    stack_args = ", ".join(
        f"{b}, concat_ws('|', "
        + ", ".join(
            f"mh{b * rows_per_band + j}" for j in range(rows_per_band)
        )
        + ")"
        for b in range(bands)
    )
    banded = sigs.selectExpr(
        "id", f"stack({bands}, {stack_args}) AS (band, bucket)"
    )
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


def _capped_pair_intersections(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int,
    max_df: int,
    tag: str,
) -> DataFrame:
    """Shared core of the shingle-overlap family: distinct shingle
    sets (checkpointed — consumed by counts and both join sides),
    hot shingles with df > ``max_df`` removed from the UNIVERSE by a
    broadcast anti-join BEFORE the quadratic step, then the
    inverted-index self-join. Returns one row per UNORDERED
    co-shingled pair: (id_a, id_b, inter, n_a, n_b) with id_a < id_b.
    Jaccard and containment are just different ratios over these five
    columns — any change to the cap or intersection semantics lands
    in both operators by construction."""
    sh = parquet_checkpoint(
        shingle_df(df, id_col, text_col, shingle_n).dropDuplicates(
            ["id", "shingle"]
        ),
        tag,
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
    return inter.join(sa, "id_a").join(sb, "id_b")


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
    return (
        _capped_pair_intersections(
            df, id_col, text_col, shingle_n, max_df, "jaccard_shingles"
        )
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


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_df: int = 1000,
) -> DataFrame:
    """ASYMMETRIC near-dup detection: directed containment
    C(src -> dst) = |S(src) ∩ S(dst)| / |S(src)| over distinct word
    n-gram shingle sets. Jaccard misses the quote/superset case — a
    short page fully embedded in a long aggregator page can have
    Jaccard ~0.1 while its containment in the aggregator is ~1.0;
    production crawl dedup (e.g. the C4/RefinedWeb family) screens
    both. Output: (src_id, dst_id, containment) for every DIRECTED
    pair with containment >= ``threshold``.

    Same scale shape as ngram_jaccard_pairs: inverted-index self-join
    on the shingle (only co-shingled pairs materialize), hot shingles
    with df > ``max_df`` dropped from the shingle universe by a
    broadcast anti-join BEFORE the quadratic step. The join itself is
    computed once per UNORDERED pair (id_a < id_b) and unpivoted into
    the two directions afterwards — half the join fan-out of a
    directed a.id != b.id condition for the same result. The capped
    intersection core is SHARED with ngram_jaccard_pairs
    (_capped_pair_intersections), so the two faces can never drift
    on cap or intersection semantics."""
    both = _capped_pair_intersections(
        df, id_col, text_col, shingle_n, max_df, "containment_shingles"
    )
    directed = both.select(
        F.col("id_a").alias("src_id"),
        F.col("id_b").alias("dst_id"),
        F.round(F.col("inter") / F.col("n_a"), 6).alias("containment"),
    ).unionByName(
        both.select(
            F.col("id_b").alias("src_id"),
            F.col("id_a").alias("dst_id"),
            F.round(F.col("inter") / F.col("n_b"), 6).alias("containment"),
        )
    )
    # filter on the ROUNDED ratio (exact small-int quotient) so row
    # membership is engine-portable — same rule as dedup_jaccard
    return directed.filter(F.col("containment") >= threshold)


def simhash_pairs(
    fingerprints: DataFrame,
    bits: int = 64,
    bands: int = 4,
    max_hamming: int = 3,
    expected_docs: int | None = None,
    max_avg_bucket: int = 64,
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
    probabilistic), and the bucket space is 2^(bits/bands) per band —
    at corpus scale the join is bounded by WIDENING the fingerprint,
    which shrinks every bucket quadratically, not by discarding
    candidates. The DEFAULT is therefore 64-bit fingerprints (16-bit
    chunks, 65536 buckets per band); narrow geometries are a footgun
    the geometry guard makes explicit: pass ``expected_docs`` and the
    operator refuses a bucket space whose AVERAGE bucket exceeds
    ``max_avg_bucket`` docs (expected join fan-out ~ docs^2 /
    2^chunk_bits per band — quadratic in the average bucket size).
    Output: id_a, id_b, hamming."""
    assert bits % bands == 0 and max_hamming < bands
    if expected_docs is not None:
        chunk_bits = bits // bands
        avg_bucket = expected_docs / float(2 ** chunk_bits)
        assert avg_bucket <= max_avg_bucket, (
            f"simhash geometry too narrow: {expected_docs} docs over "
            f"2^{chunk_bits} buckets/band = {avg_bucket:.0f} docs per "
            f"bucket on average (> {max_avg_bucket}); the banded "
            "self-join degenerates toward all-pairs — widen `bits` "
            "(e.g. 64 -> 128) instead of narrowing recall"
        )
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


def _cc_two_phase(
    pairs: DataFrame, src: str, dst: str, max_iter: int
) -> DataFrame:
    """Large-star / small-star alternation (Kiveris et al., SoCC'14).

    State is a directed edge set converging to a star forest
    (child -> component minimum). Each operator is expressed as
    groupBy-min (map-side combinable — the hub key's per-partition
    partials are tiny) followed by an equi-join of the edges against
    that per-node min table; AQE's skew-join split handles the hot
    join key a giant component creates, which is exactly the shape
    min-label propagation can't give it (there the hub's whole
    membership meets behind one reduce key).

      large-star: for each node u, attach every STRICTLY LARGER
        neighbor v to m = min(N(u) + {u}). Runs on the symmetrized
        edge set, halving long chains toward small ids.
      small-star: orient every edge (big, small); for each node u,
        attach u and all its smaller neighbors to m = min(N(u)); the
        edge (m, m) collapses away. Flattens the partial stars.

    Fixpoint: both passes leave the edge set unchanged, at which
    point every edge is (node, component-min). Worst case
    O(log^2 n) alternations; bucket-generated near-dup graphs
    converge in a handful."""
    edges = parquet_checkpoint(
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct(),
        "cc2_edges",
    )
    nodes = (
        edges.select(F.col("a").alias("id"))
        .unionByName(edges.select(F.col("b").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        prev = edges
        # --- large-star over the symmetric neighborhood ---
        sym = edges.unionByName(
            edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        mins = sym.groupBy("a").agg(
            F.least(F.min("b"), F.first("a")).alias("m")
        )
        edges = (
            sym.join(mins, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # --- small-star over edges oriented (big, small) ---
        oriented = edges.select(
            F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
        ).filter(F.col("a") != F.col("b"))
        mins = oriented.groupBy("a").agg(F.min("b").alias("m"))
        edges = (
            oriented.join(mins, "a")
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .unionByName(mins.select(F.col("a"), F.col("m").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # converged iff the round changed nothing: the (distinct)
        # edge sets are identical — equal cardinality + empty one-way
        # difference. Compared against the ROUND START, not between
        # the two half-steps, so a large-star change undone by
        # small-star still counts as progress-pending.
        if (
            edges.count() == prev.count()
            and edges.exceptAll(prev).count() == 0
        ):
            break
    else:
        raise RuntimeError(
            f"two-phase connected components did not converge in "
            f"{max_iter} alternations — raise max_iter (worst case "
            "O(log^2 n) rounds)"
        )
    # the fixpoint must be a star forest (every parent is a root):
    # guards against a composed-operator fixpoint that is not a star
    bad = edges.join(
        edges.select(F.col("a").alias("b")).distinct(), "b", "semi"
    ).count()
    assert bad == 0, f"two-phase CC fixpoint is not a star forest ({bad})"
    # star forest: every non-root points at its component min; roots
    # (the mins themselves) never appear on the child side
    return nodes.join(
        edges.select(F.col("a").alias("id"), F.col("b").alias("_c")),
        "id",
        "left",
    ).select("id", F.coalesce("_c", "id").alias("component"))


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    algorithm: str = "two_phase",
) -> DataFrame:
    """Duplicate-cluster assignment: connected components over the
    candidate-pair graph (the step after pair generation in every
    dedup pipeline — each component keeps one representative).
    Output: (id, component) with component = min id in the component.

    ``algorithm="two_phase"`` (default): the large-star / small-star
    alternation of Kiveris et al., "Connected Components in MapReduce
    and Beyond" (SoCC'14) — the web-scale choice. Each round is two
    (groupBy-min + equi-join) passes over the edge set; O(log^2 n)
    rounds worst case, and crucially the edge set per node SHRINKS as
    neighbors re-attach directly to the component minimum, so a giant
    component (the boilerplate cluster that dominates every web crawl)
    never concentrates its full membership behind one reduce key the
    way label propagation's min-agg on the hub's label does.

    ``algorithm="propagate"``: min-label propagation with a
    pointer-jump step each round (label := label-of-label) — fine for
    the shallow components bucket-generated pairs usually produce,
    kept as the simpler reference implementation.

    Both share the fixpoint semantics checked by the DuckDB
    recursive-CTE oracle; tests pin their outputs equal (including a
    giant-component fixture)."""
    if algorithm == "two_phase":
        return _cc_two_phase(pairs, src, dst, max_iter)
    assert algorithm == "propagate", algorithm
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
            .localCheckpoint(eager=True)
        )
        # pointer jump: l := label(l) against THIS round's labels
        # (labels are node ids) — shortcutting on the current state
        # is what makes the pointer tree halve per round; jumping on
        # the stale previous-round labels only adds one hop and
        # degrades convergence to ~diameter/2 rounds
        jump = new.select(
            F.col("v").alias("_lv"), F.col("l").alias("_ll")
        )
        new = (
            new.join(jump, new["l"] == jump["_lv"], "left")
            .select("v", F.least("l", F.coalesce("_ll", "l")).alias("l"))
            .localCheckpoint(eager=True)
        )
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
