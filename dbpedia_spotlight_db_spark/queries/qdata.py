"""Training-data pipeline operators (prompt-mandated first-class ops):
UDF families, dedup (exact / MinHash+LSH / SimHash / n-gram Jaccard),
ANN similarity search, text analytics, multimodal plumbing.

All hashing is md5-based so the DuckDB oracle reproduces values
bit-for-bit (see operators/dedup.py docstring).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

from ..operators import ann as ann_ops
from ..operators import dedup as dd
from ..operators import multimodal as mm
from .common import t

Q = {}
O = {}


def q(name: str, sql: str | None):
    def deco(fn):
        assert name not in Q, f"duplicate query key {name!r}"
        Q[name] = fn
        if sql is not None:
            O[name] = sql
        return fn

    return deco


# ---------------------------------------------------------------------------
# UDF families
# ---------------------------------------------------------------------------
@q(
    "udf_scalar",
    r"""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\s+')) AS INT) AS n_tokens
    FROM documents
    """,
)
def udf_scalar(spark, sf):
    """Arrow-batched pandas scalar UDF (token count); oracle is the
    pure-SQL equivalent."""

    @pandas_udf(T.IntegerType())
    def _ntok(text: pd.Series) -> pd.Series:
        # strip SPACES only — pandas .strip() takes all whitespace but
        # the twin's SQL trim() strips only ' ', and a leading tab
        # would then yield an extra '' token on the oracle side only.
        # NULL text propagates as NULL (the SQL twin's len(NULL)) —
        # bare .map(len) raises TypeError on the NaN a null becomes
        toks = text.str.strip(" ").str.split(r"\s+")
        return toks.map(
            lambda xs: len(xs) if isinstance(xs, list) else None
        ).astype("Int32")

    return t(spark, sf, "documents").select(
        "doc_id", _ntok(F.col("text")).alias("n_tokens")
    )


@q(
    "udf_map_iter",
    r"""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\s+')) AS INT)
             AS n_tokens,
           CAST(len(list_distinct(string_split_regex(trim(text), '\s+')))
             AS INT) AS n_types
    FROM documents
    """,
)
def udf_map_iter(spark, sf):
    """``mapInPandas`` API face — the batch-ITERATOR UDF family
    (vs udf_scalar's one-batch-in/one-batch-out pandas_udf): the
    function receives a stream of Arrow batches and yields output
    batches, which is the shape used when per-batch setup is
    expensive (model handles, decoders — operators/multimodal.py
    uses it for frame extraction) or when output cardinality differs
    from input. Here: token and distinct-token (type) counts per
    document, so the twin is plain SQL and the gate checks the whole
    iterator plumbing end-to-end."""

    def count_tokens(batches):
        for pdf in batches:
            # spaces only + NULL-propagating, matching SQL trim()/len
            # semantics — see udf_scalar
            toks = pdf["text"].str.strip(" ").str.split(r"\s+")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tokens": toks.map(
                        lambda xs: len(xs) if isinstance(xs, list) else None
                    ).astype("Int32"),
                    "n_types": toks.map(
                        lambda xs: len(set(xs))
                        if isinstance(xs, list)
                        else None
                    ).astype("Int32"),
                }
            )

    return t(spark, sf, "documents").mapInPandas(
        count_tokens, "doc_id long, n_tokens int, n_types int"
    )


@q(
    "udf_grouped",
    """
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(SUM(n_chars) AS BIGINT) / CAST(COUNT(*) AS BIGINT) AS avg_chars
    FROM documents GROUP BY lang
    """,
)
def udf_grouped(spark, sf):
    """applyInPandas grouped-map; aggregates computed with exact int
    math then one float division (engine-identical)."""
    out_schema = T.StructType(
        [
            T.StructField("lang", T.StringType()),
            T.StructField("n_docs", T.LongType()),
            T.StructField("sum_chars", T.LongType()),
            T.StructField("avg_chars", T.DoubleType()),
        ]
    )

    def _stats(pdf: pd.DataFrame) -> pd.DataFrame:
        s = int(pdf["n_chars"].sum())
        n = len(pdf)
        return pd.DataFrame(
            {
                "lang": [pdf["lang"].iloc[0]],
                "n_docs": [n],
                "sum_chars": [s],
                "avg_chars": [s / n],
            }
        )

    return (
        t(spark, sf, "documents")
        .groupBy("lang")
        .applyInPandas(_stats, out_schema)
    )


@q("udf_arrow", "SELECT doc_id, n_chars FROM documents")
def udf_arrow(spark, sf):
    """mapInArrow pass-through projection — proves the raw Arrow
    boundary; oracle is the trivial projection."""
    import pyarrow as pa

    def _ident(batches):
        for b in batches:
            yield b.select(["doc_id", "n_chars"])

    docs = t(spark, sf, "documents")
    return docs.mapInArrow(
        _ident,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("n_chars", T.LongType()),
            ]
        ),
    )


@q(
    "udtf_ngrams",
    """
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS arr
                 FROM documents),
    g AS (SELECT doc_id, arr, unnest(generate_series(1, len(arr) - 2)) AS i
          FROM tok)
    SELECT doc_id, CAST(i - 1 AS INT) AS pos,
           array_to_string(arr[i:i+2], ' ') AS ngram
    FROM g
    """,
)
def udtf_ngrams(spark, sf):
    """Python UDTF face (Spark 4 ``F.udtf``) — the one Python
    execution API the engine didn't exercise (scalar / grouped /
    arrow / cogrouped / map_iter all have faces): a user-defined
    TABLE function exploding each document into its word trigrams,
    invoked through a correlated LATERAL join so every input row
    fans out to a variable number of output rows inside the UDTF
    runtime. The relational twin is the array-slice unnest, so a
    green hash proves the UDTF's row-expansion contract end to end.
    Token definition = split on single space, matching DuckDB's
    string_split (consecutive spaces yield empty tokens on BOTH
    sides). Scale shape: the UDTF is a map-side Generate — zero
    shuffle, one pruned scan of (doc_id, text); n-gram work
    distributes with the documents partitioning."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, ngram: string")
    class NGrams:
        def eval(self, text):
            if text is None:
                return
            toks = text.split(" ")
            for i in range(len(toks) - 2):
                yield i, " ".join(toks[i : i + 3])

    spark.udtf.register("ngrams3", NGrams)
    t(spark, sf, "documents").select("doc_id", "text").createOrReplaceTempView(
        "udtf_docs"
    )
    return spark.sql(
        "SELECT d.doc_id, g.pos, g.ngram "
        "FROM udtf_docs d, LATERAL ngrams3(d.text) g"
    )


# ---------------------------------------------------------------------------
# Dedup family
# ---------------------------------------------------------------------------
@q(
    "dedup_exact",
    """
    SELECT md5(text) AS text_hash, COUNT(*) AS dup_count,
           MIN(doc_id) AS keeper
    FROM documents GROUP BY md5(text)
    """,
)
def dedup_exact(spark, sf):
    return dd.exact_dedup(t(spark, sf, "documents"), "doc_id", "text")


_SH_SQL = r"""
    t AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
    idx AS (SELECT doc_id, arr, generate_subscripts(arr, 1) AS i FROM t),
    sh AS (SELECT DISTINCT doc_id AS id,
                  arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS shingle
           FROM idx WHERE i <= len(arr) - 2)
"""


@q(
    "dedup_minhash",
    f"""
    WITH {_SH_SQL}
    SELECT id,
           MIN(substring(md5(shingle), 1, 8)) AS mh0,
           MIN(substring(md5(shingle), 9, 8)) AS mh1,
           MIN(substring(md5(shingle), 17, 8)) AS mh2,
           MIN(substring(md5(shingle), 25, 8)) AS mh3
    FROM sh GROUP BY id
    """,
)
def dedup_minhash(spark, sf):
    return dd.minhash_signatures(
        t(spark, sf, "documents"), "doc_id", "text", n_hashes=4, shingle_n=3
    )


@q(
    "dedup_lsh_pairs",
    f"""
    WITH {_SH_SQL},
    sigs AS (
      SELECT id,
             MIN(substring(md5(shingle), 1, 8)) AS mh0,
             MIN(substring(md5(shingle), 9, 8)) AS mh1,
             MIN(substring(md5(shingle), 17, 8)) AS mh2,
             MIN(substring(md5(shingle), 25, 8)) AS mh3
      FROM sh GROUP BY id),
    banded AS (
      SELECT id, 0 AS band, mh0 AS bucket FROM sigs
      UNION ALL SELECT id, 1, mh1 FROM sigs
      UNION ALL SELECT id, 2, mh2 FROM sigs
      UNION ALL SELECT id, 3, mh3 FROM sigs),
    okb AS (SELECT band, bucket FROM banded
            GROUP BY band, bucket HAVING COUNT(*) <= 1000),
    bk AS (SELECT b.id, b.band, b.bucket
           FROM banded b JOIN okb USING (band, bucket))
    SELECT DISTINCT a.id AS id_a, b.id AS id_b
    FROM bk a JOIN bk b
      ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
    """,
)
def dedup_lsh_pairs(spark, sf):
    """The twin mirrors lsh_pairs' max_bucket=1000 hot-bucket cap
    (band-bucket melt -> drop overfull buckets -> bucket-equality
    join) — a no-op at fixture scale but the exact semantics the
    operator keeps when a boilerplate mega-bucket appears, so the
    twins can never diverge on capped corpora (same rule as the
    jaccard df-cap)."""
    sigs = dd.minhash_signatures(
        t(spark, sf, "documents"), "doc_id", "text", n_hashes=4, shingle_n=3
    )
    return dd.lsh_pairs(sigs, n_hashes=4, bands=4)


@q(
    "dedup_jaccard",
    f"""
    WITH {_SH_SQL},
    okd AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 1000),
    shc AS (SELECT sh.id, sh.shingle FROM sh JOIN okd USING (shingle)),
    sizes AS (SELECT id, COUNT(*) AS n_sh FROM shc GROUP BY id),
    inter AS (
      SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS inter
      FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.id < b.id
      GROUP BY a.id, b.id)
    SELECT id_a, id_b,
           round(inter / (sa.n_sh + sb.n_sh - inter), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.id = id_a
    JOIN sizes sb ON sb.id = id_b
    WHERE round(inter / (sa.n_sh + sb.n_sh - inter), 6) >= 0.2
    """,
)
def dedup_jaccard(spark, sf):
    """df-capped Jaccard (max_df=1000): the twin mirrors the
    hot-shingle exclusion, which is a no-op at sf0.01 (500 docs) but
    defines the same semantics the operator keeps at corpus scale."""
    return dd.ngram_jaccard_pairs(
        t(spark, sf, "documents"), "doc_id", "text", shingle_n=3,
        threshold=0.2, max_df=1000,
    )


@q(
    "lsh_bucket_stats",
    f"""
    WITH {_SH_SQL},
    sigs AS (
      SELECT id,
             MIN(substring(md5(shingle), 1, 8)) AS mh0,
             MIN(substring(md5(shingle), 9, 8)) AS mh1,
             MIN(substring(md5(shingle), 17, 8)) AS mh2,
             MIN(substring(md5(shingle), 25, 8)) AS mh3
      FROM sh GROUP BY id),
    banded AS (
      SELECT 0 AS band, mh0 AS bucket FROM sigs
      UNION ALL SELECT 1, mh1 FROM sigs
      UNION ALL SELECT 2, mh2 FROM sigs
      UNION ALL SELECT 3, mh3 FROM sigs),
    sizes AS (SELECT band, bucket, COUNT(*) AS sz
              FROM banded GROUP BY band, bucket)
    SELECT band, CAST(sz AS BIGINT) AS bucket_size,
           CAST(COUNT(*) AS BIGINT) AS n_buckets
    FROM sizes GROUP BY band, sz
    """,
)
def lsh_bucket_stats(spark, sf):
    """LSH bucket-size histogram per band — the sizing diagnostic
    behind every banded self-join in this repo: candidate-pair volume
    is sum(sz^2)/2 per band, so this O(bands x distinct-sizes) report
    is what you read BEFORE picking lsh_pairs' max_bucket cap (the
    same probe-before-the-expensive-op pattern as graph_degree_dist).
    Two chained map-side-combinable aggs over the banded melt; the
    corpus-scale text scan happens once (signatures relation)."""
    sigs = dd.minhash_signatures(
        t(spark, sf, "documents"), "doc_id", "text", n_hashes=4, shingle_n=3
    )
    banded = sigs.selectExpr(
        "stack(4, 0, mh0, 1, mh1, 2, mh2, 3, mh3) AS (band, bucket)"
    )
    sizes = banded.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("sz")
    )
    return sizes.groupBy(
        "band", F.col("sz").cast("long").alias("bucket_size")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_buckets"))


@q(
    "dedup_containment",
    f"""
    WITH {_SH_SQL},
    okd AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 1000),
    shc AS (SELECT sh.id, sh.shingle FROM sh JOIN okd USING (shingle)),
    sizes AS (SELECT id, COUNT(*) AS n_sh FROM shc GROUP BY id),
    inter AS (
      SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS inter
      FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.id < b.id
      GROUP BY a.id, b.id),
    pb AS (SELECT id_a, id_b, inter, sa.n_sh AS n_a, sb.n_sh AS n_b
           FROM inter
           JOIN sizes sa ON sa.id = id_a
           JOIN sizes sb ON sb.id = id_b),
    dirp AS (
      SELECT id_a AS src_id, id_b AS dst_id,
             round(inter / n_a, 6) AS containment FROM pb
      UNION ALL
      SELECT id_b, id_a, round(inter / n_b, 6) FROM pb)
    SELECT src_id, dst_id, containment FROM dirp WHERE containment >= 0.4
    """,
)
def dedup_containment(spark, sf):
    """Directed shingle containment |S(src) ∩ S(dst)| / |S(src)| —
    the asymmetric complement to dedup_jaccard that catches
    quote/superset duplication (short page embedded in a long one
    scores ~1.0 here while its Jaccard stays low). Same inverted-
    index + df-cap scale shape; the unordered join is unpivoted into
    both directions AFTER the quadratic step (operators/dedup.py
    ngram_containment_pairs)."""
    return dd.ngram_containment_pairs(
        t(spark, sf, "documents"), "doc_id", "text", shingle_n=3,
        threshold=0.4, max_df=1000,
    )


@q(
    "dedup_components",
    f"""
    WITH RECURSIVE {_SH_SQL},
    sigs AS (
      SELECT id,
             MIN(substring(md5(shingle), 1, 8)) AS mh0,
             MIN(substring(md5(shingle), 9, 8)) AS mh1,
             MIN(substring(md5(shingle), 17, 8)) AS mh2,
             MIN(substring(md5(shingle), 25, 8)) AS mh3
      FROM sh GROUP BY id),
    banded AS (
      SELECT id, 0 AS band, mh0 AS bucket FROM sigs
      UNION ALL SELECT id, 1, mh1 FROM sigs
      UNION ALL SELECT id, 2, mh2 FROM sigs
      UNION ALL SELECT id, 3, mh3 FROM sigs),
    okb AS (SELECT band, bucket FROM banded
            GROUP BY band, bucket HAVING COUNT(*) <= 1000),
    bk AS (SELECT b.id, b.band, b.bucket
           FROM banded b JOIN okb USING (band, bucket)),
    prs AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM bk a JOIN bk b
        ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
    edges AS (SELECT id_a AS s, id_b AS d FROM prs
              UNION SELECT id_b, id_a FROM prs),
    nodes AS (SELECT DISTINCT s AS v FROM edges),
    reach(v, l) AS (
      SELECT v, v FROM nodes
      UNION
      SELECT e.d, r.l FROM reach r JOIN edges e ON e.s = r.v)
    SELECT v AS id, MIN(l) AS component FROM reach GROUP BY v
    """,
)
def dedup_components(spark, sf):
    """Dup-cluster assignment over the MinHash-LSH candidate pairs:
    connected components by pointer-jumping min-label propagation
    (operators/dedup.py). The DuckDB twin computes the identical
    fixpoint with a recursive CTE (symmetric reachability -> min
    reachable id per node)."""
    sigs = dd.minhash_signatures(
        t(spark, sf, "documents"), "doc_id", "text", n_hashes=4, shingle_n=3
    )
    pairs = dd.lsh_pairs(sigs, n_hashes=4, bands=4)
    return dd.connected_components(pairs)


@q(
    "dup_cluster_stats",
    f"""
    WITH RECURSIVE {_SH_SQL},
    sigs AS (
      SELECT id,
             MIN(substring(md5(shingle), 1, 8)) AS mh0,
             MIN(substring(md5(shingle), 9, 8)) AS mh1,
             MIN(substring(md5(shingle), 17, 8)) AS mh2,
             MIN(substring(md5(shingle), 25, 8)) AS mh3
      FROM sh GROUP BY id),
    banded AS (
      SELECT id, 0 AS band, mh0 AS bucket FROM sigs
      UNION ALL SELECT id, 1, mh1 FROM sigs
      UNION ALL SELECT id, 2, mh2 FROM sigs
      UNION ALL SELECT id, 3, mh3 FROM sigs),
    okb AS (SELECT band, bucket FROM banded
            GROUP BY band, bucket HAVING COUNT(*) <= 1000),
    bk AS (SELECT b.id, b.band, b.bucket
           FROM banded b JOIN okb USING (band, bucket)),
    prs AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM bk a JOIN bk b
        ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
    edges AS (SELECT id_a AS s, id_b AS d FROM prs
              UNION SELECT id_b, id_a FROM prs),
    nodes AS (SELECT DISTINCT s AS v FROM edges),
    reach(v, l) AS (
      SELECT v, v FROM nodes
      UNION
      SELECT e.d, r.l FROM reach r JOIN edges e ON e.s = r.v),
    comp AS (SELECT v AS id, MIN(l) AS component FROM reach GROUP BY v),
    szs AS (SELECT component, COUNT(*) AS sz FROM comp GROUP BY component)
    SELECT CAST(sz AS BIGINT) AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters
    FROM szs GROUP BY sz
    """,
)
def dup_cluster_stats(spark, sf):
    """Dup-cluster size histogram over the LSH candidate graph's
    connected components — the report a dedup run publishes (how much
    of the corpus sits in 2-clusters vs one boilerplate mega-cluster)
    and the early-warning probe for CC skew (a cluster spanning >x%
    of nodes says switch survivor selection to the large-star path).
    Two map-side-combinable aggs downstream of the pointer-jump CC;
    output is O(max cluster size)."""
    sigs = dd.minhash_signatures(
        t(spark, sf, "documents"), "doc_id", "text", n_hashes=4, shingle_n=3
    )
    comps = dd.connected_components(dd.lsh_pairs(sigs, n_hashes=4, bands=4))
    szs = comps.groupBy("component").agg(F.count(F.lit(1)).alias("sz"))
    return szs.groupBy(
        F.col("sz").cast("long").alias("cluster_size")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_clusters"))


@q(
    "dedup_survivors",
    f"""
    WITH RECURSIVE {_SH_SQL},
    sigs AS (
      SELECT id,
             MIN(substring(md5(shingle), 1, 8)) AS mh0,
             MIN(substring(md5(shingle), 9, 8)) AS mh1,
             MIN(substring(md5(shingle), 17, 8)) AS mh2,
             MIN(substring(md5(shingle), 25, 8)) AS mh3
      FROM sh GROUP BY id),
    banded AS (
      SELECT id, 0 AS band, mh0 AS bucket FROM sigs
      UNION ALL SELECT id, 1, mh1 FROM sigs
      UNION ALL SELECT id, 2, mh2 FROM sigs
      UNION ALL SELECT id, 3, mh3 FROM sigs),
    okb AS (SELECT band, bucket FROM banded
            GROUP BY band, bucket HAVING COUNT(*) <= 1000),
    bk AS (SELECT b.id, b.band, b.bucket
           FROM banded b JOIN okb USING (band, bucket)),
    prs AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM bk a JOIN bk b
        ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
    edges AS (SELECT id_a AS s, id_b AS d FROM prs
              UNION SELECT id_b, id_a FROM prs),
    nodes AS (SELECT DISTINCT s AS v FROM edges),
    reach(v, l) AS (
      SELECT v, v FROM nodes
      UNION
      SELECT e.d, r.l FROM reach r JOIN edges e ON e.s = r.v),
    comp AS (SELECT v AS id, MIN(l) AS component FROM reach GROUP BY v),
    losers AS (SELECT id FROM comp WHERE id <> component)
    SELECT d.doc_id FROM documents d
    WHERE NOT EXISTS (SELECT 1 FROM losers x WHERE x.id = d.doc_id)
    """,
)
def dedup_survivors(spark, sf):
    """End-to-end dedup: the documents that SURVIVE near-duplicate
    removal — each LSH dup-cluster keeps its min-id representative,
    documents in no cluster pass through. Spark shape: components
    (pointer-jumping) -> losers (id != component) -> left_anti against
    the corpus. The anti-join is deliberately UNHINTED: losers is
    O(dup_fraction x corpus) — commonly 30-80% of a web crawl — so a
    forced broadcast would ship a corpus-proportional relation to every
    executor. AQE broadcasts when the runtime size actually fits and
    falls back to a shuffled join when it doesn't."""
    docs = t(spark, sf, "documents")
    sigs = dd.minhash_signatures(docs, "doc_id", "text", n_hashes=4, shingle_n=3)
    comp = dd.connected_components(dd.lsh_pairs(sigs, n_hashes=4, bands=4))
    losers = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias("doc_id")
    )
    return docs.join(losers, "doc_id", "left_anti").select("doc_id")


def _simhash_sql(bits: int) -> str:
    hexdigits = "('1','3','5','7','9','b','d','f')"
    votes = ", ".join(
        f"SUM(CASE WHEN substring(h, {j + 1}, 1) IN {hexdigits} THEN 1 ELSE -1 END) AS v{j}"
        for j in range(bits)
    )
    bitstr = " || ".join(
        f"CASE WHEN v{j} > 0 THEN '1' ELSE '0' END" for j in range(bits)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id AS id, md5(unnest(string_split(lower(text), ' '))) AS h
      FROM documents),
    voted AS (SELECT id, {votes} FROM toks GROUP BY id)
    SELECT id, {bitstr} AS simhash FROM voted
    """


@q("dedup_simhash", _simhash_sql(16))
def dedup_simhash(spark, sf):
    return dd.simhash(t(spark, sf, "documents"), "doc_id", "text", bits=16)


@q(
    "dedup_simhash_pairs",
    f"""
    WITH fp AS ({_simhash_sql(16)}),
    banded AS (
      SELECT id, simhash, j AS band,
             substring(simhash, j * 4 + 1, 4) AS bucket
      FROM fp, (SELECT unnest([0, 1, 2, 3]) AS j)),
    s AS (
      SELECT a.id AS id_a, b.id AS id_b,
             len(list_filter(range(1, 17),
                 i -> substring(a.simhash, i, 1) <> substring(b.simhash, i, 1))) AS hamming
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id)
    SELECT DISTINCT id_a, id_b, CAST(hamming AS INT) AS hamming
    FROM s WHERE hamming <= 3
    """,
)
def dedup_simhash_pairs(spark, sf):
    """Banded Hamming near-dup pairs over 16-bit simhash fingerprints
    (4 chunks -> pigeonhole-EXACT recall at hamming <= 3). The twin
    replicates banding, in-row Hamming, and the <= 3 filter exactly —
    no bucket dropping on either side (exact recall forbids it; scale
    is governed by fingerprint width, see simhash_pairs docstring)."""
    fp = dd.simhash(t(spark, sf, "documents"), "doc_id", "text", bits=16)
    return dd.simhash_pairs(
        fp, bits=16, bands=4, max_hamming=3
    ).select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


# ---------------------------------------------------------------------------
# ANN similarity search
# ---------------------------------------------------------------------------
# zero-norm vectors score 0.0, mirroring the Spark operator's guard
# (a bare division would diverge or error on an all-zero embedding)
_COS_SQL = """
    round(
      CASE WHEN sqrt(list_sum(list_transform(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) > 0
            AND sqrt(list_sum(list_transform(nv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) > 0
      THEN
        list_sum(list_transform(range(1, len(qv) + 1),
                 i -> CAST(qv[i] AS DOUBLE) * CAST(nv[i] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
         * sqrt(list_sum(list_transform(nv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
      ELSE 0.0 END,
      6)
"""


@q(
    "ann_cosine_topk",
    f"""
    WITH qs AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 10),
    cs AS (SELECT vec_id AS nid, embedding AS nv FROM embeddings),
    s AS (SELECT qid, nid, {_COS_SQL} AS cos FROM qs, cs WHERE qid <> nid)
    SELECT qid, nid, cos, nn_rank FROM (
      SELECT qid, nid, cos,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS nn_rank
      FROM s) WHERE nn_rank <= 3
    """,
)
def ann_cosine_topk(spark, sf):
    emb = t(spark, sf, "embeddings")
    return ann_ops.cosine_topk(
        emb.filter(F.col("vec_id") < 10), emb, k=3
    )


@q(
    "dedup_embed",
    f"""
    WITH a AS (SELECT vec_id AS id_a, embedding AS qv,
                      sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS qn
               FROM embeddings),
         b AS (SELECT vec_id AS id_b, embedding AS nv,
                      sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS nn
               FROM embeddings),
         s AS (SELECT id_a, id_b,
                      CASE WHEN qn > 0 AND nn > 0
                           THEN round(list_sum(list_transform(range(1, len(qv) + 1),
                                      i -> CAST(qv[i] AS DOUBLE) * CAST(nv[i] AS DOUBLE))) / (qn * nn), 6)
                           ELSE 0.0 END AS cos
               FROM a, b WHERE id_a < id_b)
    SELECT id_a, id_b, cos FROM s WHERE cos >= 0.35
    """,
)
def dedup_embed(spark, sf):
    """Embedding-cosine near-duplicate pairs. Scale shape: at corpus
    scale route through ann.hyperplane_buckets and pair only within a
    bucket (same plan as dedup_lsh_pairs); here the exact all-pairs
    form is the oracle-checkable baseline."""
    emb = t(spark, sf, "embeddings")
    from ..operators.ann import _dot_expr, _norm_expr

    a = emb.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("qv")
    ).withColumn("qn", _norm_expr("qv"))
    b = emb.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("nv")
    ).withColumn("nn", _norm_expr("nv"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos",
            F.round(
                F.when(
                    (F.col("qn") > 0) & (F.col("nn") > 0),
                    _dot_expr("qv", "nv") / (F.col("qn") * F.col("nn")),
                ).otherwise(F.lit(0.0)),
                6,
            ),
        )
        .filter(F.col("cos") >= 0.35)
        .select("id_a", "id_b", "cos")
    )


_IVF_COS = """
    round(CASE WHEN {an} > 0 AND {bn} > 0
          THEN list_sum(list_transform(range(1, len({a}) + 1),
               i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))) / ({an} * {bn})
          ELSE 0.0 END, 6)
"""
_NORM = "sqrt(list_sum(list_transform({v}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"


@q(
    "ann_ivf_topk",
    f"""
    WITH cents AS (
      SELECT vec_id AS cid, embedding AS cv, {_NORM.format(v='embedding')} AS cn
      FROM embeddings ORDER BY vec_id LIMIT 8),
    vecs AS (
      SELECT vec_id, embedding, {_NORM.format(v='embedding')} AS vn FROM embeddings),
    assign AS (
      SELECT v.vec_id, v.embedding, v.vn, c.cid,
             row_number() OVER (
               PARTITION BY v.vec_id
               ORDER BY {_IVF_COS.format(a='v.embedding', b='c.cv', an='v.vn', bn='c.cn')} DESC, c.cid
             ) AS rn
      FROM vecs v, cents c),
    cell AS (SELECT vec_id, embedding, vn, cid FROM assign WHERE rn = 1),
    qs AS (SELECT vec_id AS qid, embedding AS qv, vn AS qn, cid FROM cell WHERE vec_id < 10),
    s AS (
      SELECT qs.qid, c.vec_id AS nid,
             {_IVF_COS.format(a='qs.qv', b='c.embedding', an='qs.qn', bn='c.vn')} AS cos
      FROM qs JOIN cell c ON qs.cid = c.cid AND qs.qid <> c.vec_id)
    SELECT qid, nid, cos, nn_rank FROM (
      SELECT qid, nid, cos,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS nn_rank
      FROM s) WHERE nn_rank <= 3
    """,
)
def ann_ivf_topk(spark, sf):
    """IVF-Flat with the deterministic coarse quantizer (lowest-id
    vectors as centroids); oracle replicates assignment + in-cell
    ranking exactly."""
    emb = t(spark, sf, "embeddings")
    return ann_ops.ivf_topk(emb.filter(F.col("vec_id") < 10), emb, k=3)


# Embedding dim is fixed by the driver fixture schema (TESTDATA.md /
# embeddings.parquet: embedding list<float> of 64) — a table-metadata
# constant, NOT probed with a driver-side .first() action.
_EMB_DIM = 64
_LSH_PLANES = 6


def _lsh_bucket_sql(vec: str) -> str:
    """DuckDB twin of operators.ann.hyperplane_buckets: same md5-derived
    ±1 planes (generated by the same Python function), inlined as list
    literals; one CASE per plane, concatenated msb-first."""
    planes = ann_ops.sign_planes(_EMB_DIM, _LSH_PLANES)
    bits = []
    for row in planes:
        lit = "[" + ", ".join(f"{s:.1f}" for s in row) + "]"
        bits.append(
            f"(CASE WHEN list_sum(list_transform(range(1, {_EMB_DIM} + 1),"
            f" i -> CAST({vec}[i] AS DOUBLE) * ({lit})[i])) > 0"
            " THEN '1' ELSE '0' END)"
        )
    return " || ".join(bits)


@q(
    "ann_lsh_topk",
    f"""
    WITH b AS (
      SELECT vec_id, embedding, {_NORM.format(v='embedding')} AS vn,
             {_lsh_bucket_sql('embedding')} AS bucket
      FROM embeddings),
    qs AS (SELECT vec_id AS qid, embedding AS qv, vn AS qn, bucket
           FROM b WHERE vec_id < 10),
    s AS (
      SELECT qs.qid, c.vec_id AS nid,
             {_IVF_COS.format(a='qs.qv', b='c.embedding', an='qs.qn', bn='c.vn')} AS cos
      FROM qs JOIN b c ON qs.bucket = c.bucket AND qs.qid <> c.vec_id)
    SELECT qid, nid, cos, nn_rank FROM (
      SELECT qid, nid, cos,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS nn_rank
      FROM s) WHERE nn_rank <= 3
    """,
)
def ann_lsh_topk(spark, sf):
    """Hyperplane-LSH bucketed top-k with deterministic md5-derived
    planes — full rows+schema+hash oracle (the IVF pattern from
    commit 1804524 applied to the LSH path)."""
    emb = t(spark, sf, "embeddings")
    return ann_ops.lsh_bucketed_topk(
        emb.filter(F.col("vec_id") < 10),
        emb,
        dim=_EMB_DIM,
        k=3,
        n_planes=_LSH_PLANES,
    )


@q(
    "ann_lsh_multiprobe",
    f"""
    WITH b AS (
      SELECT vec_id, embedding, {_NORM.format(v='embedding')} AS vn,
             {_lsh_bucket_sql('embedding')} AS bucket
      FROM embeddings),
    qs AS (SELECT vec_id AS qid, embedding AS qv, vn AS qn, bucket
           FROM b WHERE vec_id < 10),
    qp AS (
      SELECT qid, qv, qn,
             CASE WHEN j = 0 THEN bucket
                  ELSE substr(bucket, 1, j - 1)
                       || (CASE WHEN substr(bucket, j, 1) = '1' THEN '0' ELSE '1' END)
                       || substr(bucket, j + 1)
             END AS bucket
      FROM qs, (SELECT unnest(range(0, {_LSH_PLANES} + 1)) AS j)),
    s AS (
      SELECT qp.qid, c.vec_id AS nid,
             {_IVF_COS.format(a='qp.qv', b='c.embedding', an='qp.qn', bn='c.vn')} AS cos
      FROM qp JOIN b c ON qp.bucket = c.bucket AND qp.qid <> c.vec_id)
    SELECT qid, nid, cos, nn_rank FROM (
      SELECT qid, nid, cos,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS nn_rank
      FROM s) WHERE nn_rank <= 3
    """,
)
def ann_lsh_multiprobe(spark, sf):
    """Hamming-distance-1 multi-probe LSH top-k: the query fans out to
    its own bucket plus each one-bit-flipped bucket (n_planes+1
    probes), recovering neighbors that a single sign flip separated.
    Same deterministic md5-sign planes as ann_lsh_topk, full oracle."""
    emb = t(spark, sf, "embeddings")
    return ann_ops.lsh_bucketed_topk(
        emb.filter(F.col("vec_id") < 10),
        emb,
        dim=_EMB_DIM,
        k=3,
        n_planes=_LSH_PLANES,
        multiprobe=True,
    )


@q(
    "embed_quantize",
    """
    WITH m AS (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding,
                      x -> abs(CAST(x AS DOUBLE)))) AS maxabs
      FROM embeddings),
    e0 AS (
      SELECT vec_id, embedding, maxabs,
             unnest(range(0, len(embedding))) AS j
      FROM m)
    SELECT vec_id, round(maxabs / 127.0, 9) AS scale,
           CAST(j AS INT) AS dim_idx,
           CASE WHEN maxabs > 0
                THEN CAST(round(CAST(embedding[j + 1] AS DOUBLE) * 127.0 / maxabs) AS INT)
                ELSE 0 END AS qval
    FROM e0
    """,
)
def embed_quantize(spark, sf):
    """int8 symmetric quantization of the embedding column — the
    standard compression for web-scale vector stores (4x smaller than
    float32, dequantize = qval * scale). Per-vector max-abs scaling,
    qval = round(x * 127 / maxabs) in [-127, 127]; all column HOFs,
    no UDF, and exploded (vec_id, dim_idx, qval) rows so the driver
    comparator can hash them. Both engines round half-away-from-zero,
    so the twin matches bit-for-bit."""
    emb = t(spark, sf, "embeddings")
    maxabs = F.array_max(
        F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double")))
    )
    m = emb.select("vec_id", "embedding", maxabs.alias("maxabs"))
    return m.select(
        "vec_id",
        F.round(F.col("maxabs") / 127.0, 9).alias("scale"),
        F.posexplode("embedding").alias("dim_idx", "x"),
        "maxabs",
    ).select(
        "vec_id",
        "scale",
        "dim_idx",
        F.when(
            F.col("maxabs") > 0,
            F.round(F.col("x").cast("double") * 127.0 / F.col("maxabs")),
        )
        .otherwise(F.lit(0))
        .cast("int")
        .alias("qval"),
    )


# ---------------------------------------------------------------------------
# Text analytics
# ---------------------------------------------------------------------------
_STOP_SQL = "['the','a','of','and','to','in']"


@q(
    "text_quality",
    rf"""
    WITH b AS (
      SELECT doc_id,
             CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS n_tokens,
             CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
               / greatest(CAST(length(text) AS DOUBLE), 1.0) AS alpha_ratio,
             CAST(len(list_intersect(string_split_regex(lower(text), '\s+'), {_STOP_SQL})) AS DOUBLE) AS stop_hits
      FROM documents)
    SELECT doc_id,
           round(0.4 * least(n_tokens / 50.0, 1.0)
               + 0.4 * alpha_ratio
               + 0.2 * least(stop_hits / 3.0, 1.0), 6) AS quality
    FROM b
    """,
)
def text_quality(spark, sf):
    docs = t(spark, sf, "documents")
    n_tokens = F.size(F.split(F.trim("text"), r"\s+")).cast("double")
    alpha = F.length(
        F.regexp_replace("text", r"[^A-Za-z ]", "")
    ).cast("double") / F.greatest(
        F.length("text").cast("double"), F.lit(1.0)
    )
    stop_hits = F.size(
        F.array_intersect(
            F.split(F.lower("text"), r"\s+"),
            F.array(*[F.lit(w) for w in ["the", "a", "of", "and", "to", "in"]]),
        )
    ).cast("double")
    return docs.select(
        "doc_id",
        F.round(
            0.4 * F.least(n_tokens / 50.0, F.lit(1.0))
            + 0.4 * alpha
            + 0.2 * F.least(stop_hits / 3.0, F.lit(1.0)),
            6,
        ).alias("quality"),
    )


_LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "fr": ["le", "la", "et"],
    "es": ["el", "los", "que"],
    "de": ["der", "und", "das"],
}


def _lang_sql() -> str:
    s = {
        lang: "len(list_intersect(ws, ["
        + ", ".join(f"'{w}'" for w in ws)
        + "]))"
        for lang, ws in _LANG_MARKERS.items()
    }
    return rf"""
    WITH b AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS ws FROM documents),
    sc AS (SELECT doc_id, {s['en']} AS s_en, {s['fr']} AS s_fr,
                  {s['es']} AS s_es, {s['de']} AS s_de FROM b)
    SELECT doc_id,
           CASE WHEN s_en = 0 AND s_fr = 0 AND s_es = 0 AND s_de = 0 THEN 'und'
                WHEN s_de > s_es AND s_de > s_fr AND s_de > s_en THEN 'de'
                WHEN s_es > s_fr AND s_es > s_en THEN 'es'
                WHEN s_fr > s_en THEN 'fr'
                ELSE 'en' END AS lang_guess
    FROM sc
    """


@q("text_langid", _lang_sql())
def text_langid(spark, sf):
    from ..functions.text import langid_ngram_col

    return t(spark, sf, "documents").select(
        "doc_id", langid_ngram_col(F.col("text")).alias("lang_guess")
    )


@q(
    "text_token_count",
    r"""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\s+')) AS INT) AS n_tokens
    FROM documents
    """,
)
def text_token_count(spark, sf):
    from ..functions.text import token_count_col

    return t(spark, sf, "documents").select(
        "doc_id", token_count_col(F.col("text")).cast("int").alias("n_tokens")
    )


@q(
    "text_fingerprint",
    r"""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(
               string_split_regex(lower(text), '\s+'))), ' ')) AS fp
    FROM documents
    """,
)
def text_fingerprint(spark, sf):
    from ..functions.text import fingerprint_col

    return t(spark, sf, "documents").select(
        "doc_id", fingerprint_col(F.col("text")).alias("fp")
    )


def _stop_list_sql() -> str:
    from ..functions.text import LINKING_STOPWORDS

    return "[" + ", ".join(f"'{w}'" for w in sorted(LINKING_STOPWORDS)) + "]"


@q(
    "text_stopword_ratio",
    rf"""
    WITH b AS (SELECT doc_id,
                      string_split_regex(lower(trim(text)), '\s+') AS ws
               FROM documents)
    SELECT doc_id,
           round(CAST(len(list_filter(ws, w -> list_contains({_stop_list_sql()}, w))) AS DOUBLE)
                 / greatest(len(ws), 1), 6) AS stop_ratio
    FROM b
    """,
)
def text_stopword_ratio(spark, sf):
    """T2 stopword flag exposed to the correctness gate: multiset
    stopword fraction per document against the linking analyzer's
    stopword list (the same frozenset the tokenizer/stores use),
    computed with pure column HOFs (codegen'd)."""
    from ..functions.text import LINKING_STOPWORDS

    stops = F.array(*[F.lit(w) for w in sorted(LINKING_STOPWORDS)])
    words = F.split(F.lower(F.trim("text")), r"\s+")
    stop_hits = F.size(F.filter(words, lambda w: F.array_contains(stops, w)))
    return t(spark, sf, "documents").select(
        "doc_id",
        F.round(
            stop_hits.cast("double") / F.greatest(F.size(words), F.lit(1)),
            6,
        ).alias("stop_ratio"),
    )


@q(
    "dedup_embed_lsh",
    f"""
    WITH b AS (
      SELECT vec_id, embedding, {_NORM.format(v='embedding')} AS vn,
             {_lsh_bucket_sql('embedding')} AS bucket
      FROM embeddings),
    s AS (
      SELECT a.vec_id AS id_a, c.vec_id AS id_b,
             {_IVF_COS.format(a='a.embedding', b='c.embedding', an='a.vn', bn='c.vn')} AS cos
      FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id)
    SELECT id_a, id_b, cos FROM s WHERE cos >= 0.35
    """,
)
def dedup_embed_lsh(spark, sf):
    """Embedding near-dup pairs through the SCALE path: candidates
    restricted to a shared hyperplane-LSH bucket (deterministic
    md5-sign planes — same quantizer as ann_lsh_topk), exact cosine
    within the bucket. This is the bucketed plan dedup_embed's
    docstring routes to at corpus scale, now with its own full
    rows+schema+hash oracle; the all-pairs dedup_embed stays as the
    exact-recall baseline."""
    emb = t(spark, sf, "embeddings")
    b = ann_ops.hyperplane_buckets(
        emb, dim=_EMB_DIM, n_planes=_LSH_PLANES
    ).select("vec_id", "embedding", "bucket")
    from ..operators.ann import _dot_expr, _norm_expr

    a = b.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("qv"),
        "bucket",
    ).withColumn("qn", _norm_expr("qv"))
    c = b.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("nv"),
        "bucket",
    ).withColumn("nn", _norm_expr("nv"))
    return (
        a.join(c, ["bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos",
            F.round(
                F.when(
                    (F.col("qn") > 0) & (F.col("nn") > 0),
                    _dot_expr("qv", "nv") / (F.col("qn") * F.col("nn")),
                ).otherwise(F.lit(0.0)),
                6,
            ),
        )
        .filter(F.col("cos") >= 0.35)
        .select("id_a", "id_b", "cos")
    )


# ---------------------------------------------------------------------------
# Multimodal plumbing
# ---------------------------------------------------------------------------
@q(
    "multimodal_meta",
    """
    SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes,
           md5(text) AS checksum
    FROM documents
    """,
)
def multimodal_meta(spark, sf):
    media = mm.attach_binary_payload(
        t(spark, sf, "documents"), "doc_id", "text"
    )
    feats = mm.extract_features(media)
    return feats.select(
        "media_id", F.col("n_bytes").cast("long").alias("n_bytes"), "checksum"
    )


@q(
    "multimodal_features",
    """
    WITH m AS (SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes,
                      md5(text) AS checksum FROM documents),
         d AS (SELECT media_id, n_bytes, checksum, CAST(j AS INT) AS dim_idx,
                      16 * (strpos('0123456789abcdef', substring(checksum, 2*j+1, 1)) - 1)
                       + (strpos('0123456789abcdef', substring(checksum, 2*j+2, 1)) - 1) AS byte
               FROM m, (SELECT unnest([0,1,2,3,4,5,6,7]) AS j))
    SELECT media_id, n_bytes, checksum, dim_idx,
           round(byte / 255.0, 6) AS value
    FROM d
    """,
)
def multimodal_features(spark, sf):
    """Feature extraction through the real mapInPandas decode path,
    surfaced as hashable exploded rows (media_id, dim_idx, value) —
    array cells can't be canonicalized by the driver's pandas
    sorter. The fake decoder's features are md5(payload) bytes / 255
    as float32; exploding and snapping back to the exact byte value
    (round(v*255) is exact for float32(b/255)) lets the DuckDB twin
    reproduce every value from the md5 hex pair — a full
    rows+schema+hash check of the decode plumbing."""
    media = mm.attach_binary_payload(
        t(spark, sf, "documents"), "doc_id", "text"
    )
    feats = mm.extract_features(media)
    return feats.select(
        "media_id",
        "n_bytes",
        "checksum",
        F.posexplode("features").alias("dim_idx", "v"),
    ).select(
        "media_id",
        "n_bytes",
        "checksum",
        "dim_idx",
        F.round(
            F.round(F.col("v") * 255).cast("int") / F.lit(255.0), 6
        ).alias("value"),
    )


@q(
    "multimodal_frames",
    """
    WITH m AS (SELECT doc_id AS media_id,
                      octet_length(encode(text)) AS len FROM documents),
         n AS (SELECT media_id, len, GREATEST(1, len // 4) AS fn FROM m),
         f AS (SELECT media_id, CAST(j AS INT) AS frame_idx,
                      LEAST(fn, len - j * fn) AS frame_bytes
               FROM n, (SELECT unnest([0, 1, 2, 3]) AS j)
               WHERE j * fn < len)
    SELECT media_id, frame_idx, CAST(frame_bytes AS BIGINT) AS frame_bytes
    FROM f
    """,
)
def multimodal_frames(spark, sf):
    """Frame-sampling plumbing: the oracle cross-checks the byte-window
    arithmetic of the deterministic fake decoder (one row per sampled
    frame, evenly spaced windows over the payload)."""
    media = mm.attach_binary_payload(
        t(spark, sf, "documents"), "doc_id", "text"
    )
    return mm.frame_sample(media, n_frames=4).select(
        "media_id", "frame_idx", "frame_bytes"
    )


@q(
    "multimodal_resize",
    """
    SELECT doc_id AS media_id, CAST(64 AS BIGINT) AS n_bytes
    FROM documents
    """,
)
def multimodal_resize(spark, sf):
    """Resize plumbing: fixed-size output representation per media row
    (the fake pads/truncates to 64 bytes; oracle checks cardinality +
    the size invariant)."""
    media = mm.attach_binary_payload(
        t(spark, sf, "documents"), "doc_id", "text"
    )
    return mm.resize_media(media, target_bytes=64).select(
        "media_id", F.col("n_bytes").cast("long").alias("n_bytes")
    )


@q(
    "text_unigram_lm",
    r"""
    WITH tok AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(trim(text)), '\s+')) AS tk
      FROM documents),
    cnt AS (SELECT tk, COUNT(*) AS c FROM tok GROUP BY tk),
    tot AS (SELECT SUM(c) AS n FROM cnt)
    SELECT tok.doc_id,
           round(AVG(-ln(CAST(cnt.c AS DOUBLE) / tot.n)), 6) AS nll
    FROM tok JOIN cnt ON tok.tk = cnt.tk CROSS JOIN tot
    GROUP BY tok.doc_id
    """,
)
def text_unigram_lm(spark, sf):
    """Unigram language-model quality score: per-document mean
    negative log-likelihood under the corpus's own unigram
    distribution — the classic cheap fluency/outlier signal for
    training-data filtering (gibberish and boilerplate-stuffed docs
    sit in the tails). Scale shape: the vocabulary count is a
    map-side-combinable agg; the per-token log-prob dimension is
    vocabulary-sized so it is NOT hint-broadcast — on 100 TB of web
    text distinct whitespace tokens (URLs, hashes, typos) run to
    billions, and a forced broadcast of a corpus-cardinality relation
    OOMs executors instead of spilling (r2's survivors lesson). AQE
    broadcasts the join at runtime when the table actually fits; at
    web scale it degrades to a sort-merge join on tk, which is the
    correct plan there. Only the 1-row total stays hinted. The per-doc
    mean partial-aggs before its shuffle. Token definition =
    whitespace split, matching text_stopword_ratio's twin exactly."""
    d = t(spark, sf, "documents")
    tok = d.select(
        "doc_id",
        F.explode(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+")
        ).alias("tk"),
    )
    cnt = tok.groupBy("tk").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.agg(F.sum("c").cast("double").alias("n"))
    logp = cnt.crossJoin(F.broadcast(tot)).select(
        "tk", (-F.log(F.col("c") / F.col("n"))).alias("nll_tk")
    )
    return (
        tok.join(logp, "tk")
        .groupBy("doc_id")
        .agg(F.round(F.avg("nll_tk"), 6).alias("nll"))
    )


from ..functions.web import normalize_url as _normalize_url
from ..functions.web import normalize_url_sql as _normalize_url_sql

_MESSY_URL_SQL = """
    CASE doc_id % 4
      WHEN 0 THEN 'HTTP://WWW.Example.com:80/a/' || CAST(doc_id AS VARCHAR)
                  || '/?utm_source=feed&b=2&a=1#frag'
      WHEN 1 THEN 'https://Example.COM:443/path/To/'
                  || CAST(doc_id AS VARCHAR) || '?fbclid=abc&z=9&y=1'
      WHEN 2 THEN 'http://CDN.example.com:8080'
      ELSE 'https://sub.example.com/c/d///?a=1&utm_campaign=x&ref=tw'
    END
"""


@q(
    "url_normalize",
    f"""
    WITH u AS (SELECT doc_id, {_MESSY_URL_SQL} AS url FROM documents)
    SELECT doc_id, {_normalize_url_sql('url')} AS url_norm FROM u
    """,
)
def url_normalize(spark, sf):
    """URL canonicalization (functions/web.normalize_url): the
    pre-dedup key rewrite every crawl corpus needs — lowercase
    scheme/host, strip www + default ports + fragments + tracking
    params, sort the query string, collapse trailing slashes. The
    fixture synthesizes a deterministic messy URL per doc_id (the
    corpus table carries no real URLs); BOTH sides build the same
    string, so the oracle checks the normalizer itself — whose DuckDB
    twin lives next to the Spark rules in functions/web.py. Pure
    column expressions end-to-end: codegen'd, scan-pushed, zero
    shuffle."""
    d = t(spark, sf, "documents")
    return d.select(
        "doc_id", _normalize_url(_messy_url_expr()).alias("url_norm")
    )


def _messy_url_expr():
    """Spark twin of ``_MESSY_URL_SQL`` — the deterministic messy-URL
    fixture keyed on doc_id (branches 2 and 3 are CONSTANT urls, so
    they alias across documents — the duplicate signal dedup_url
    exercises)."""
    m = F.col("doc_id") % 4
    sid = F.col("doc_id").cast("string")
    return (
        F.when(
            m == 0,
            F.concat(
                F.lit("HTTP://WWW.Example.com:80/a/"),
                sid,
                F.lit("/?utm_source=feed&b=2&a=1#frag"),
            ),
        )
        .when(
            m == 1,
            F.concat(
                F.lit("https://Example.COM:443/path/To/"),
                sid,
                F.lit("?fbclid=abc&z=9&y=1"),
            ),
        )
        .when(m == 2, F.lit("http://CDN.example.com:8080"))
        .otherwise(
            F.lit("https://sub.example.com/c/d///?a=1&utm_campaign=x&ref=tw")
        )
    )


@q(
    "dedup_url",
    f"""
    WITH u AS (SELECT doc_id, {_MESSY_URL_SQL} AS url FROM documents),
    n AS (SELECT doc_id, {_normalize_url_sql('url')} AS url_norm FROM u)
    SELECT url_norm, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS keeper
    FROM n GROUP BY url_norm
    """,
)
def dedup_url(spark, sf):
    """URL-canonical exact dedup — the FIRST dedup pass a crawl
    corpus runs, before any content hashing: normalize each page's
    URL (url_normalize's rewrite) and collapse to one row per
    canonical URL with the deterministic min-doc_id keeper — recrawls
    and tracking-param aliases of the same page (the fixture's
    constant branches) fold together without touching page text.
    Plan shape: map-only key rewrite + one map-side-combinable
    min/count agg keyed on the canonical URL — cheaper than
    dedup_exact by the full text-hash cost, which is why real
    pipelines run it first. Exact integers and strings only."""
    d = t(spark, sf, "documents")
    return (
        d.select("doc_id", _normalize_url(_messy_url_expr()).alias("url_norm"))
        .groupBy("url_norm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("keeper"),
        )
    )


# ---------------------------------------------------------------------------
# one-scan table profiling (pipeline data-quality report)
# ---------------------------------------------------------------------------
_PROFILE_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def _profile_sql() -> str:
    parts = [
        f"""
        SELECT '{c}' AS col_name,
               COUNT({c}) AS n_nonnull,
               COUNT(DISTINCT {c}) AS n_distinct,
               CAST(MIN({c}) AS VARCHAR) AS min_val,
               CAST(MAX({c}) AS VARCHAR) AS max_val
        FROM documents
        """
        for c in _PROFILE_COLS
    ]
    return " UNION ALL ".join(parts)


@q("profile_columns", _profile_sql())
def profile_columns(spark, sf):
    """Per-column table profile (non-null count, exact distinct
    cardinality, min/max rendered as strings) — the data-quality
    report a pipeline runs before and after every curation stage.
    ONE scan of the table: all 5 columns x 4 measures are a single
    aggregation, then the 1-row result is inlined into one row per
    column driver-side-free (F.inline over an array of structs — no
    per-column re-scan, which is what matters when the table is
    100 TB; the DuckDB twin's UNION ALL per-column re-scan is
    oracle-only). The multi-column exact count(distinct) plans as one
    Expand (x5 row multiplier) feeding a shared partial agg — at
    corpus scale swap in approx_count_distinct (the HLL face of
    agg_approx_cd) per column, which drops the Expand entirely;
    min/max compare on the NATIVE type and cast after, so numeric
    columns never sort lexicographically."""
    d = t(spark, sf, "documents")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(c).alias(f"n_{c}"),
            F.count_distinct(F.col(c)).alias(f"d_{c}"),
            F.min(c).cast("string").alias(f"mn_{c}"),
            F.max(c).cast("string").alias(f"mx_{c}"),
        ]
    row = d.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"n_{c}").alias("n_nonnull"),
                F.col(f"d_{c}").alias("n_distinct"),
                F.col(f"mn_{c}").alias("min_val"),
                F.col(f"mx_{c}").alias("max_val"),
            )
            for c in _PROFILE_COLS
        ]
    )
    return row.select(F.inline(entries))


# ---------------------------------------------------------------------------
# BPE-ish pretokenizer count (the subword-side token budget)
# ---------------------------------------------------------------------------
# GPT-2-style pretokenizer, simplified to the lookahead-free common
# subset of Java regex (Spark) and RE2 (DuckDB): contractions, then
# space-prefixed letter / digit / punctuation runs. Alternatives are
# disjoint by leading character class, so leftmost-first (Java) and
# leftmost-longest (RE2) pick identical matches.
_BPE_RE = r"'[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"
_BPE_RE_SQL = _BPE_RE.replace("'", "''")


@q(
    "text_token_bpe",
    rf"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_BPE_RE_SQL}')) AS INT) AS n_bpe,
           CAST(len(string_split_regex(trim(text), '\s+')) AS INT) AS n_ws
    FROM documents
    """,
)
def text_token_bpe(spark, sf):
    """Token counting, both budgets the brief names: whitespace words
    (n_ws — the text_token_count primitive) and a BPE-ish pretokenizer
    match count (n_bpe — the subword proxy every training-data token
    accountant actually bills by; a GPT-2-style pretokenizer regex
    counts contraction/letter/digit/punctuation pieces, which upper-
    bounds merged-BPE length and tracks it closely on web text). Pure
    JVM regexp_count — map-only, zero UDF, scan reads 2 of 5 columns;
    the regex avoids lookaheads so the Java and RE2 engines tokenize
    identically (pinned by the oracle twin)."""
    from ..functions.text import token_count_col

    d = t(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit(_BPE_RE)).cast("int").alias("n_bpe"),
        token_count_col(F.col("text")).cast("int").alias("n_ws"),
    )


@q(
    "text_unigram_lm_pruned",
    r"""
    WITH tok AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(trim(text)), '\s+')) AS tk
      FROM documents),
    cnt AS (SELECT tk, COUNT(*) AS c FROM tok GROUP BY tk),
    tot AS (SELECT SUM(c) AS n FROM cnt),
    kept AS (SELECT tk, c FROM cnt WHERE c >= 3),
    oov AS (SELECT COALESCE(SUM(c), 0) AS oc FROM cnt WHERE c < 3)
    SELECT tok.doc_id,
           round(AVG(-ln(CAST(COALESCE(kept.c, oov.oc) AS DOUBLE)
                         / tot.n)), 6) AS nll
    FROM tok LEFT JOIN kept ON tok.tk = kept.tk
    CROSS JOIN tot CROSS JOIN oov
    GROUP BY tok.doc_id
    """,
)
def text_unigram_lm_pruned(spark, sf):
    """Unigram LM scoring with a document-frequency FLOOR and
    OOV smoothing — the scale-safe variant of text_unigram_lm
    (VERDICT r3 #2's suggested completion): tokens seen fewer than
    3 times collapse into one shared UNK bucket carrying their
    aggregate probability mass, so the log-prob dimension is the
    PRUNED vocabulary (heavy-tail URLs/hashes/typos — the billions
    of web-scale singletons — never materialize as join keys), while
    every document still scores every token (unseen -> p_unk, never
    ln(0): a token below the floor always contributes positive mass
    to the UNK bucket). Same whitespace tokenization, same unhinted
    vocabulary join (AQE broadcasts iff it fits — audit #31's
    no-forced-broadcast rule), same AVG(-ln p) parity surface as the
    unpruned face; the UNK mass and token total attach as hinted
    1-row broadcasts."""
    d = t(spark, sf, "documents")
    tok = d.select(
        "doc_id",
        F.explode(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+")
        ).alias("tk"),
    )
    cnt = tok.groupBy("tk").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.agg(F.sum("c").cast("double").alias("n"))
    kept = cnt.filter(F.col("c") >= 3)
    oov = cnt.filter(F.col("c") < 3).agg(
        F.coalesce(F.sum("c"), F.lit(0)).alias("oc")
    )
    return (
        tok.join(kept, "tk", "left")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(oov))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.avg(
                    -F.log(
                        F.coalesce("c", "oc").cast("double") / F.col("n")
                    )
                ),
                6,
            ).alias("nll")
        )
    )


# ---------------------------------------------------------------------------
# polymorphic UDTF — output schema computed by analyze() from a literal
# ---------------------------------------------------------------------------
_SPLIT_FIXED_N = 3


@q(
    "udtf_analyze",
    f"""
    WITH s AS (SELECT doc_id, string_split(text, ' ') AS arr
               FROM documents WHERE doc_id % 101 = 0)
    SELECT doc_id, arr[1] AS w1, arr[2] AS w2, arr[3] AS w3
    FROM s
    """,
)
def udtf_analyze(spark, sf):
    """POLYMORPHIC Python UDTF (Spark 4 ``analyze()`` contract): the
    output schema is not declared statically — Catalyst calls the
    UDTF's ``analyze()`` at PLAN time with the literal argument
    (n = 3) and the function computes its own result schema (w1..wn),
    the API that lets one table function serve any arity (fixed-width
    splitters, pivots, configurable feature extractors) without a
    registration per shape. Complements udtf_ngrams, which exercises
    the static-returnType path. The twin is DuckDB's 1-based array
    indexing (out-of-range -> NULL, matching the eval's padding;
    NULL text -> all-NULL row on both). Scale shape: map-side
    Generate over the pruned (doc_id, text) scan, zero shuffle; the
    doc_id % 101 sample keeps the gated output fixture-sized."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeResult

    class SplitFixed:
        @staticmethod
        def analyze(text_arg, n_arg):
            n = int(n_arg.value)
            schema = StructType()
            for i in range(n):
                schema = schema.add(f"w{i + 1}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, text, n):
            toks = [] if text is None else text.split(" ")
            yield tuple(
                (toks[i] if i < len(toks) else None) for i in range(n)
            )

    spark.udtf.register("split_fixed", udtf(SplitFixed))
    d = t(spark, sf, "documents").filter(F.col("doc_id") % 101 == 0)
    d.select("doc_id", "text").createOrReplaceTempView("udtf_analyze_docs")
    return spark.sql(
        "SELECT d.doc_id, s.* FROM udtf_analyze_docs d, "
        f"LATERAL split_fixed(d.text, {_SPLIT_FIXED_N}) s"
    )


# ---------------------------------------------------------------------------
# MinHash estimator quality — sketch estimate vs exact Jaccard, gated
# ---------------------------------------------------------------------------
@q(
    "dedup_minhash_eval",
    f"""
    WITH {_SH_SQL},
    okd AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 1000),
    shc AS (SELECT sh.id, sh.shingle FROM sh JOIN okd USING (shingle)),
    sizes AS (SELECT id, COUNT(*) AS n_sh FROM shc GROUP BY id),
    inter AS (
      SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS inter
      FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.id < b.id
      GROUP BY a.id, b.id),
    pairs AS (
      SELECT id_a, id_b,
             round(inter / (sa.n_sh + sb.n_sh - inter), 6) AS jac
      FROM inter
      JOIN sizes sa ON sa.id = id_a
      JOIN sizes sb ON sb.id = id_b
      WHERE round(inter / (sa.n_sh + sb.n_sh - inter), 6) >= 0.2),
    sigs AS (
      SELECT id,
             MIN(substring(md5(shingle), 1, 8)) AS mh0,
             MIN(substring(md5(shingle), 9, 8)) AS mh1,
             MIN(substring(md5(shingle), 17, 8)) AS mh2,
             MIN(substring(md5(shingle), 25, 8)) AS mh3
      FROM sh GROUP BY id),
    ev AS (
      SELECT p.jac,
             (CASE WHEN a.mh0 = b.mh0 THEN 1 ELSE 0 END
              + CASE WHEN a.mh1 = b.mh1 THEN 1 ELSE 0 END
              + CASE WHEN a.mh2 = b.mh2 THEN 1 ELSE 0 END
              + CASE WHEN a.mh3 = b.mh3 THEN 1 ELSE 0 END) / 4.0 AS est
      FROM pairs p
      JOIN sigs a ON a.id = p.id_a
      JOIN sigs b ON b.id = p.id_b),
    er AS (
      SELECT CAST(round(1000000.0 * abs(est - jac)) AS BIGINT) AS err_us,
             CAST(round(1000000.0 * (est - jac)) AS BIGINT) AS bias_us
      FROM ev),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
                 SUM(err_us) AS se, SUM(bias_us) AS sb FROM er)
    SELECT n_pairs,
           CASE WHEN n_pairs = 0 THEN NULL
                ELSE round(CAST(se AS DOUBLE) / n_pairs / 1000000.0, 6) + 0
           END AS mae,
           CASE WHEN n_pairs = 0 THEN NULL
                ELSE round(CAST(sb AS DOUBLE) / n_pairs / 1000000.0, 6) + 0
           END AS bias
    FROM s
    """,
)
def dedup_minhash_eval(spark, sf):
    """Measure, don't guess — the estimator-quality report for the
    dedup stack's own sketch: over every exact-Jaccard pair (the
    df-capped dedup_jaccard construction, threshold 0.2), the
    MinHash-estimated similarity (fraction of the 4 signature slots
    that agree — exact multiples of 0.25) is compared to the exact
    value, and the face reports pair count, mean absolute error, and
    signed bias. This is the number that justifies the band/row
    configuration of dedup_lsh_pairs at 100 TB: if MAE drifts on a
    new corpus, the sketch width is wrong BEFORE the dedup job runs.
    Float discipline: per-pair errors quantize to integer MICROS
    before the sum (exact, order-independent BIGINT agg — the
    kg_adamic_adar lesson), so the means are single divisions of
    exact integers. Scale shape: both inputs are already-proven
    bounded relations (capped pair join + vocab-sized signature agg);
    the estimate attach is two signature equi-joins."""
    docs = t(spark, sf, "documents")
    pairs = dd.ngram_jaccard_pairs(
        docs, "doc_id", "text", shingle_n=3, threshold=0.2, max_df=1000
    ).select("id_a", "id_b", F.col("jaccard").alias("jac"))
    sigs = dd.minhash_signatures(
        docs, "doc_id", "text", n_hashes=4, shingle_n=3
    )
    a = sigs.select(
        F.col("id").alias("id_a"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(4)],
    )
    b = sigs.select(
        F.col("id").alias("id_b"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(4)],
    )
    matches = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(4)
    )
    ev = (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select((matches / F.lit(4.0)).alias("est"), "jac")
    )
    er = ev.select(
        F.round(F.lit(1000000.0) * F.abs(F.col("est") - F.col("jac")))
        .cast("long")
        .alias("err_us"),
        F.round(F.lit(1000000.0) * (F.col("est") - F.col("jac")))
        .cast("long")
        .alias("bias_us"),
    )
    s = er.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("err_us").alias("se"),
        F.sum("bias_us").alias("sb"),
    )
    none = F.lit(None).cast("double")
    return s.select(
        "n_pairs",
        F.when(F.col("n_pairs") == 0, none)
        .otherwise(
            F.round(
                F.col("se").cast("double") / F.col("n_pairs") / 1000000.0,
                6,
            )
            + F.lit(0.0)
        )
        .alias("mae"),
        F.when(F.col("n_pairs") == 0, none)
        .otherwise(
            F.round(
                F.col("sb").cast("double") / F.col("n_pairs") / 1000000.0,
                6,
            )
            + F.lit(0.0)
        )
        .alias("bias"),
    )


# ---------------------------------------------------------------------------
# GROUPED_AGG pandas UDF — the one pandas-UDF flavor without a face
# ---------------------------------------------------------------------------
@q(
    "udf_grouped_agg",
    """
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CASE WHEN SUM(n_chars) = 0 THEN NULL
                ELSE round(CAST(MAX(n_chars) AS DOUBLE) / SUM(n_chars), 6) + 0
           END AS max_share
    FROM documents GROUP BY lang
    """,
)
def udf_grouped_agg(spark, sf):
    """GROUPED_AGG pandas UDF — the last pandas-UDF flavor without a
    face (scalar / grouped-map / arrow / cogrouped / map-iter /
    UDTF all have one), exercised through BOTH call sites the API
    supports: as an aggregate expression in groupBy().agg() and as a
    window function over an unbounded partition frame (the per-doc
    share divides each document's length by its language's UDF-summed
    total, then a plain max collapses it). Exactness: the UDF sums
    int64 in pandas (exact, order-independent); max(chars_i/total)
    picks the same document as MAX(chars)/total because division by
    a positive constant is monotone, so the emitted double is
    bit-identical to the oracle's spelling; the zero-total group
    NULL-guards the ANSI divide. Scale shape: Arrow-batched
    per-group aggregation — group state is one scalar per language,
    and the window partition is language-hashed, never global."""
    @pandas_udf("long")
    def psum(v: pd.Series) -> int:
        return int(v.sum())

    @pandas_udf("long")
    def pcount(v: pd.Series) -> int:
        return len(v)

    @pandas_udf("double")
    def pmax(v: pd.Series) -> float:
        m = v.max()
        return None if pd.isna(m) else float(m)

    d = t(spark, sf, "documents")
    w = Window.partitionBy("lang")
    shared = d.select(
        "lang",
        "n_chars",
        psum(F.col("n_chars")).over(w).alias("lang_total"),
    )
    share = F.when(
        F.col("lang_total") == 0, F.lit(None).cast("double")
    ).otherwise(F.col("n_chars").cast("double") / F.col("lang_total"))
    # a GROUPED_AGG pandas UDF may not mix with built-in aggregates in
    # one agg() [INVALID_PANDAS_UDF_PLACEMENT] — so every aggregate
    # here is a pandas UDF, which is the point of the face anyway
    return (
        shared.withColumn("share", share)
        .groupBy("lang")
        .agg(
            pcount(F.col("n_chars")).alias("n_docs"),
            psum(F.col("n_chars")).alias("sum_chars"),
            pmax(F.col("share")).alias("raw_share"),
        )
        .select(
            "lang",
            "n_docs",
            "sum_chars",
            (F.round(F.col("raw_share"), 6) + F.lit(0.0)).alias("max_share"),
        )
    )


# ---------------------------------------------------------------------------
# observe(): pipeline metrics without a second scan
# ---------------------------------------------------------------------------
@q(
    "scan_observe",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null_text
    FROM documents
    """,
)
def scan_observe(spark, sf):
    """Dataset metrics via ``DataFrame.observe`` — the data-quality
    instrumentation API: metrics accumulate ON the existing scan
    (one Observe node in the plan, aggregated executor-side as the
    rows stream past) instead of a second aggregation pass, which is
    how a production pipeline watches row counts / null rates on a
    10^12-row write it is already performing. The face drives the
    real machinery — attach the observation, run the action, read
    the metrics back on the driver — and returns them as a 1-row
    relation; the oracle recomputes the same aggregates relationally,
    so a green hash proves the observed metrics equal a full
    aggregation. All three metrics are exact integers (count, int
    sum, conditional count) — observe supports any aggregate, but
    non-commutative float metrics would be partition-order-dependent
    there, the same reason the repo quantizes before summing."""
    from pyspark.sql import Observation

    d = t(spark, sf, "documents")
    obs = Observation("doc_metrics")
    observed = d.observe(
        obs,
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.sum(F.when(F.col("text").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_null_text"),
    )
    observed.count()  # the action whose scan carries the Observe node
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["sum_chars"], m["n_null_text"])],
        T.StructType(
            [
                T.StructField("n_rows", T.LongType()),
                T.StructField("sum_chars", T.LongType()),
                T.StructField("n_null_text", T.LongType()),
            ]
        ),
    )


# ---------------------------------------------------------------------------
# mapInArrow — the zero-copy RecordBatch-iterator UDF face
# ---------------------------------------------------------------------------
@q(
    "udf_map_arrow",
    """
    SELECT event_type,
           CAST(round(value * 100) AS BIGINT) // 1000 AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events WHERE value IS NOT NULL AND value >= 0
    GROUP BY 1, 2
    """,
)
def udf_map_arrow(spark, sf):
    """``mapInArrow`` API face — the last rung of the Python
    execution ladder (scalar pandas_udf → mapInPandas → mapInArrow):
    the function receives raw ``pyarrow.RecordBatch``es with NO
    pandas conversion, the shape for code that wants Arrow's
    zero-copy buffers directly (tokenizers and decoders with Arrow
    bindings, FlatBuffer parsers). Here each batch maps exact
    integer cents to 10-unit price buckets with ``pyarrow.compute``
    INTEGER kernels only (pc.divide on int64 truncates; inputs are
    filtered non-negative so trunc == floor == the twin's ``//``) —
    no float ever enters the Python side, so the gate is exact. The
    quantization itself (round-half-away cents) runs JVM-side
    BEFORE the Arrow hop, keeping the engine-parity-sensitive op
    out of Python. Aggregation after the hop is plain JVM
    hash-agg."""
    import pyarrow as pa
    import pyarrow.compute as pc

    src = (
        t(spark, sf, "events")
        .filter(F.col("value").isNotNull() & (F.col("value") >= 0))
        .select(
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )

    def bucketize(batches):
        for b in batches:
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(b.schema.get_field_index("event_type")),
                    pc.divide(
                        b.column(b.schema.get_field_index("cents")),
                        pa.scalar(1000, pa.int64()),
                    ),
                ],
                ["event_type", "bucket"],
            )

    mapped = src.mapInArrow(bucketize, "event_type string, bucket long")
    return mapped.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


# ---------------------------------------------------------------------------
# applyInArrow — grouped-map over raw Arrow tables
# ---------------------------------------------------------------------------
@q(
    "udf_apply_arrow",
    """
    WITH v AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL)
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           CAST(MIN(cents) AS BIGINT) AS min_cents,
           CAST(MAX(cents) AS BIGINT) AS max_cents
    FROM v GROUP BY event_type
    """,
)
def udf_apply_arrow(spark, sf):
    """``applyInArrow`` API face — grouped-map where each group
    arrives as ONE ``pyarrow.Table`` (vs applyInPandas' DataFrame):
    the API for per-group Python logic that stays in Arrow memory.
    Per event type the function emits (n, sum, min, max) of exact
    integer cents using pyarrow.compute aggregation kernels —
    integer in, integer out, so the relational twin gates it
    exactly. Scale shape: one Exchange on the group key, then
    embarrassingly parallel per-group Python; the per-group Table
    must fit one task's memory — the documented applyInPandas
    constraint, unchanged by the Arrow variant (a skewed group
    needs the salting faces, not this one)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    src = (
        t(spark, sf, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )

    def stats(table: "pa.Table") -> "pa.Table":
        c = table.column("cents")
        return pa.table(
            {
                "event_type": [table.column("event_type")[0].as_py()],
                "n": pa.array([table.num_rows], pa.int64()),
                "sum_cents": pa.array([pc.sum(c).as_py()], pa.int64()),
                "min_cents": pa.array([pc.min(c).as_py()], pa.int64()),
                "max_cents": pa.array([pc.max(c).as_py()], pa.int64()),
            }
        )

    return src.groupBy("event_type").applyInArrow(
        stats,
        "event_type string, n long, sum_cents long, "
        "min_cents long, max_cents long",
    )


# ---------------------------------------------------------------------------
# SCALAR_ITER pandas UDF — once-per-executor setup, streamed batches
# ---------------------------------------------------------------------------
@q(
    "udf_scalar_iter",
    r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(text), '[aeiou]')) AS INT)
             AS n_vowels
    FROM documents
    """,
)
def udf_scalar_iter(spark, sf):
    """SCALAR_ITER pandas UDF (Iterator[Series] -> Iterator[Series])
    — the fourth Python-execution mode (udf_scalar = one batch in /
    one out; udf_map_iter = whole-row batch iterator via
    mapInPandas; udf_grouped_agg = series-to-scalar): the iterator
    form exists for ONE reason — expensive setup runs ONCE per task
    and amortizes over every Arrow batch the task streams (model
    load, decoder init; here a compiled regex stands in), which is
    the difference between loading a tokenizer 10^6 times and 10^3
    times at corpus scale. The function body keeps the one-in/
    one-out row contract, so the oracle is the plain SQL spelling;
    NULL text propagates as NULL (nullable Int32, the udf_scalar
    discipline)."""
    from typing import Iterator

    def _nvowels_fn(batches):
        import re

        vowel = re.compile(r"[aeiou]")  # once-per-task setup
        for text in batches:
            counts = text.str.lower().map(
                lambda s: len(vowel.findall(s))
                if isinstance(s, str)
                else None
            )
            yield counts.astype("Int32")

    # this module's `from __future__ import annotations` stringizes
    # inline hints, and pandas_udf infers SCALAR_ITER from the REAL
    # Iterator[Series] types — attach them as objects, then decorate
    _nvowels_fn.__annotations__ = {
        "batches": Iterator[pd.Series],
        "return": Iterator[pd.Series],
    }
    _nvowels = pandas_udf(T.IntegerType())(_nvowels_fn)

    return t(spark, sf, "documents").select(
        "doc_id", _nvowels(F.col("text")).alias("n_vowels")
    )


# ---------------------------------------------------------------------------
# content-addressable media dedup census — binary checksum grouping
# ---------------------------------------------------------------------------
@q(
    "multimodal_dedup",
    """
    WITH m AS (
      SELECT md5(text) AS checksum,
             octet_length(encode(text)) AS n_bytes
      FROM documents),
    g AS (
      SELECT checksum, n_bytes, CAST(COUNT(*) AS BIGINT) AS c
      FROM m GROUP BY checksum, n_bytes)
    SELECT CAST(SUM(c) AS BIGINT) AS n_media,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(SUM(c) - COUNT(*) AS BIGINT) AS n_dup_copies,
           CAST(SUM(c * n_bytes) AS BIGINT) AS bytes_total,
           CAST(SUM((c - 1) * n_bytes) AS BIGINT) AS bytes_dedupable
    FROM g
    """,
)
def multimodal_dedup(spark, sf):
    """Content-addressable dedup census over the BINARY media
    payloads: group by (md5 checksum, byte length), report how many
    physical copies collapse to how many distinct blobs and the
    bytes a content-addressed store would reclaim — the
    blob-storage planning number every multimodal lake computes
    before ingest (images recrawled from mirrors are byte-identical
    far more often than text is near-identical; CAS dedup is the
    cheap win BEFORE any perceptual hashing). The checksum is
    JVM-side F.md5 over the binary column (no UDF, no decode — CAS
    dedup never opens the blob, which is the point: it works on
    undecodable media too); the (checksum, n_bytes) composite
    guards the one-in-2^64 digest collision with a free second
    key. One map-side-combinable agg to the distinct-blob relation,
    one singleton fold; the census is exact integers end to end.
    The twin md5's the same utf-8 bytes through the payload
    synthesis (operators/multimodal.attach_binary_payload)."""
    media = mm.attach_binary_payload(
        t(spark, sf, "documents"), "doc_id", "text"
    )
    g = media.groupBy(
        F.md5("payload").alias("checksum"), "n_bytes"
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    return g.agg(
        F.sum("c").cast("long").alias("n_media"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        (F.sum("c") - F.count(F.lit(1))).cast("long").alias("n_dup_copies"),
        F.sum(F.col("c") * F.col("n_bytes")).cast("long").alias(
            "bytes_total"
        ),
        F.sum((F.col("c") - 1) * F.col("n_bytes"))
        .cast("long")
        .alias("bytes_dedupable"),
    )


# ---------------------------------------------------------------------------
# posexplode_outer — generator that PRESERVES rows with nothing to emit
# ---------------------------------------------------------------------------
@q(
    "udtf_posexplode_outer",
    """
    WITH arr AS (
      SELECT doc_id,
             list_filter(string_split(coalesce(text, ''), ' '),
                         x -> length(x) >= 8) AS a
      FROM documents),
    tok AS (
      SELECT doc_id, generate_subscripts(a, 1) - 1 AS pos, unnest(a) AS tk
      FROM arr)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM tok)
             + (SELECT CAST(COUNT(*) AS BIGINT) FROM arr WHERE len(a) = 0)
             AS n_rows,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM arr) AS n_docs,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM tok) AS n_tokens,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM arr WHERE len(a) = 0)
             AS n_empty_docs,
           (SELECT CAST(COALESCE(SUM(pos), 0) AS BIGINT) FROM tok)
             AS pos_sum
    """,
)
def udtf_posexplode_outer(spark, sf):
    """``posexplode_outer`` — the generator variant that PRESERVES
    parent rows whose array is empty (a NULL pos/token row) instead
    of silently dropping them like plain posexplode. That row
    preservation is load-bearing in pipelines: a per-doc feature
    join keyed on the exploded output must not lose the docs with
    zero long tokens, or downstream LEFT joins silently become
    INNER. Tokens are filtered to length >= 8 so a real fraction of
    docs DOES come up empty and the outer semantics bite at every
    sf. The one-row certificate pins the accounting identity
    n_rows = n_tokens + n_empty_docs and n_docs = every document
    (nothing lost); DuckDB has no outer unnest, so the twin
    reconstructs the preserved rows as the len(a)=0 count. Scale
    shape: map-side explode + one agg — 0-based pos matches
    generate_subscripts - 1 (qdata.py:241 idiom)."""
    d = t(spark, sf, "documents")
    arr = d.select(
        "doc_id",
        F.filter(
            F.split(F.coalesce(F.col("text"), F.lit("")), " "),
            lambda x: F.length(x) >= 8,
        ).alias("a"),
    )
    ex = arr.select(
        "doc_id", F.posexplode_outer("a").alias("pos", "tk")
    )
    return ex.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.count("tk").cast("long").alias("n_tokens"),
        F.sum(
            F.when(F.col("tk").isNull(), F.lit(1)).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("n_empty_docs"),
        F.coalesce(F.sum("pos"), F.lit(0)).cast("long").alias("pos_sum"),
    )


# ---------------------------------------------------------------------------
# barrier-mode mapInPandas — gang-scheduled Arrow stage
# ---------------------------------------------------------------------------
@q(
    "udf_map_barrier",
    """
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM events WHERE value IS NOT NULL GROUP BY event_type
    """,
)
def udf_map_barrier(spark, sf):
    """``mapInPandas(..., barrier=True)`` — the gang-scheduled
    variant: every task of the stage launches TOGETHER (Spark's
    barrier execution mode), which is what all-reduce-style
    distributed training and MPI-ish media codecs require from a
    data stage. Barrier changes SCHEDULING, never data semantics,
    so the twin is the plain aggregate and the gate proves the
    barrier plumbing is lossless. The pandas step rounds cents
    HALF-AWAY-FROM-ZERO explicitly (np.floor(|v|*100 + 0.5)) —
    pandas .round() is half-to-even and diverges from SQL round()
    on exact .5 cents (the running_counts_tws lesson). Scale
    shape: barrier stages cannot start until EVERY task has a slot,
    so the repartition(2) here is the discipline — a barrier stage
    wider than the cluster's instantaneous free slots deadlocks;
    size barrier stages to guaranteed capacity, never to data."""
    import numpy as np

    e = (
        t(spark, sf, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
    )

    def to_cents(batches):
        for pdf in batches:
            v = pdf["value"].to_numpy()
            cents = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)).astype(
                "int64"
            )
            yield pd.DataFrame(
                {"event_type": pdf["event_type"], "cents": cents}
            )

    b = e.repartition(2).mapInPandas(
        to_cents, "event_type string, cents long", barrier=True
    )
    return b.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("cents"),
    )


# ---------------------------------------------------------------------------
# MinHash signature mergeability — merge(sig_A, sig_B) == sig(A ∪ B)
# ---------------------------------------------------------------------------
@q(
    "dedup_minhash_merge",
    f"""
    WITH {_SH_SQL},
    m AS (
      SELECT MIN(substring(md5(shingle), 1, 8)) AS f0,
             MIN(substring(md5(shingle), 9, 8)) AS f1,
             MIN(substring(md5(shingle), 17, 8)) AS f2,
             MIN(substring(md5(shingle), 25, 8)) AS f3,
             MIN(CASE WHEN id % 2 = 0
                      THEN substring(md5(shingle), 1, 8) END) AS a0,
             MIN(CASE WHEN id % 2 = 0
                      THEN substring(md5(shingle), 9, 8) END) AS a1,
             MIN(CASE WHEN id % 2 = 0
                      THEN substring(md5(shingle), 17, 8) END) AS a2,
             MIN(CASE WHEN id % 2 = 0
                      THEN substring(md5(shingle), 25, 8) END) AS a3,
             MIN(CASE WHEN id % 2 = 1
                      THEN substring(md5(shingle), 1, 8) END) AS b0,
             MIN(CASE WHEN id % 2 = 1
                      THEN substring(md5(shingle), 9, 8) END) AS b1,
             MIN(CASE WHEN id % 2 = 1
                      THEN substring(md5(shingle), 17, 8) END) AS b2,
             MIN(CASE WHEN id % 2 = 1
                      THEN substring(md5(shingle), 25, 8) END) AS b3
      FROM sh),
    mg AS (
      SELECT f0, f1, f2, f3,
             CASE WHEN a0 IS NULL THEN b0 WHEN b0 IS NULL THEN a0
                  ELSE least(a0, b0) END AS m0,
             CASE WHEN a1 IS NULL THEN b1 WHEN b1 IS NULL THEN a1
                  ELSE least(a1, b1) END AS m1,
             CASE WHEN a2 IS NULL THEN b2 WHEN b2 IS NULL THEN a2
                  ELSE least(a2, b2) END AS m2,
             CASE WHEN a3 IS NULL THEN b3 WHEN b3 IS NULL THEN a3
                  ELSE least(a3, b3) END AS m3
      FROM m)
    SELECT m0, m1, m2, m3,
           (m0 IS NOT DISTINCT FROM f0 AND m1 IS NOT DISTINCT FROM f1
            AND m2 IS NOT DISTINCT FROM f2
            AND m3 IS NOT DISTINCT FROM f3) AS merge_ok
    FROM mg
    """,
)
def dedup_minhash_merge(spark, sf):
    """MinHash signatures are MERGEABLE: the corpus-level signature
    of a shingle-set union is the elementwise MIN of the halves'
    signatures — the algebraic property that makes minhash usable
    INCREMENTALLY at 100 TB (yesterday's corpus signature + today's
    delta signature merge in O(k), no re-scan of yesterday; the
    agg_incremental IVM proof applied to the dedup family's own
    sketch). The face computes, in ONE corpus scan (the two half
    signatures ride the full aggregate as conditional MINs — no
    second pass, no join), the full 4-perm signature and the
    even/odd-doc-half signatures, merges the halves with a
    NULL-explicit elementwise min (an empty half contributes
    nothing — spelled as CASE, not bare least(), because the
    engines disagree on least()'s NULL semantics), and emits the
    merged signature plus the merge_ok certificate that it equals
    the full recompute — null-safe equality so the empty corpus
    certifies TRUE vacuously. Hash slicing and shingling are
    dedup_minhash's exactly (one md5, 4 disjoint 8-hex slices,
    3-token shingles), so a drift in either family member breaks
    both gates."""
    sig = dd.minhash_signatures(
        t(spark, sf, "documents"), "doc_id", "text", n_hashes=4, shingle_n=3
    )
    even = F.col("id") % 2 == 0
    aggs = []
    for i in range(4):
        c = F.col(f"mh{i}")
        aggs += [
            F.min(c).alias(f"f{i}"),
            F.min(F.when(even, c)).alias(f"a{i}"),
            F.min(F.when(~even, c)).alias(f"b{i}"),
        ]
    m = sig.agg(*aggs)
    merged = [
        F.when(F.col(f"a{i}").isNull(), F.col(f"b{i}"))
        .when(F.col(f"b{i}").isNull(), F.col(f"a{i}"))
        .otherwise(F.least(F.col(f"a{i}"), F.col(f"b{i}")))
        .alias(f"m{i}")
        for i in range(4)
    ]
    mg = m.select(*merged, *[F.col(f"f{i}") for i in range(4)])
    ok = None
    for i in range(4):
        e = F.col(f"m{i}").eqNullSafe(F.col(f"f{i}"))
        ok = e if ok is None else (ok & e)
    return mg.select("m0", "m1", "m2", "m3", ok.alias("merge_ok"))


# ---------------------------------------------------------------------------
# struct-returning vectorized pandas UDF — one Arrow hop, composite output
# ---------------------------------------------------------------------------
@q(
    "udf_struct_return",
    """
    WITH s AS (
      SELECT CASE WHEN CAST(round(value * 100) AS BIGINT) >= 5000
                  THEN 'big' ELSE 'small' END AS band,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL)
    SELECT band, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS cents_sum
    FROM s GROUP BY band
    """,
)
def udf_struct_return(spark, sf):
    """Scalar pandas UDF returning a STRUCT — the composite-output
    quadrant of the Python UDF surface (scalar/iter/grouped/arrow/
    cogrouped faces all return flat columns): one Arrow hop carries
    both derived fields back as a single struct column, where two
    separate UDFs would pay the serialize-deserialize boundary
    twice over the same input at 100 TB. Inside the UDF the cents
    rounding is HALF-AWAY-FROM-ZERO via floor(x + 0.5) on the
    non-negative values — pandas' .round() is half-to-even and
    silently diverges from SQL round() on exact .5 cents (the TWS
    lesson, CLAUDE.md) — so the struct fields match the twin's SQL
    arithmetic bit-for-bit. The downstream aggregate groups on a
    struct FIELD, proving field access composes with the relational
    layer. Plan: one ArrowEvalPython, no Python rows."""
    import numpy as np

    @pandas_udf("struct<cents: long, band: string>")
    def _split(v: pd.Series) -> pd.DataFrame:
        cents = np.floor(v.to_numpy() * 100.0 + 0.5).astype("int64")
        return pd.DataFrame(
            {
                "cents": cents,
                "band": np.where(cents >= 5000, "big", "small"),
            }
        )

    e = t(spark, sf, "events").filter(F.col("value").isNotNull())
    s = e.select(_split(F.col("value")).alias("s"))
    return s.groupBy(F.col("s.band").alias("band")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("s.cents").cast("long").alias("cents_sum"),
    )


# ---------------------------------------------------------------------------
# Arrow batch sizing — maxRecordsPerBatch actually bounds UDF batches
# ---------------------------------------------------------------------------
_ARROW_BATCH = 100


@q(
    "udf_arrow_batching",
    f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CEIL(COUNT(*) / {_ARROW_BATCH}.0) AS BIGINT)
             AS n_batches,
           TRUE AS max_ok,
           CAST(COALESCE(SUM(event_id), 0) AS BIGINT) AS id_sum
    FROM events
    """,
)
def udf_arrow_batching(spark, sf):
    """``spark.sql.execution.arrow.maxRecordsPerBatch`` — the knob
    that bounds how many rows cross the JVM->Python Arrow hop per
    batch, certified from INSIDE the UDF: a mapInPandas over the
    corpus coalesced to one partition emits one summary row per
    received batch, so the batch count is the closed form
    ceil(n/100) and every batch's size is <= the bound (both ride
    the hash; the id checksum proves no row was lost at the batch
    seams). Why a face: batch size is the Python UDF family's
    memory contract — a 100-TB mapInPandas with a model that copies
    its input must size batches to the executor's Python heap, and
    this conf (default 10000) is the only lever; the face pins that
    it actually propagates to the worker. Conf scoped with the
    eager-checkpoint idiom. The single partition makes the count a
    closed form — multi-partition runs bound per-partition batch
    counts instead (the lake_output_sizing caveat, Arrow edition)."""
    from ..operators.dedup import parquet_checkpoint

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key)
    spark.conf.set(key, str(_ARROW_BATCH))
    try:
        src = (
            t(spark, sf, "events")
            .select("event_id")
            .coalesce(1)
        )

        def _per_batch(batches):
            for b in batches:
                yield pd.DataFrame(
                    {
                        "rows": [len(b)],
                        "ids": [int(b["event_id"].sum())],
                    }
                )

        per = src.mapInPandas(_per_batch, "rows long, ids long")
        out = per.agg(
            F.coalesce(F.sum("rows"), F.lit(0)).cast("long").alias("n"),
            F.count(F.lit(1)).cast("long").alias("n_batches"),
            F.coalesce(F.max("rows") <= _ARROW_BATCH, F.lit(True)).alias(
                "max_ok"
            ),
            F.coalesce(F.sum("ids"), F.lit(0))
            .cast("long")
            .alias("id_sum"),
        )
        return parquet_checkpoint(out, "arrow_batching_out")
    finally:
        spark.conf.set(key, prev)


# ---------------------------------------------------------------------------
# wave 102: Arrow-optimized Python UDTF — the vectorized table
# function quadrant
# ---------------------------------------------------------------------------
@q(
    "udtf_arrow_split",
    """
    WITH ex AS (
      SELECT doc_id,
             generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
             unnest(string_split(text, ' ')) AS tok
      FROM documents WHERE text IS NOT NULL)
    SELECT doc_id, CAST(pos AS INT) AS pos, tok,
           CAST(strlen(tok) AS INT) AS tok_bytes
    FROM ex
    """,
)
def udtf_arrow_split(spark, sf):
    """Python UDTF with ``useArrow=True`` — the ARROW-OPTIMIZED
    table-function quadrant (udtf_ngrams is the pickled-row UDTF;
    scalar/iter/grouped/cogrouped Arrow UDFs all have faces, this
    closes the table-function column of the matrix): each document
    fans out to one row per space-delimited token with its position
    and byte length, rows crossing the Python boundary as Arrow
    record batches instead of pickled tuples — the same ~10-100x
    serialization win the pandas_udf family documents, applied to
    variable-arity output. Token contract matches udtf_ngrams
    (split on single space; consecutive spaces yield empty tokens
    in BOTH engines; byte length via octet semantics — multi-byte
    UTF-8 tokens diverge under char length). Scale shape: map-side
    Generate over the pruned (doc_id, text) scan, zero shuffle —
    the UDTF distributes with the documents partitioning."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, tok: string, tok_bytes: int",
          useArrow=True)
    class ArrowSplit:
        def eval(self, text):
            if text is None:
                return
            for i, w in enumerate(text.split(" ")):
                yield i, w, len(w.encode("utf-8"))

    spark.udtf.register("arrow_split", ArrowSplit)
    t(spark, sf, "documents").select("doc_id", "text").filter(
        F.col("text").isNotNull()
    ).createOrReplaceTempView("udtf_arrow_docs")
    return spark.sql(
        "SELECT d.doc_id, g.pos, g.tok, g.tok_bytes "
        "FROM udtf_arrow_docs d, LATERAL arrow_split(d.text) g"
    )


# ---------------------------------------------------------------------------
# wave 109: self-BLEU — the corpus-diversity metric, exact clipped
# counts + one micros-quantized float per pair
# ---------------------------------------------------------------------------
@q(
    "text_self_bleu",
    """
    WITH docs AS (
      SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents WHERE text IS NOT NULL),
    prs AS (
      SELECT doc_id AS cand_id,
             LEAD(doc_id) OVER (ORDER BY doc_id) AS ref_id
      FROM docs),
    pairs AS (SELECT cand_id, ref_id FROM prs WHERE ref_id IS NOT NULL),
    g1 AS (
      SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT doc_id, unnest(toks) AS g FROM docs) z1
      GROUP BY doc_id, g),
    ex2 AS (
      SELECT doc_id, generate_subscripts(toks, 1) AS i, toks
      FROM docs),
    g2 AS (
      SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS g,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM ex2 WHERE i <= len(toks) - 1 GROUP BY doc_id, g),
    lens AS (
      SELECT doc_id, CAST(len(toks) AS BIGINT) AS nt FROM docs),
    clip1 AS (
      SELECT p.cand_id, p.ref_id,
             CAST(SUM(LEAST(a.c, COALESCE(b.c, 0))) AS BIGINT) AS c1,
             CAST(SUM(a.c) AS BIGINT) AS t1
      FROM pairs p
      JOIN g1 a ON a.doc_id = p.cand_id
      LEFT JOIN g1 b ON b.doc_id = p.ref_id AND b.g = a.g
      GROUP BY p.cand_id, p.ref_id),
    clip2 AS (
      SELECT p.cand_id, p.ref_id,
             CAST(COALESCE(SUM(LEAST(a.c, COALESCE(b.c, 0))), 0)
                  AS BIGINT) AS c2,
             CAST(COALESCE(SUM(a.c), 0) AS BIGINT) AS t2
      FROM pairs p
      LEFT JOIN g2 a ON a.doc_id = p.cand_id
      LEFT JOIN g2 b ON b.doc_id = p.ref_id AND b.g = a.g
      GROUP BY p.cand_id, p.ref_id)
    SELECT c1.cand_id, c1.ref_id, c1.c1, c1.t1, c2.c2, c2.t2,
           CASE WHEN c1.c1 = 0 OR c2.c2 = 0 OR c2.t2 = 0 THEN 0
                ELSE CAST(round(1000000.0 *
                  CASE WHEN lc.nt >= lr.nt THEN 1.0
                       ELSE exp(1.0 - CAST(lr.nt AS DOUBLE) / lc.nt)
                  END
                  * exp(0.5 * (ln(CAST(c1.c1 AS DOUBLE) / c1.t1)
                               + ln(CAST(c2.c2 AS DOUBLE) / c2.t2))))
                  AS BIGINT)
           END AS bleu_micros
    FROM clip1 c1
    JOIN clip2 c2 ON c1.cand_id = c2.cand_id AND c1.ref_id = c2.ref_id
    JOIN lens lc ON lc.doc_id = c1.cand_id
    JOIN lens lr ON lr.doc_id = c1.ref_id
    """,
)
def text_self_bleu(spark, sf):
    """Self-BLEU over adjacent document pairs — the corpus DIVERSITY
    gate (high self-BLEU = templated/near-duplicate generations; the
    standard companion to the dedup family when curating synthetic
    training data). BLEU-2 per (doc, next-doc-by-id) pair: clipped
    n-gram matches SUM(min(count_cand, count_ref)) and totals are
    exact BIGINTs riding the hash per pair; the only float is ONE
    identical-op-order expression per pair (brevity penalty x
    geometric mean of the two precisions), micros-quantized — a
    zero clipped count short-circuits to 0 before any ln. Adjacent
    pairing keeps the work linear (true corpus-level self-BLEU is
    quadratic; production samples pairs — the deterministic
    next-by-id pairing IS a sample, documented). Scale shape: the
    per-doc gram relations are checkpointed once (each is consumed
    by BOTH join sides — the reuse-defeats-pruning lesson), joins
    are gram-keyed and bounded by document length, and nothing
    corpus-sized ever sorts globally except the id-adjacency window
    over the DOC-ID relation (bounded, one column)."""
    from ..operators.dedup import parquet_checkpoint

    docs = (
        t(spark, sf, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", F.split("text", " ").alias("toks"))
    )
    docs = parquet_checkpoint(docs, "sbleu_docs")
    lens = docs.select(
        "doc_id", F.size("toks").cast("long").alias("nt")
    )
    prs = docs.select(
        F.col("doc_id").alias("cand_id"),
        F.lead("doc_id")
        .over(Window.orderBy("doc_id"))
        .alias("ref_id"),
    ).filter(F.col("ref_id").isNotNull())
    g1 = parquet_checkpoint(
        docs.select("doc_id", F.explode("toks").alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).cast("long").alias("c")),
        "sbleu_g1",
    )
    g2 = parquet_checkpoint(
        docs.select(
            "doc_id", F.posexplode("toks").alias("i", "tok"), "toks"
        )
        .filter(F.col("i") <= F.size("toks") - 2)
        .select(
            "doc_id",
            F.concat_ws(
                " ",
                F.col("tok"),
                F.element_at(F.col("toks"), F.col("i") + 2),
            ).alias("g"),
        )
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).cast("long").alias("c")),
        "sbleu_g2",
    )

    def clipped(grams, outer):
        a = grams.select(
            F.col("doc_id").alias("cand_id"),
            F.col("g").alias("ga"),
            F.col("c").alias("ca"),
        )
        b = grams.select(
            F.col("doc_id").alias("rid"),
            F.col("g").alias("gb"),
            F.col("c").alias("cb"),
        )
        base = prs.join(a, "cand_id", "left" if outer else "inner")
        j = base.join(
            b,
            (F.col("rid") == F.col("ref_id"))
            & (F.col("gb") == F.col("ga")),
            "left",
        )
        return j.groupBy("cand_id", "ref_id").agg(
            F.coalesce(
                F.sum(F.least(F.col("ca"), F.coalesce(F.col("cb"),
                                                      F.lit(0)))),
                F.lit(0),
            )
            .cast("long")
            .alias("clip"),
            F.coalesce(F.sum("ca"), F.lit(0)).cast("long").alias("tot"),
        )

    c1 = clipped(g1, outer=False).withColumnsRenamed(
        {"clip": "c1", "tot": "t1"}
    )
    c2 = clipped(g2, outer=True).withColumnsRenamed(
        {"clip": "c2", "tot": "t2"}
    )
    j = (
        c1.join(c2, ["cand_id", "ref_id"])
        .join(
            lens.select(
                F.col("doc_id").alias("cand_id"),
                F.col("nt").alias("ntc"),
            ),
            "cand_id",
        )
        .join(
            lens.select(
                F.col("doc_id").alias("ref_id"),
                F.col("nt").alias("ntr"),
            ),
            "ref_id",
        )
    )
    bp = F.when(F.col("ntc") >= F.col("ntr"), F.lit(1.0)).otherwise(
        F.exp(1.0 - F.col("ntr").cast("double") / F.col("ntc"))
    )
    bleu = F.when(
        (F.col("c1") == 0) | (F.col("c2") == 0) | (F.col("t2") == 0),
        F.lit(0),
    ).otherwise(
        F.round(
            F.lit(1000000.0)
            * bp
            * F.exp(
                0.5
                * (
                    F.log(F.col("c1").cast("double") / F.col("t1"))
                    + F.log(F.col("c2").cast("double") / F.col("t2"))
                )
            )
        ).cast("long")
    )
    return j.select(
        "cand_id", "ref_id", "c1", "t1", "c2", "t2",
        bleu.alias("bleu_micros"),
    )


# ---------------------------------------------------------------------------
# wave 118: partitioned TABLE-argument UDTF — per-partition ordered
# state with terminate() emission
# ---------------------------------------------------------------------------
@q(
    "udtf_partitioned",
    """
    WITH v AS (
      SELECT event_type, event_id, epoch_us(ts) AS us
      FROM events WHERE ts IS NOT NULL),
    g AS (
      SELECT event_type, event_id, us,
             us - LAG(us) OVER (PARTITION BY event_type
                                ORDER BY us, event_id) AS gap
      FROM v)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(event_id) AS BIGINT) AS first_id,
           CAST(MAX(event_id) AS BIGINT) AS last_id,
           CAST(MAX(gap) AS BIGINT) AS max_gap_us
    FROM g GROUP BY event_type
    """,
)
def udtf_partitioned(spark, sf):
    """Polymorphic UDTF over a PARTITIONED + ORDERED table argument —
    the Spark-4 protocol the LATERAL faces (udtf_ngrams, scalar per
    row) and the TABLE-arg analyze face (udtf_analyze) don't touch:
    ``my_udtf(TABLE(v) PARTITION BY event_type ORDER BY (ts,
    event_id))`` — a multi-expression ORDER BY in a TABLE argument
    MUST be parenthesized or the parser rejects it — guarantees
    each partition's rows arrive at ONE UDTF
    instance IN ORDER, with terminate() fired at each partition
    boundary — Spark's public contract for per-group sequential
    Python state (the same niche as applyInPandas but streaming
    row-at-a-time, so a partition never has to fit in one pandas
    frame). The face computes something only the ORDER makes
    well-defined — the maximum inter-event gap — plus first/last ids
    under the (us, event_id) total order; the twin is the LAG window
    + group-by, so a green hash proves partition isolation, arrival
    order, AND the terminate() protocol at once. Scale shape: one
    shuffle on the partition key, then map-side Python; the
    first_id/last_id would differ from the twin if Spark ever
    delivered rows unordered — making the contract itself the thing
    the gate hashes."""
    from pyspark.sql.functions import udtf

    @udtf(
        returnType="event_type string, n bigint, first_id bigint, "
        "last_id bigint, max_gap_us bigint"
    )
    class PerTypeStats:
        def __init__(self):
            self.et = None
            self.n = 0
            self.first_id = None
            self.last_id = None
            self.prev_us = None
            self.max_gap = None

        def eval(self, row):
            self.et = row["event_type"]
            self.n += 1
            if self.first_id is None:
                self.first_id = row["event_id"]
            self.last_id = row["event_id"]
            if self.prev_us is not None:
                gap = row["us"] - self.prev_us
                if self.max_gap is None or gap > self.max_gap:
                    self.max_gap = gap
            self.prev_us = row["us"]

        def terminate(self):
            if self.n:
                yield (
                    self.et,
                    self.n,
                    self.first_id,
                    self.last_id,
                    self.max_gap,
                )

    spark.udtf.register("per_type_stats", PerTypeStats)
    (
        t(spark, sf, "events")
        .filter(F.col("ts").isNotNull())
        .select(
            "event_type",
            "event_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        )
        .createOrReplaceTempView("udtf_part_events")
    )
    return spark.sql(
        "SELECT * FROM per_type_stats("
        "TABLE(udtf_part_events) "
        "PARTITION BY event_type ORDER BY (us, event_id))"
    )


# ---------------------------------------------------------------------------
# wave 132: GROUPED_AGG pandas UDF over a BOUNDED sliding frame
# ---------------------------------------------------------------------------
@q(
    "udf_window_bounded",
    """
    WITH d AS (
      SELECT user_id, event_id,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL)
    SELECT user_id, event_id,
           CAST(SUM(cents) OVER (PARTITION BY user_id
             ORDER BY event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS roll3
    FROM d
    """,
)
def udf_window_bounded(spark, sf):
    """GROUPED_AGG pandas UDF over a BOUNDED sliding frame — the
    window-UDF regime udf_grouped_agg's unbounded-partition spelling
    never reaches: with ROWS BETWEEN 2 PRECEDING AND CURRENT ROW the
    engine must re-evaluate the Python aggregate PER ROW over each
    row's own frame slice (the unbounded case evaluates once per
    partition and broadcasts), which is the sliding-window UDF
    contract a custom online metric needs when no built-in
    aggregate fits. The UDF sums int64 in pandas (exact,
    order-independent within the frame), the frame is defined by
    the (user, event_id) total order, and the twin is the built-in
    window SUM — hash equality proves the engine sliced every
    frame exactly. The test pins the plan: the window node is the
    Arrow-batched Python window eval, not a rewritten aggregate.
    Scale note: per-row Python frame evaluation costs O(frame) per
    row across the Arrow boundary — built-ins stay the hot path
    (the repo rule); this face exists to prove the seam works and
    what it costs, not to recommend it."""
    d = (
        t(spark, sf, "events")
        .filter(F.col("value").isNotNull() & F.col("user_id").isNotNull())
        .select(
            "user_id",
            "event_id",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )

    @pandas_udf("long")
    def psum3(v: pd.Series) -> int:
        return int(v.sum())

    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(-2, 0)
    )
    return d.select(
        "user_id",
        "event_id",
        psum3(F.col("cents")).over(w).alias("roll3"),
    )


# ---------------------------------------------------------------------------
# wave 139: language-ID confusion matrix — the labeler graded
# against the corpus labels
# ---------------------------------------------------------------------------
def _lang_confusion_sql() -> str:
    s = {
        lang: "len(list_intersect(ws, ["
        + ", ".join(f"'{w}'" for w in ws)
        + "]))"
        for lang, ws in _LANG_MARKERS.items()
    }
    return rf"""
    WITH b AS (SELECT doc_id, lang,
                      string_split_regex(lower(text), '\s+') AS ws
               FROM documents),
    sc AS (SELECT doc_id, lang, {s['en']} AS s_en, {s['fr']} AS s_fr,
                  {s['es']} AS s_es, {s['de']} AS s_de FROM b),
    g AS (SELECT lang,
           CASE WHEN s_en = 0 AND s_fr = 0 AND s_es = 0 AND s_de = 0
                THEN 'und'
                WHEN s_de > s_es AND s_de > s_fr AND s_de > s_en
                THEN 'de'
                WHEN s_es > s_fr AND s_es > s_en THEN 'es'
                WHEN s_fr > s_en THEN 'fr'
                ELSE 'en' END AS guess
          FROM sc)
    SELECT lang, guess, CAST(COUNT(*) AS BIGINT) AS n
    FROM g GROUP BY lang, guess
    """


@q("text_langid_confusion", _lang_confusion_sql())
def text_langid_confusion(spark, sf):
    """Language-ID confusion matrix — text_langid's n-gram-marker
    heuristic graded against the corpus's own lang labels, the
    evaluation every routing decision (T1 sends documents to
    per-language pipelines) should see before trusting the
    labeler: the diagonal is per-class recall mass, off-diagonal
    cells name exactly WHICH languages bleed into which, and the
    zh column is the census's known blind spot (the fixture's zh
    shard is LATIN-script — the text_script_mix lesson — so the
    marker heuristic cannot see it and the matrix REPORTS that
    honestly as zh rows landing off-diagonal). One scan, map-side
    guess derivation (the same langid_ngram_col the routing path
    uses — grading the PRODUCTION function, not a reimplementation),
    one |langs|^2-bounded aggregate. On the synthetic corpus the
    report is damning and HONEST: only en's markers ever fire (the
    synthetic fr/es/de texts carry no marker stopwords), so every
    non-en row lands off-diagonal — exactly the evidence that
    disqualifies the heuristic for this corpus, which is what a
    confusion face is for; zh is additionally never PREDICTED (no
    zh markers by design). The test pins those truths."""
    from ..functions.text import langid_ngram_col

    return (
        t(spark, sf, "documents")
        .select(
            "lang", langid_ngram_col(F.col("text")).alias("guess")
        )
        .groupBy("lang", "guess")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


# ---------------------------------------------------------------------------
# wave 150: ANN recall certificate — IVF and multiprobe-LSH vs brute force
# ---------------------------------------------------------------------------
@q(
    "ann_recall_cert",
    f"""
    WITH qs0 AS (SELECT vec_id AS qid, embedding AS qv
                 FROM embeddings WHERE vec_id < 10),
    cs0 AS (SELECT vec_id AS nid, embedding AS nv FROM embeddings),
    sb AS (SELECT qid, nid, {_COS_SQL} AS cos
           FROM qs0 qs, cs0 cs
           WHERE qs.qid <> cs.nid),
    bf AS (
      SELECT qid, nid FROM (
        SELECT qid, nid,
               row_number() OVER (PARTITION BY qid
                 ORDER BY cos DESC, nid) AS nn_rank
        FROM (SELECT qid, nid, cos FROM sb) z) w
      WHERE nn_rank <= 3),
    cents AS (
      SELECT vec_id AS cid, embedding AS cv,
             {_NORM.format(v='embedding')} AS cn
      FROM embeddings ORDER BY vec_id LIMIT 8),
    vecs AS (
      SELECT vec_id, embedding,
             {_NORM.format(v='embedding')} AS vn FROM embeddings),
    assign AS (
      SELECT v.vec_id, v.embedding, v.vn, c.cid,
             row_number() OVER (
               PARTITION BY v.vec_id
               ORDER BY {_IVF_COS.format(a='v.embedding', b='c.cv',
                                         an='v.vn', bn='c.cn')}
                 DESC, c.cid) AS rn
      FROM vecs v, cents c),
    cell AS (SELECT vec_id, embedding, vn, cid
             FROM assign WHERE rn = 1),
    iq AS (SELECT vec_id AS qid, embedding AS qv, vn AS qn, cid
           FROM cell WHERE vec_id < 10),
    si AS (
      SELECT iq.qid, c.vec_id AS nid,
             {_IVF_COS.format(a='iq.qv', b='c.embedding',
                              an='iq.qn', bn='c.vn')} AS cos
      FROM iq JOIN cell c ON iq.cid = c.cid AND iq.qid <> c.vec_id),
    ivf AS (
      SELECT qid, nid FROM (
        SELECT qid, nid,
               row_number() OVER (PARTITION BY qid
                 ORDER BY cos DESC, nid) AS nn_rank
        FROM si) w WHERE nn_rank <= 3),
    b AS (
      SELECT vec_id, embedding,
             {_NORM.format(v='embedding')} AS vn,
             {_lsh_bucket_sql('embedding')} AS bucket
      FROM embeddings),
    lq AS (SELECT vec_id AS qid, embedding AS qv, vn AS qn, bucket
           FROM b WHERE vec_id < 10),
    qp AS (
      SELECT qid, qv, qn,
             CASE WHEN j = 0 THEN bucket
                  ELSE substr(bucket, 1, j - 1)
                       || (CASE WHEN substr(bucket, j, 1) = '1'
                                THEN '0' ELSE '1' END)
                       || substr(bucket, j + 1)
             END AS bucket
      FROM lq, (SELECT unnest(range(0, {_LSH_PLANES} + 1)) AS j)),
    sl AS (
      SELECT qp.qid, c.vec_id AS nid,
             {_IVF_COS.format(a='qp.qv', b='c.embedding',
                              an='qp.qn', bn='c.vn')} AS cos
      FROM qp JOIN b c ON qp.bucket = c.bucket
                      AND qp.qid <> c.vec_id),
    lsh AS (
      SELECT qid, nid FROM (
        SELECT qid, nid,
               row_number() OVER (PARTITION BY qid
                 ORDER BY cos DESC, nid) AS nn_rank
        FROM sl) w WHERE nn_rank <= 3)
    SELECT bf.qid,
           CAST(COUNT(*) AS BIGINT) AS k,
           CAST(SUM(CASE WHEN i.nid IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS ivf_hits,
           CAST(SUM(CASE WHEN l.nid IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS lsh_hits,
           round(SUM(CASE WHEN i.nid IS NOT NULL THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) + 0 AS recall_ivf,
           round(SUM(CASE WHEN l.nid IS NOT NULL THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) + 0 AS recall_lsh
    FROM bf
    LEFT JOIN ivf i ON i.qid = bf.qid AND i.nid = bf.nid
    LEFT JOIN lsh l ON l.qid = bf.qid AND l.nid = bf.nid
    GROUP BY bf.qid ORDER BY bf.qid
    """,
)
def ann_recall_cert(spark, sf):
    """ANN recall@3 certificate — the number that decides whether the
    scale path (IVF cells, multiprobe LSH buckets) may replace the
    brute-force scan at 100 TB: per query, the exact top-3 neighbor
    SET from the quadratic baseline (ann_cosine_topk's operator)
    intersected with each approximate index's top-3
    (ann_ivf_topk's single-probe IVF-Flat, ann_lsh_multiprobe's
    Hamming-1 probe fan). Both index paths and the baseline are
    fully deterministic (lowest-id coarse centroids, md5-derived
    sign planes, (cos DESC, nid) total-order ranking), so recall
    is an exact engine-checkable value, not a sampled estimate —
    the dedup_minhash_eval estimator-quality pattern applied to
    similarity search. Set intersection joins on (qid, nid) —
    rank positions are irrelevant to recall, so rank
    disagreements between engines cannot leak into the hash. The
    replay test pins recall_multiprobe >= recall at one fewer
    probe level conceptually via lsh >= 0 and the set-containment
    sanity ivf_hits <= k. At corpus scale each leg is the already-
    audited bucketed join; the certificate adds two broadcast-
    sized set joins on the top-k relations."""
    emb = t(spark, sf, "embeddings")
    qs = emb.filter(F.col("vec_id") < 10)
    bf = ann_ops.cosine_topk(qs, emb, k=3).select("qid", "nid")
    ivf = (
        ann_ops.ivf_topk(qs, emb, k=3)
        .select(
            F.col("qid").alias("iq"), F.col("nid").alias("inid")
        )
    )
    lsh = (
        ann_ops.lsh_bucketed_topk(
            qs,
            emb,
            dim=_EMB_DIM,
            k=3,
            n_planes=_LSH_PLANES,
            multiprobe=True,
        )
        .select(
            F.col("qid").alias("lq"), F.col("nid").alias("lnid")
        )
    )
    j = (
        bf.join(
            ivf,
            (F.col("iq") == F.col("qid"))
            & (F.col("inid") == F.col("nid")),
            "left",
        )
        .join(
            lsh,
            (F.col("lq") == F.col("qid"))
            & (F.col("lnid") == F.col("nid")),
            "left",
        )
    )
    return (
        j.groupBy("qid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("k"),
            F.sum(
                F.when(F.col("inid").isNotNull(), 1).otherwise(0)
            )
            .cast("long")
            .alias("ivf_hits"),
            F.sum(
                F.when(F.col("lnid").isNotNull(), 1).otherwise(0)
            )
            .cast("long")
            .alias("lsh_hits"),
            (
                F.round(
                    F.sum(
                        F.when(F.col("inid").isNotNull(), 1)
                        .otherwise(0)
                    )
                    / F.count(F.lit(1)).cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias("recall_ivf"),
            (
                F.round(
                    F.sum(
                        F.when(F.col("lnid").isNotNull(), 1)
                        .otherwise(0)
                    )
                    / F.count(F.lit(1)).cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias("recall_lsh"),
        )
        .orderBy("qid")
    )


# ---------------------------------------------------------------------------
# wave 154: multi-column SCALAR_ITER pandas UDF — Iterator[Tuple[...]]
# ---------------------------------------------------------------------------
@q(
    "udf_scalar_iter_multi",
    r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(text), '[aeiou]'))
                + n_chars % 7 AS INT) AS score
    FROM documents
    """,
)
def udf_scalar_iter_multi(spark, sf):
    """Multi-column SCALAR_ITER pandas UDF —
    ``Iterator[Tuple[Series, Series]] -> Iterator[Series]``, the
    input-arity quadrant udf_scalar_iter's single-column form never
    exercises: with 2+ input columns the iterator's elements arrive
    as TUPLES of aligned Series (one per argument, same Arrow
    batch), and pandas_udf infers SCALAR_ITER from exactly that
    Tuple[...] annotation — annotate Iterator[Series] with two
    args and registration fails, so the arity lives in the TYPE,
    not the signature. Same once-per-task amortization story (the
    compiled regex here stands in for a model handle shared across
    every batch AND both columns); same stringized-annotations
    workaround (`__future__.annotations` forces attaching real
    typing objects via __annotations__ before decorating — the
    udf_scalar_iter lesson). The body keeps the row contract
    (vowels(text) + n_chars mod 7), so the plain-SQL twin gates
    values exactly; NULL text propagates as NULL through nullable
    Int32."""
    from typing import Iterator, Tuple

    def _score_fn(batches):
        import re

        vowel = re.compile(r"[aeiou]")  # once-per-task setup
        for text, n_chars in batches:
            vows = text.str.lower().map(
                lambda s: len(vowel.findall(s))
                if isinstance(s, str)
                else None
            )
            yield (vows + n_chars % 7).astype("Int32")

    _score_fn.__annotations__ = {
        "batches": Iterator[Tuple[pd.Series, pd.Series]],
        "return": Iterator[pd.Series],
    }
    _score = pandas_udf(T.IntegerType())(_score_fn)

    return t(spark, sf, "documents").select(
        "doc_id",
        _score(F.col("text"), F.col("n_chars")).alias("score"),
    )


# ---------------------------------------------------------------------------
# wave 156: content-defined chunking dedup census (rsync/CDC-style)
# ---------------------------------------------------------------------------
@q(
    "dedup_cdc",
    """
    WITH tok AS (
      SELECT doc_id,
             unnest(string_split(text, ' ')) AS tk,
             generate_subscripts(string_split(text, ' '), 1) AS pos
      FROM documents),
    fl AS (
      SELECT doc_id, tk, pos,
             CASE WHEN ('0x' || substr(md5(tk), 1, 4))::UBIGINT % 8
                       = 0
                  THEN 1 ELSE 0 END AS bnd
      FROM tok WHERE tk <> ''),
    isl AS (
      SELECT doc_id, tk, pos,
             SUM(bnd) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island
      FROM fl),
    chunks AS (
      SELECT doc_id, island,
             string_agg(tk, ' ' ORDER BY pos) AS chunk
      FROM isl GROUP BY doc_id, island),
    census AS (
      SELECT md5(chunk) AS h,
             CAST(length(chunk) AS BIGINT) AS len,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM chunks GROUP BY md5(chunk), length(chunk))
    SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n_chunks,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(COALESCE(SUM(c - 1), 0) AS BIGINT) AS dup_chunks,
           CAST(COALESCE(SUM(c * len), 0) AS BIGINT) AS chars_total,
           CAST(COALESCE(SUM((c - 1) * len), 0) AS BIGINT)
             AS chars_dedupable
    FROM census
    """,
)
def dedup_cdc(spark, sf):
    """Content-defined chunking dedup census — the rsync/casync/
    restic storage idea applied to corpus text: chunk boundaries
    are placed where the CONTENT hashes to a boundary value
    (md5(word) % 8 == 0, word-level), never at fixed offsets, so
    inserting a sentence shifts every byte position but leaves all
    other chunk boundaries attached to their words — exactly why
    CDC dedup survives edits that defeat fixed-size blocking, and
    the chunk-store planning number (chars_dedupable) a
    deduplicating lake computes before ingest. Pipeline: token
    positions (posexplode 0-based vs generate_subscripts 1-based —
    consistent per engine, the qdata idiom), boundary flags,
    islands via the cumulative-flag gaps-and-islands trick
    (per-doc bounded window), chunk reassembly as
    array_join(transform(array_sort(collect_list(struct(pos,
    tk))))) on the Spark side vs string_agg(... ORDER BY pos) in
    the twin (collect_list alone is order-unstable — the
    kg_entity_card lesson), then an exact census over (md5(chunk),
    length). One corpus scan; every relation after the explode is
    chunk- or vocabulary-sized; the census is a
    map-side-combinable aggregate on the chunk hash."""
    d = t(spark, sf, "documents")
    tok = d.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "tk"),
    ).filter(F.col("tk") != "")
    fl = tok.select(
        "doc_id",
        "tk",
        "pos",
        F.when(
            F.conv(F.substring(F.md5("tk"), 1, 4), 16, 10)
            .cast("long")
            % 8
            == 0,
            1,
        )
        .otherwise(0)
        .alias("bnd"),
    )
    isl = fl.select(
        "doc_id",
        "tk",
        "pos",
        F.sum("bnd")
        .over(
            Window.partitionBy("doc_id")
            .orderBy("pos")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("island"),
    )
    chunks = (
        isl.groupBy("doc_id", "island")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "tk"))
                    ),
                    lambda x: x["tk"],
                ),
                " ",
            ).alias("chunk")
        )
    )
    census = chunks.groupBy(
        F.md5("chunk").alias("h"),
        F.length("chunk").cast("long").alias("len"),
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    return census.agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_chunks"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.coalesce(F.sum(F.col("c") - 1), F.lit(0))
        .cast("long")
        .alias("dup_chunks"),
        F.coalesce(F.sum(F.col("c") * F.col("len")), F.lit(0))
        .cast("long")
        .alias("chars_total"),
        F.coalesce(F.sum((F.col("c") - 1) * F.col("len")), F.lit(0))
        .cast("long")
        .alias("chars_dedupable"),
    )


# ---------------------------------------------------------------------------
# wave 172: categorical (attribute) assortativity on the similarity graph
# ---------------------------------------------------------------------------
@q(
    "kg_attr_assortativity",
    f"""
    WITH {_SH_SQL},
    okd AS (SELECT shingle FROM sh GROUP BY shingle
            HAVING COUNT(*) <= 1000),
    shc AS (SELECT sh.id, sh.shingle FROM sh JOIN okd USING (shingle)),
    sizes AS (SELECT id, COUNT(*) AS n_sh FROM shc GROUP BY id),
    inter AS (
      SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS inter
      FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.id < b.id
      GROUP BY a.id, b.id),
    pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.id = id_a
      JOIN sizes sb ON sb.id = id_b
      WHERE round(inter / (sa.n_sh + sb.n_sh - inter), 6) >= 0.2),
    lg AS (SELECT doc_id, lang FROM documents),
    dhalf AS (
      SELECT la.lang AS lx, lb.lang AS ly
      FROM pairs p JOIN lg la ON la.doc_id = p.id_a
                  JOIN lg lb ON lb.doc_id = p.id_b
      UNION ALL
      SELECT lb.lang, la.lang
      FROM pairs p JOIN lg la ON la.doc_id = p.id_a
                  JOIN lg lb ON lb.doc_id = p.id_b),
    mm AS (
      SELECT lx, ly, CAST(COUNT(*) AS BIGINT) AS c
      FROM dhalf GROUP BY lx, ly),
    tot AS (
      SELECT CAST(SUM(c) AS BIGINT) AS m,
             CAST(SUM(CASE WHEN lx = ly THEN c ELSE 0 END)
                  AS BIGINT) AS diag
      FROM mm),
    rows_ AS (
      SELECT CAST(COALESCE(SUM(rs * rs), 0) AS BIGINT) AS srow2
      FROM (SELECT lx, CAST(SUM(c) AS BIGINT) AS rs
            FROM mm GROUP BY lx) z)
    SELECT t.m AS n_edge_ends, t.diag AS n_same_lang_ends,
           r.srow2,
           CASE WHEN t.m = 0 OR t.m * t.m = r.srow2 THEN NULL
                ELSE round(CAST(t.m * t.diag - r.srow2 AS DOUBLE)
                           / (CAST(t.m AS DOUBLE) * t.m - r.srow2),
                           6) + 0
           END AS assortativity
    FROM tot t, rows_ r
    """,
)
def kg_attr_assortativity(spark, sf):
    """Newman's CATEGORICAL assortativity on the document-
    similarity graph, mixing by language — kg_assortativity
    measures degree-degree correlation; this face asks the
    attribute question a dedup/contamination analyst asks: do
    near-duplicate edges stay WITHIN a language shard (r -> 1,
    translation-free corpus) or cross shards (r <= 0, template
    reuse across locales — the fingerprint of machine-templated
    spam)? Edges are dedup_jaccard's df-capped pairs (threshold
    0.2, cap mirrored — the whole similarity machinery reused,
    not rebuilt); the mixing matrix counts DIRECTED edge halves
    (each undirected pair contributes both orientations, the
    standard e_xy symmetrization), and r = (M*diag - sum
    rowsum^2) / (M^2 - sum rowsum^2) clears every division into
    exact BIGINTs with one final float. Degenerate guard: a
    single-language edge set makes the denominator 0 -> NULL.
    The shared-vocabulary fixture (the kg_dict_coverage finding)
    yields cross-lang near-dups, so r is pinned WELL BELOW 1 —
    the honest reading, asserted in the replay test."""
    from ..operators import dedup as dd

    pairs = dd.ngram_jaccard_pairs(
        t(spark, sf, "documents"), "doc_id", "text", shingle_n=3,
        threshold=0.2, max_df=1000,
    ).select("id_a", "id_b")
    from ..operators.dedup import parquet_checkpoint

    pairs = parquet_checkpoint(pairs, "attr_asso_pairs")
    lg = t(spark, sf, "documents").select("doc_id", "lang")
    j = (
        pairs.join(
            lg.withColumnRenamed("doc_id", "id_a").withColumnRenamed(
                "lang", "la"
            ),
            "id_a",
        )
        .join(
            lg.withColumnRenamed("doc_id", "id_b").withColumnRenamed(
                "lang", "lb"
            ),
            "id_b",
        )
        .select("la", "lb")
    )
    dhalf = j.select(
        F.col("la").alias("lx"), F.col("lb").alias("ly")
    ).unionAll(
        j.select(F.col("lb").alias("lx"), F.col("la").alias("ly"))
    )
    mm = dhalf.groupBy("lx", "ly").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    from ..operators.dedup import parquet_checkpoint as _ck

    mm = _ck(mm, "attr_asso_mm")
    tot = mm.agg(
        F.sum("c").cast("long").alias("m"),
        F.sum(
            F.when(F.col("lx") == F.col("ly"), F.col("c")).otherwise(0)
        )
        .cast("long")
        .alias("diag"),
    )
    rows_ = (
        mm.groupBy("lx")
        .agg(F.sum("c").cast("long").alias("rs"))
        .agg(
            F.coalesce(F.sum(F.col("rs") * F.col("rs")), F.lit(0))
            .cast("long")
            .alias("srow2")
        )
    )
    jn = tot.crossJoin(rows_)
    m, diag, srow2 = F.col("m"), F.col("diag"), F.col("srow2")
    bad = (m == 0) | (m * m == srow2)
    return jn.select(
        m.alias("n_edge_ends"),
        diag.alias("n_same_lang_ends"),
        "srow2",
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                (m * diag - srow2).cast("double")
                / (m.cast("double") * m - srow2),
                6,
            )
            + F.lit(0.0)
        )
        .alias("assortativity"),
    )


# ---------------------------------------------------------------------------
# wave 174: perceptual-hash-style near-dup pairs over binary media
# ---------------------------------------------------------------------------
@q(
    "multimodal_phash",
    """
    WITH media AS (
      SELECT doc_id AS media_id,
             lower(hex(encode(text))) AS hx
      FROM documents),
    sh AS (
      SELECT media_id,
             substr(hx, (g - 1) * 8 + 1, 8) AS tok
      FROM media,
           UNNEST(generate_series(1, CAST(length(hx) // 8 AS BIGINT)))
             AS t(g)),
    hv AS (SELECT media_id, md5(tok) AS h FROM sh),
    voted AS (
      SELECT media_id,
             {vote_cols}
      FROM hv GROUP BY media_id),
    fp AS (
      SELECT media_id, {bit_concat} AS phash
      FROM voted),
    banded AS (
      SELECT media_id, phash, j AS band,
             substring(phash, j * 4 + 1, 4) AS bucket
      FROM fp, (SELECT unnest([0, 1, 2, 3]) AS j)),
    s AS (
      SELECT a.media_id AS id_a, b.media_id AS id_b,
             len(list_filter(range(1, 17),
                 i -> substring(a.phash, i, 1)
                      <> substring(b.phash, i, 1))) AS hamming
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.bucket = b.bucket
       AND a.media_id < b.media_id)
    SELECT DISTINCT id_a, id_b, CAST(hamming AS INT) AS hamming
    FROM s WHERE hamming <= 3
    """.replace(
        "{vote_cols}",
        ",\n             ".join(
            "SUM(CASE WHEN substring(h, %d, 1) IN ('1','3','5','7',"
            "'9','b','d','f') THEN 1 ELSE -1 END) AS v%d" % (j + 1, j)
            for j in range(16)
        ),
    ).replace(
        "{bit_concat}",
        " || ".join(
            "(CASE WHEN v%d > 0 THEN '1' ELSE '0' END)" % j
            for j in range(16)
        ),
    ),
)
def multimodal_phash(spark, sf):
    """Perceptual-hash-STYLE near-duplicate pairs over the binary
    media payloads — the step after multimodal_dedup's exact CAS
    census: byte-level 4-byte shingles (non-overlapping hex
    8-grams, so volume stays LINEAR in blob size), a 16-bit
    simhash by per-shingle md5-nibble parity votes (the
    operators/dedup.simhash construction re-targeted from word
    tokens to byte shingles — a real pHash would DCT decoded
    pixels; this is the content-hash analog that works on
    UNDECODABLE media, which is the honest claim), and the
    dedup_simhash_pairs 4-band pigeonhole join guaranteeing exact
    recall at hamming <= 3. Byte-identical blobs pair at hamming
    0 (the CAS dups reappear — pinned against multimodal_dedup's
    census); near-identical byte streams pair at small hamming.
    Hex is lower()ed on BOTH engines before shingling (DuckDB
    hex() is UPPERCASE, Spark's lower — the mix_domains trap).
    Scale shape: map-side shingle explode, 16 conditional sums
    per blob, banded equi-join with per-band buckets — never an
    all-pairs comparison."""
    from ..operators import dedup as dd

    media = t(spark, sf, "documents").select(
        F.col("doc_id").alias("id"),
        F.lower(F.hex(F.encode(F.col("text"), "utf-8"))).alias("hx"),
    )
    sh = media.select(
        "id",
        F.explode(
            F.expr(
                "transform(sequence(1, length(hx) div 8),"
                " g -> substring(hx, (g - 1) * 8 + 1, 8))"
            )
        ).alias("tok"),
    )
    hv = sh.select("id", F.md5("tok").alias("h"))
    votes = [
        F.sum(
            F.when(
                F.substring("h", j + 1, 1).isin(
                    "1", "3", "5", "7", "9", "b", "d", "f"
                ),
                1,
            ).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(16)
    ]
    voted = hv.groupBy("id").agg(*votes)
    bits = [
        F.when(F.col(f"v{j}") > 0, F.lit("1")).otherwise(F.lit("0"))
        for j in range(16)
    ]
    fp = voted.select("id", F.concat(*bits).alias("simhash"))
    return dd.simhash_pairs(fp, bits=16, bands=4, max_hamming=3).select(
        F.col("id_a"),
        F.col("id_b"),
        F.col("hamming").cast("int").alias("hamming"),
    )


# ---------------------------------------------------------------------------
# wave 182: survivor-policy agreement — min-id vs longest-text keepers
# ---------------------------------------------------------------------------
@q(
    "dedup_survivor_policies",
    f"""
    WITH RECURSIVE {_SH_SQL},
    sigs AS (
      SELECT id,
             MIN(substring(md5(shingle), 1, 8)) AS mh0,
             MIN(substring(md5(shingle), 9, 8)) AS mh1,
             MIN(substring(md5(shingle), 17, 8)) AS mh2,
             MIN(substring(md5(shingle), 25, 8)) AS mh3
      FROM sh GROUP BY id),
    banded AS (
      SELECT id, 0 AS band, mh0 AS bucket FROM sigs
      UNION ALL SELECT id, 1, mh1 FROM sigs
      UNION ALL SELECT id, 2, mh2 FROM sigs
      UNION ALL SELECT id, 3, mh3 FROM sigs),
    okb AS (SELECT band, bucket FROM banded
            GROUP BY band, bucket HAVING COUNT(*) <= 1000),
    bk AS (SELECT b.id, b.band, b.bucket
           FROM banded b JOIN okb USING (band, bucket)),
    prs AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM bk a JOIN bk b
        ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
    edges AS (SELECT id_a AS s, id_b AS d FROM prs
              UNION SELECT id_b, id_a FROM prs),
    nodes AS (SELECT DISTINCT s AS v FROM edges),
    reach(v, l) AS (
      SELECT v, v FROM nodes
      UNION
      SELECT e.d, r.l FROM reach r JOIN edges e ON e.s = r.v),
    comp AS (SELECT v AS id, MIN(l) AS component FROM reach
             GROUP BY v),
    mem AS (
      SELECT c.component, c.id, d.n_chars
      FROM comp c JOIN documents d ON d.doc_id = c.id),
    pick AS (
      SELECT component,
             MIN(id) AS keep_minid,
             MIN(CASE WHEN rn = 1 THEN id END) AS keep_longest
      FROM (SELECT component, id, n_chars,
                   ROW_NUMBER() OVER (PARTITION BY component
                     ORDER BY n_chars DESC, id) AS rn
            FROM mem) z
      GROUP BY component)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(CASE WHEN keep_minid = keep_longest THEN 1
                         ELSE 0 END) AS BIGINT) AS n_agree,
           CASE WHEN COUNT(*) = 0 THEN NULL
                ELSE round(SUM(CASE WHEN keep_minid = keep_longest
                               THEN 1 ELSE 0 END)
                           / CAST(COUNT(*) AS DOUBLE), 6) + 0
           END AS agree_rate
    FROM pick
    """,
)
def dedup_survivor_policies(spark, sf):
    """Survivor-POLICY agreement census — when an LSH dup-cluster
    must keep one representative, does keep-lowest-id (the
    deterministic default dedup_survivors ships) pick the same
    document as keep-longest-text (the quality-first policy
    curation teams actually want)? The disagreement rate is the
    cost of determinism-over-quality, measured before anyone
    commits a policy: clusters from the SAME minhash/LSH/CC
    machinery as dedup_survivors (4 hashes, 4 bands, two-phase
    CC), members joined back to n_chars, both keepers per cluster
    from ONE window pass (longest-text broken by id — ties must
    not make the comparison engine-dependent), agreement as exact
    integers. Web-crawl reality check baked into the test: the
    policies genuinely disagree on some clusters (mirrors differ
    in boilerplate trim), so agree_rate is pinned strictly inside
    (0, 1]. Scale: everything after CC is |clusters|-sized."""
    docs = t(spark, sf, "documents")
    sigs = dd.minhash_signatures(
        docs, "doc_id", "text", n_hashes=4, shingle_n=3
    )
    comp = dd.connected_components(
        dd.lsh_pairs(sigs, n_hashes=4, bands=4)
    )
    from ..operators.dedup import parquet_checkpoint

    mem = parquet_checkpoint(
        comp.join(
            docs.select(
                F.col("doc_id").alias("id"), "n_chars"
            ),
            "id",
        ),
        "surv_pol_mem",
    )
    w = Window.partitionBy("component").orderBy(
        F.desc("n_chars"), F.col("id")
    )
    pick = (
        mem.select(
            "component",
            "id",
            F.row_number().over(w).alias("rn"),
        )
        .groupBy("component")
        .agg(
            F.min("id").alias("keep_minid"),
            F.min(F.when(F.col("rn") == 1, F.col("id"))).alias(
                "keep_longest"
            ),
        )
    )
    agree = F.sum(
        F.when(
            F.col("keep_minid") == F.col("keep_longest"), 1
        ).otherwise(0)
    )
    return pick.agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
        agree.cast("long").alias("n_agree"),
        F.when(
            F.count(F.lit(1)) == 0, F.lit(None).cast("double")
        )
        .otherwise(
            F.round(
                agree / F.count(F.lit(1)).cast("double"), 6
            )
            + F.lit(0.0)
        )
        .alias("agree_rate"),
    )
