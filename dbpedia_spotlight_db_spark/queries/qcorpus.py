"""Web-corpus curation operators (round-3 breadth pass): the
compaction / decontamination / chunking / retrieval faces a crawl ->
training-data pipeline runs between ingestion and model training.

Same contract as the sibling query modules: every key is a Spark
callable plus a DuckDB twin with IDENTICAL column names and values
(floats rounded to 6 before any hash-checked comparison; ranking
always on rounded values + a total tie-break so row selection can
never depend on sub-ulp libm differences between engines).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..operators import curation
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
# crawl compaction: latest snapshot per key
# ---------------------------------------------------------------------------
@q(
    "crawl_latest",
    """
    SELECT user_id, event_id AS latest_event_id, ts AS latest_ts,
           event_type AS latest_type
    FROM events
    QUALIFY ROW_NUMBER() OVER (
      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def crawl_latest(spark, sf):
    """Latest-snapshot-per-key compaction — the first pass over any
    multi-fetch crawl (many (url, warc_ts) fetches -> one current row
    per url; ``events`` stands in with user_id as the key and ts as
    the fetch time). Implemented as a single ``max_by`` aggregation
    rather than a row_number window: the agg is map-side combinable
    (each map task emits at most one candidate row per key), so the
    one exchange carries ~|keys| rows instead of every fetch of every
    url — and a hot url (thousands of snapshots) can never skew the
    shuffle. Spark plans the struct-buffer max_by as a two-phase
    SortAggregate (asserted in tools/explain_audit.py); the sort is
    the map-side group-by ordering, not a corpus-wide sort. (ts,
    event_id) is a total order, so the winner is deterministic and
    the QUALIFY twin selects the identical row."""
    e = t(spark, sf, "events")
    ordk = F.struct(F.col("ts"), F.col("event_id"))
    best = F.max_by(
        F.struct(
            F.col("event_id").alias("latest_event_id"),
            F.col("ts").alias("latest_ts"),
            F.col("event_type").alias("latest_type"),
        ),
        ordk,
    ).alias("b")
    return (
        e.groupBy("user_id")
        .agg(best)
        .select("user_id", "b.latest_event_id", "b.latest_ts", "b.latest_type")
    )


# ---------------------------------------------------------------------------
# benchmark decontamination: n-gram overlap anti-join
# ---------------------------------------------------------------------------
_DECON_N = 8  # shingle width (words); benchmark = every 97th doc

_DECON_SQL = f"""
    tok AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents
            WHERE len(string_split(text, ' ')) >= {_DECON_N}),
    pos AS (
      SELECT doc_id, arr,
             unnest(generate_series(1, len(arr) - {_DECON_N - 1})) AS i
      FROM tok),
    corpus_g AS (
      SELECT doc_id, array_to_string(arr[i:i+{_DECON_N - 1}], ' ') AS gram
      FROM pos),
    bench_g AS (
      SELECT DISTINCT gram FROM corpus_g WHERE doc_id % 97 = 0),
    dirty AS (
      SELECT DISTINCT c.doc_id
      FROM corpus_g c JOIN bench_g b ON c.gram = b.gram)
"""


@q(
    "decontaminate",
    f"""
    WITH {_DECON_SQL}
    SELECT d.doc_id FROM documents d
    LEFT JOIN dirty ON d.doc_id = dirty.doc_id
    WHERE dirty.doc_id IS NULL
    """,
)
def decontaminate(spark, sf):
    """Benchmark decontamination: drop every training document that
    shares any {N}-word shingle with the held-out benchmark set (here
    the deterministic doc_id%97 slice stands in for the benchmark).
    This is the standard anti-leak pass before LLM training. Scale
    shape: operators/curation.py::decontaminate — benchmark shingles
    broadcast, corpus map-only shingle expansion -> broadcast
    semi-join -> distinct on doc_id -> anti-join; the corpus is never
    shuffled by gram."""
    docs = t(spark, sf, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    return curation.decontaminate(docs, bench, n=_DECON_N).select("doc_id")


# ---------------------------------------------------------------------------
# token-window chunking (training-example construction)
# ---------------------------------------------------------------------------
_CHUNK_LEN = 32
_CHUNK_STRIDE = 16


@q(
    "text_chunks",
    f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
    pos AS (
      SELECT doc_id, arr,
             unnest(generate_series(1, len(arr), {_CHUNK_STRIDE})) AS i
      FROM tok)
    SELECT doc_id,
           CAST(i - 1 AS INT) AS chunk_start,
           CAST(least({_CHUNK_LEN}, len(arr) - (i - 1)) AS INT) AS n_tokens,
           array_to_string(arr[i:i+{_CHUNK_LEN - 1}], ' ') AS chunk_text
    FROM pos
    """,
)
def text_chunks(spark, sf):
    """Fixed-window token chunking with overlap (len=32, stride=16) —
    how a document corpus becomes training examples. Pure map-side
    array math (split -> sequence of starts -> slice + join per
    start): no shuffle, no UDF, output rows ~2x input tokens/stride.
    Delegates to operators/curation.py::chunk_tokens."""
    return curation.chunk_tokens(
        t(spark, sf, "documents"),
        chunk_len=_CHUNK_LEN,
        stride=_CHUNK_STRIDE,
    )


# ---------------------------------------------------------------------------
# per-host crawl statistics
# ---------------------------------------------------------------------------
_HOST_URL_SQL = (
    "'https://h' || CAST(doc_id % 53 AS VARCHAR) || '.example.org/p/'"
    " || CAST(doc_id AS VARCHAR)"
)
_HOST_RE = "^[a-z]+://([^/:?#]+)"


@q(
    "host_stats",
    f"""
    WITH u AS (SELECT doc_id, lang, n_chars, {_HOST_URL_SQL} AS url
               FROM documents)
    SELECT regexp_extract(url, '{_HOST_RE}', 1) AS host,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
    FROM u GROUP BY 1
    """,
)
def host_stats(spark, sf):
    """Per-host crawl statistics (docs, bytes, language spread) — the
    politeness/quota/quality dimension every crawl pipeline maintains.
    The corpus table carries no real URLs, so a deterministic URL is
    synthesized per doc_id on BOTH sides and the oracle checks the
    host extraction (regexp_extract) + aggregation. Scale shape: hash
    agg on host with map-side partial aggregation; hosts are Zipfian
    at crawl scale, which is exactly what the repo's salted_count
    handles — this face keeps the plain agg so the twin stays SQL."""
    d = t(spark, sf, "documents")
    url = F.concat(
        F.lit("https://h"),
        (F.col("doc_id") % 53).cast("string"),
        F.lit(".example.org/p/"),
        F.col("doc_id").cast("string"),
    )
    return (
        d.select(
            F.regexp_extract(url, _HOST_RE, 1).alias("host"),
            "lang",
            "n_chars",
        )
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
        )
    )


# ---------------------------------------------------------------------------
# stratified deterministic sampling
# ---------------------------------------------------------------------------
@q(
    "sample_stratified",
    """
    SELECT doc_id, lang FROM documents
    WHERE CASE WHEN lang = 'en'
               THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= '7'
               ELSE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0' END
    """,
)
def sample_stratified(spark, sf):
    """Per-stratum deterministic sampling: ~8/16 of English docs,
    ~1/16 of everything else — the language-rebalancing split step of
    multilingual corpus curation. Same md5-on-key primitive as
    sample_hash (reproducible across engines/runs/cluster sizes; hex
    digit compare '0'..'7' is a clean 50% cut), still a pure map-side
    filter that composes with pushdown — no sampleBy() RNG, whose
    draw order would be partitioning-dependent. Delegates to
    operators/curation.py::stratified_sample."""
    d = t(spark, sf, "documents")
    return curation.stratified_sample(
        d, "lang", {"en": 0.5}, default_frac=1 / 16
    ).select("doc_id", "lang")


# ---------------------------------------------------------------------------
# corpus vocabulary: top-k tokens (heavy hitters)
# ---------------------------------------------------------------------------
@q(
    "token_topk",
    """
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS tk FROM documents),
    cnt AS (SELECT tk, COUNT(*) AS c FROM tok GROUP BY tk)
    SELECT tk, c,
           CAST(ROW_NUMBER() OVER (ORDER BY c DESC, tk) AS INT) AS rnk
    FROM cnt
    QUALIFY rnk <= 100
    """,
)
def token_topk(spark, sf):
    """Corpus heavy hitters: top-100 tokens by frequency with a dense
    Zipf rank — the vocabulary-head report used for stopword lists
    and tokenizer sanity checks. Scale shape: exact counts via
    map-side-combinable agg (vocab-sized shuffle, never corpus-sized),
    then orderBy+LIMIT — Spark's TakeOrderedAndProject computes
    per-partition top-100 and merges on the driver, so no global sort
    materializes; the row_number window then runs on 100 rows. Ties
    are broken by token text, so the cutoff row is engine-stable."""
    d = t(spark, sf, "documents")
    cnt = (
        d.select(F.explode(F.split("text", " ")).alias("tk"))
        .groupBy("tk")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top = cnt.orderBy(F.desc("c"), "tk").limit(100)
    w = Window.orderBy(F.desc("c"), "tk")
    return top.select(
        "tk", "c", F.row_number().over(w).cast("int").alias("rnk")
    )


# ---------------------------------------------------------------------------
# BM25 retrieval scoring
# ---------------------------------------------------------------------------
_BM25_TERMS = ("spark", "hash", "merge")
_BM25_K1 = 1.2
_BM25_B = 0.75


@q(
    "bm25_search",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tk FROM documents),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (SELECT AVG(CAST(dl AS DOUBLE)) AS avgdl,
                     COUNT(*) AS n_docs FROM dl),
    tf AS (
      SELECT doc_id, tk, COUNT(*) AS tf FROM tok
      WHERE tk IN {_BM25_TERMS!r} GROUP BY doc_id, tk),
    df AS (SELECT tk, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY tk)
    SELECT tf.doc_id,
           round(SUM(
             ln(1.0 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
             * tf.tf * ({_BM25_K1} + 1.0)
             / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                + {_BM25_B} * dl.dl / stats.avgdl))), 6) AS score
    FROM tf
    JOIN df ON tf.tk = df.tk
    JOIN dl ON tf.doc_id = dl.doc_id
    CROSS JOIN stats
    GROUP BY tf.doc_id
    """,
)
def bm25_search(spark, sf):
    """BM25 keyword retrieval over the corpus (query = a fixed term
    set): the scoring half of a distributed search index, and the
    relevance-filter face of targeted corpus curation ("keep docs
    about X"). All relational: tf is a map-side-combinable agg
    pre-filtered to the query terms (the IN pushes to the scan), df
    and the corpus stats are term-/scalar-sized and attach by
    broadcast, and the final per-doc sum shuffles only docs that
    matched at least one term. Emits every matched doc with its
    rounded score — selection is by exact term match, never by a
    float cutoff, so the twin is hash-stable."""
    k1, b = _BM25_K1, _BM25_B
    d = t(spark, sf, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("tk"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    tf = (
        tok.filter(F.col("tk").isin(*_BM25_TERMS))
        .groupBy("doc_id", "tk")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("tk").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.log(
        1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + k1 * (
        1.0 - b + b * F.col("dl") / F.col("avgdl")
    )
    return (
        tf.join(F.broadcast(df), "tk")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(idf * F.col("tf") * (k1 + 1.0) / denom), 6
            ).alias("score")
        )
    )


# ---------------------------------------------------------------------------
# per-document keyword extraction (TF-IDF top terms)
# ---------------------------------------------------------------------------
@q(
    "doc_tfidf_topterms",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tk FROM documents),
    tf AS (SELECT doc_id, tk, COUNT(*) AS tf FROM tok GROUP BY doc_id, tk),
    df AS (SELECT tk, COUNT(*) AS df FROM tf GROUP BY tk),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.tk,
             round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
      FROM tf JOIN df ON tf.tk = df.tk CROSS JOIN n)
    SELECT doc_id, tk, tfidf FROM scored
    QUALIFY ROW_NUMBER() OVER (
      PARTITION BY doc_id ORDER BY tfidf DESC, tk) <= 3
    """,
)
def doc_tfidf_topterms(spark, sf):
    """Per-document keyword extraction: top-3 terms by TF-IDF — the
    cheap topic signal used for corpus clustering and faceting.
    Ranking happens on the ROUNDED score (both engines), so row
    selection can never hinge on a last-ulp ln() difference; ties
    break on token text. Scale shape: df is vocab-sized so it is NOT
    hint-broadcast (contrast bm25_search, whose df is filtered to the
    query's handful of terms BEFORE its hint) — billions of distinct
    web tokens make a forced broadcast an executor-OOM, while
    unhinted, AQE broadcasts when df actually fits and otherwise
    sort-merge-joins on tk. The 1-row doc count stays hinted. The
    per-doc top-3 is a row_number window partitioned by doc_id —
    Spark's WindowGroupLimit pushes the limit before the full sort
    materializes, and the partition key is the doc, so there is no
    skew (docs have bounded vocab)."""
    d = t(spark, sf, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("tk"))
    tf = tok.groupBy("doc_id", "tk").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("tk").agg(F.count(F.lit(1)).alias("df"))
    n = d.select(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(df, "tk")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "tk",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "tk")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "tk", "tfidf")
    )


# ---------------------------------------------------------------------------
# C4-style corpus-level duplicate-line removal
# ---------------------------------------------------------------------------
_LINE_W = 3   # block width (tokens) — the "line" unit for newline-free text
_LINE_K = 3   # corpus occurrence threshold (C4 drops lines seen >= 3 times)


@q(
    "dedup_lines",
    f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
    blk AS (
      SELECT doc_id, CAST((i - 1) // {_LINE_W} AS INT) AS pos,
             array_to_string(arr[i:i+{_LINE_W - 1}], ' ') AS block
      FROM (SELECT doc_id, arr,
                   unnest(generate_series(1, len(arr), {_LINE_W})) AS i
            FROM tok)),
    bad AS (SELECT block FROM blk GROUP BY block HAVING COUNT(*) >= {_LINE_K}),
    kept AS (SELECT b.doc_id, b.pos, b.block FROM blk b
             LEFT JOIN bad ON b.block = bad.block WHERE bad.block IS NULL),
    rec AS (SELECT doc_id, string_agg(block, ' ' ORDER BY pos) AS clean_text,
                   COUNT(*) AS n_kept FROM kept GROUP BY doc_id),
    nb AS (SELECT doc_id,
                  len(generate_series(1, len(string_split(text, ' ')),
                                      {_LINE_W})) AS n_blocks
           FROM documents)
    SELECT nb.doc_id,
           COALESCE(rec.clean_text, '') AS clean_text,
           CAST(COALESCE(rec.n_kept, 0) AS INT) AS n_kept,
           CAST(nb.n_blocks - COALESCE(rec.n_kept, 0) AS INT) AS n_dropped
    FROM nb LEFT JOIN rec ON nb.doc_id = rec.doc_id
    """,
)
def dedup_lines(spark, sf):
    """C4-style duplicate-LINE removal across the corpus: any 3-token
    block whose exact string occurs >= 3 times corpus-wide is
    boilerplate and is dropped from every document; docs are then
    reassembled from their surviving blocks in order. This is the
    sub-document dedup pass (Raffel et al. C4; Lee et al. dedup) that
    exact/minhash doc-level dedup cannot express. Scale shape in
    operators/curation.py::line_dedup — block counts are a
    vocabulary-sized map-combinable agg, the bad set anti-joins back
    WITHOUT a forced broadcast, and the rebuild groups by doc id."""
    return curation.line_dedup(
        t(spark, sf, "documents"), width=_LINE_W, min_count=_LINE_K
    )


# ---------------------------------------------------------------------------
# Gopher-style within-document repetition signals (map-only)
# ---------------------------------------------------------------------------
@q(
    "text_repetition",
    f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
    base AS (SELECT doc_id, arr, len(arr) AS n FROM tok),
    bg AS (SELECT doc_id, arr[i] || ' ' || arr[i + 1] AS g
           FROM (SELECT doc_id, arr,
                        unnest(generate_series(1, len(arr) - 1)) AS i
                 FROM tok WHERE len(arr) >= 2)),
    bgm AS (SELECT doc_id, MAX(c) AS mx
            FROM (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY doc_id, g)
            GROUP BY doc_id),
    blk AS (SELECT doc_id, array_to_string(arr[i:i+{_LINE_W - 1}], ' ') AS b
            FROM (SELECT doc_id, arr,
                         unnest(generate_series(1, len(arr), {_LINE_W})) AS i
                  FROM tok)),
    blks AS (SELECT doc_id, COUNT(*) AS nb, COUNT(DISTINCT b) AS ndb
             FROM blk GROUP BY doc_id)
    SELECT base.doc_id, CAST(base.n AS INT) AS n_tokens,
           round(COALESCE(2.0 * bgm.mx / base.n, 0.0), 6) AS top_bigram_frac,
           round((blks.nb - blks.ndb) * 1.0 / blks.nb, 6) AS dup_block_frac,
           round(len(list_distinct(base.arr)) * 1.0 / base.n, 6)
             AS distinct_frac
    FROM base
    LEFT JOIN bgm ON base.doc_id = bgm.doc_id
    JOIN blks ON base.doc_id = blks.doc_id
    """,
)
def text_repetition(spark, sf):
    """Gopher-style repetition quality signals per document: fraction
    of tokens covered by the most frequent bigram, fraction of
    repeated 3-token blocks, type/token ratio. The Spark side is
    MAP-ONLY (the max-bigram count is a run-length fold over the
    sorted in-row bigram array — operators/curation.py::_MAX_RUN), so
    at 10^12 docs this costs one scan and zero shuffle; the DuckDB
    twin computes the same numbers relationally."""
    return curation.repetition_signals(
        t(spark, sf, "documents"), block_width=_LINE_W
    )


# ---------------------------------------------------------------------------
# greedy sequence packing (training-example assembly)
# ---------------------------------------------------------------------------
_PACK_CTX = 256
_PACK_SHARDS = 8


@q(
    "pack_sequences",
    f"""
    WITH d AS (SELECT doc_id, CAST(doc_id % {_PACK_SHARDS} AS INT) AS shard,
                      md5(CAST(doc_id AS VARCHAR)) AS h,
                      len(string_split(text, ' ')) AS n_tokens
               FROM documents),
    c AS (SELECT doc_id, shard, n_tokens,
                 SUM(n_tokens) OVER (PARTITION BY shard ORDER BY h, doc_id
                     ROWS UNBOUNDED PRECEDING) AS cum
          FROM d)
    SELECT doc_id, shard, CAST(n_tokens AS INT) AS n_tokens,
           CAST(cum - n_tokens AS BIGINT) AS tok_start,
           CAST((cum - n_tokens) // {_PACK_CTX} AS INT) AS seq_id
    FROM c
    """,
)
def pack_sequences(spark, sf):
    """Greedy concatenate-then-split sequence packing: docs shard by
    id, order deterministically by md5(id) within the shard, lay end
    to end by a running token offset, and land in the 256-token
    training sequence where they start. One shuffle (by shard); the
    per-shard cumsum is a window over the shard partition, and shard
    count scales with the cluster so no window outgrows a task.
    Delegates to operators/curation.py::pack_greedy."""
    return curation.pack_greedy(
        t(spark, sf, "documents"),
        ctx_len=_PACK_CTX,
        n_shards=_PACK_SHARDS,
    )


# ---------------------------------------------------------------------------
# PII redaction (compliance scrub)
# ---------------------------------------------------------------------------
_PII_AUG_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@mail.example.org call 555-'"
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    " || CASE WHEN doc_id % 5 = 0 THEN ' cc admin@example.com' ELSE '' END"
)


@q(
    "pii_redact",
    """
    WITH u AS (SELECT doc_id, """ + _PII_AUG_SQL + """ AS text
               FROM documents)
    SELECT doc_id,
           regexp_replace(regexp_replace(text,
             '""" + curation._EMAIL_RE + """', '<EMAIL>', 'g'),
             '""" + curation._PHONE_RE + """', '<PHONE>', 'g') AS clean_text,
           CAST(len(regexp_extract_all(text, '""" + curation._EMAIL_RE
    + """')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(text, '""" + curation._PHONE_RE
    + """')) AS INT) AS n_phones
    FROM u
    """,
)
def pii_redact(spark, sf):
    """PII scrubbing: emails and phone numbers replaced with typed
    placeholders plus per-doc redaction counts — the compliance pass
    before any web text reaches training. The corpus carries no real
    PII, so deterministic contact strings are synthesized per doc_id
    on BOTH sides (the host_stats precedent) and the oracle checks
    the identical RE2-compatible regexes. Map-only JVM regex — no
    UDF, composes with scan pruning (reads 2 of 5 columns)."""
    d = t(spark, sf, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.org call 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.when(F.col("doc_id") % 5 == 0, F.lit(" cc admin@example.com"))
        .otherwise(F.lit("")),
    )
    return curation.pii_redact(d.select("doc_id", aug.alias("text")))


# ---------------------------------------------------------------------------
# temperature-rebalanced domain mixing
# ---------------------------------------------------------------------------
_MIX_TAU = 0.5
# the corpus 'source' column is uniform by construction, so a skewed
# pseudo-domain is derived per doc_id on BOTH sides (host_stats
# precedent): floor(sqrt(doc_id % 100)) gives domains 0..9 with
# counts 1,3,5,...,19 — a deterministic Zipf-ish split
_MIX_DOM_SQL = "CAST(floor(sqrt(doc_id % 100)) AS INT)"
_MIX_SCALE = 4294967296.0  # 16^8: md5 8-hex-digit prefix space


@q(
    "mix_domains",
    f"""
    WITH d AS (SELECT doc_id, {_MIX_DOM_SQL} AS domain FROM documents),
    c AS (SELECT domain, COUNT(*) AS c FROM d GROUP BY domain),
    n AS (SELECT SUM(c) AS n FROM c),
    w AS (SELECT domain, pow(c * 1.0 / n.n, {_MIX_TAU} - 1.0) AS raw
          FROM c CROSS JOIN n),
    mx AS (SELECT MAX(raw) AS mx FROM w),
    f AS (SELECT domain, round(raw / mx.mx, 6) AS keep_frac
          FROM w CROSS JOIN mx)
    SELECT d.doc_id, d.domain, f.keep_frac
    FROM d JOIN f ON d.domain = f.domain
    WHERE f.keep_frac >= 1.0
       OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)
          < lpad(lower(to_hex(
              CAST(floor(f.keep_frac * {_MIX_SCALE}) AS BIGINT))), 8, '0')
    """,
)
def mix_domains(spark, sf):
    """Temperature-rebalanced domain mixing (tau=0.5): per-domain keep
    fractions f_d proportional to p_d^(tau-1), normalized so the
    rarest domain keeps everything — the multinomial-temperature
    sampling used to stop head domains from dominating a training
    mix. Two tiny aggregations (domain counts, their max-weight
    scalar) broadcast back onto the corpus; the keep decision is the
    md5-threshold filter (8 hex digits = 1/2^32 granularity, compared
    as lowercase hex strings so both engines do the identical
    lexicographic = numeric test), so the same doc is kept on every
    run, engine, and cluster size. Fractions round to 6 before the
    threshold, so the cut can never hinge on a pow() ulp."""
    d = t(spark, sf, "documents").select(
        "doc_id",
        F.floor(F.sqrt(F.col("doc_id") % 100)).cast("int").alias("domain"),
    )
    c = d.groupBy("domain").agg(F.count(F.lit(1)).alias("c"))
    n = c.agg(F.sum("c").alias("n"))
    w = c.crossJoin(F.broadcast(n)).select(
        "domain",
        F.pow(F.col("c") / F.col("n"), _MIX_TAU - 1.0).alias("raw"),
    )
    mx = w.agg(F.max("raw").alias("mx"))
    f = w.crossJoin(F.broadcast(mx)).select(
        "domain", F.round(F.col("raw") / F.col("mx"), 6).alias("keep_frac")
    )
    thr = F.lpad(
        F.lower(
            F.hex((F.col("keep_frac") * _MIX_SCALE).cast("long"))
        ),
        8,
        "0",
    )
    keep = (F.col("keep_frac") >= 1.0) | (
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8) < thr
    )
    return (
        d.join(F.broadcast(f), "domain")
        .filter(keep)
        .select("doc_id", "domain", "keep_frac")
    )


# ---------------------------------------------------------------------------
# incremental snapshot merge (upsert + tombstone deletes)
# ---------------------------------------------------------------------------
_UPSERT_COMPACT = """
      SELECT user_id, event_id, ts, event_type FROM {src}
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
"""


@q(
    "crawl_upsert",
    f"""
    WITH base_log AS (SELECT * FROM events WHERE event_id % 10 < 8),
    delta_log AS (SELECT * FROM events WHERE event_id % 10 >= 8),
    base AS ({_UPSERT_COMPACT.format(src="base_log")}),
    delta AS ({_UPSERT_COMPACT.format(src="delta_log")})
    SELECT b.user_id, b.event_id, b.ts, b.event_type
    FROM base b LEFT JOIN delta d ON b.user_id = d.user_id
    WHERE d.user_id IS NULL
    UNION ALL
    SELECT user_id, event_id, ts, event_type FROM delta
    WHERE event_type <> 'error'
    """,
)
def crawl_upsert(spark, sf):
    """Incremental snapshot merge — apply a changelog DELTA onto a
    compacted BASE state with upsert + tombstone-delete semantics (the
    MERGE INTO shape every periodically-refreshed crawl/KG store
    needs: re-fetches replace the old row, 410/parked pages delete
    it). The fixture splits ``events`` into base (event_id%10<8) and
    delta logs; ``event_type='error'`` is the tombstone. Both sides
    compact to latest-per-key via the same map-side-combinable
    ``max_by`` aggregation as crawl_latest (never a row_number sort of
    the full log), then: base rows not touched by the delta survive a
    left_anti join, delta winners that aren't tombstones are unioned
    in. Scale shape: the delta is a day's crawl vs a corpus-sized
    base, so AQE broadcasts the anti-join probe; with the base stored
    bucketed on the key (sources/catalog.save_bucketed) the anti-join
    needs no base-side exchange at all — the base is only ever
    re-partitioned by the same key it is already laid out on."""
    e = t(spark, sf, "events")

    def compact(log):
        best = F.max_by(
            F.struct("event_id", "ts", "event_type"),
            F.struct("ts", "event_id"),
        ).alias("b")
        return (
            log.groupBy("user_id")
            .agg(best)
            .select("user_id", "b.event_id", "b.ts", "b.event_type")
        )

    base = compact(e.filter(F.col("event_id") % 10 < 8))
    delta = compact(e.filter(F.col("event_id") % 10 >= 8))
    kept = base.join(delta.select("user_id"), "user_id", "left_anti")
    upserts = delta.filter(F.col("event_type") != "error")
    return kept.unionByName(upserts)


# ---------------------------------------------------------------------------
# composite quality gate (Gopher-style rule bundle)
# ---------------------------------------------------------------------------
_QG_STOPS = ("the", "a", "of", "and", "to", "in")
_QG_STOPS_SQL = "[" + ", ".join(f"'{w}'" for w in _QG_STOPS) + "]"


@q(
    "quality_gate",
    f"""
    WITH s AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             CAST(length(text) AS DOUBLE) AS n_chars,
             CAST(len(list_filter(string_split(lower(text), ' '),
                                  w -> list_contains({_QG_STOPS_SQL}, w)))
                  AS DOUBLE) AS stop_hits,
             CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
                  AS DOUBLE) AS digit_chars,
             CAST(list_max(list_transform(string_split(text, ' '),
                                          w -> length(w))) AS BIGINT)
                  AS max_wlen
      FROM documents),
    r AS (
      SELECT doc_id, n_words,
             concat_ws(',',
               CASE WHEN n_words < 5 THEN 'min_words' END,
               CASE WHEN n_words > 5000 THEN 'max_words' END,
               CASE WHEN (n_chars - n_words + 1) / n_words < 2.0
                      OR (n_chars - n_words + 1) / n_words > 12.0
                    THEN 'word_len' END,
               CASE WHEN stop_hits / n_words < 0.02 THEN 'stopwords' END,
               CASE WHEN digit_chars / n_chars > 0.2 THEN 'digits' END,
               CASE WHEN max_wlen > 25 THEN 'long_token' END) AS failed
      FROM s)
    SELECT doc_id, n_words, failed = '' AS keep, failed FROM r
    """,
)
def quality_gate(spark, sf):
    """Composite document-quality gate — the Gopher-style rule bundle
    (word-count bounds, mean word length, stopword floor, digit
    ceiling, max-token length) every pretraining pipeline runs before
    dedup, emitting keep + the list of failed rules for filter-rate
    dashboards. Entirely pure column expressions (JVM regex + array
    HOFs, zero UDF, map-only — composes with scan pruning); the rule
    verdicts are CASE labels folded through concat_ws, which skips
    NULLs identically in both engines, so the failed-rule string is
    engine-stable. Thresholds compare exact-integer-derived doubles
    (one IEEE division per signal) — deterministic across engines and
    cluster sizes, unlike sampled or RNG-based gates."""
    d = t(spark, sf, "documents")
    words = F.split("text", " ")
    stops = F.array(*[F.lit(w) for w in _QG_STOPS])
    s = d.select(
        "doc_id",
        F.size(words).cast("long").alias("n_words"),
        F.length("text").cast("double").alias("n_chars"),
        F.size(
            F.filter(
                F.split(F.lower(F.col("text")), " "),
                lambda w: F.array_contains(stops, w),
            )
        )
        .cast("double")
        .alias("stop_hits"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", "[0-9]", ""))
        )
        .cast("double")
        .alias("digit_chars"),
        F.array_max(F.transform(words, F.length)).cast("long").alias("max_wlen"),
    )
    mean_wlen = (F.col("n_chars") - F.col("n_words") + 1) / F.col("n_words")
    failed = F.concat_ws(
        ",",
        F.when(F.col("n_words") < 5, "min_words"),
        F.when(F.col("n_words") > 5000, "max_words"),
        F.when((mean_wlen < 2.0) | (mean_wlen > 12.0), "word_len"),
        F.when(F.col("stop_hits") / F.col("n_words") < 0.02, "stopwords"),
        F.when(F.col("digit_chars") / F.col("n_chars") > 0.2, "digits"),
        F.when(F.col("max_wlen") > 25, "long_token"),
    )
    return s.select(
        "doc_id",
        "n_words",
        (failed == "").alias("keep"),
        failed.alias("failed"),
    )


# ---------------------------------------------------------------------------
# derived host blocklist: stats -> blocklist -> anti-join
# ---------------------------------------------------------------------------
_BL_LITERAL_HOSTS = ("h7.example.org", "h13.example.org")


@q(
    "host_blocklist",
    f"""
    WITH u AS (SELECT doc_id, n_chars,
                      regexp_extract({_HOST_URL_SQL}, '{_HOST_RE}', 1) AS host
               FROM documents),
    g AS (SELECT CAST(SUM(n_chars) AS BIGINT) AS g_sum,
                 CAST(COUNT(*) AS BIGINT) AS g_n FROM u),
    h AS (SELECT host, CAST(SUM(n_chars) AS BIGINT) AS h_sum,
                 CAST(COUNT(*) AS BIGINT) AS h_n FROM u GROUP BY host),
    bl AS (SELECT h.host FROM h CROSS JOIN g
           WHERE h.h_sum * g.g_n < g.g_sum * h.h_n
           UNION SELECT 'h7.example.org' UNION SELECT 'h13.example.org')
    SELECT u.doc_id, u.host FROM u
    WHERE u.host NOT IN (SELECT host FROM bl)
    """,
)
def host_blocklist(spark, sf):
    """Derived host-blocklist filter — the spam/SEO-farm hygiene step:
    per-host crawl stats feed a blocklist (here: hosts whose mean doc
    length is below the corpus mean, i.e. thin-content farms, plus a
    literal external feed), and the corpus survives an anti-join
    against it. The below-mean test cross-multiplies exact BIGINT
    sums/counts (h_sum*g_n < g_sum*h_n) instead of comparing float
    averages, so membership is bit-exact in both engines. Scale
    shape: the blocklist derives from two map-side-combinable aggs
    (host-sized + 1-row), and the filter is an UNHINTED left_anti —
    host lists are usually broadcastable but can reach millions of
    rows for a full crawl, so AQE picks the strategy (the
    dedup_survivors lesson, VERDICT r2 #1)."""
    d = t(spark, sf, "documents")
    url = F.concat(
        F.lit("https://h"),
        (F.col("doc_id") % 53).cast("string"),
        F.lit(".example.org/p/"),
        F.col("doc_id").cast("string"),
    )
    u = d.select(
        "doc_id",
        "n_chars",
        F.regexp_extract(url, _HOST_RE, 1).alias("host"),
    )
    h = u.groupBy("host").agg(
        F.sum("n_chars").cast("long").alias("h_sum"),
        F.count(F.lit(1)).cast("long").alias("h_n"),
    )
    g = u.agg(
        F.sum("n_chars").cast("long").alias("g_sum"),
        F.count(F.lit(1)).cast("long").alias("g_n"),
    )
    derived = (
        h.crossJoin(F.broadcast(g))
        .filter(F.col("h_sum") * F.col("g_n") < F.col("g_sum") * F.col("h_n"))
        .select("host")
    )
    literal = spark.createDataFrame(
        [(x,) for x in _BL_LITERAL_HOSTS], ["host"]
    )
    bl = derived.unionByName(literal).distinct()
    return u.select("doc_id", "host").join(bl, "host", "left_anti").select(
        "doc_id", "host"
    )


# ---------------------------------------------------------------------------
# inverted-index posting-list build
# ---------------------------------------------------------------------------
_POSTINGS_K = 3


@q(
    "index_postings",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tk FROM documents),
    tf AS (SELECT tk, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
           FROM tok GROUP BY tk, doc_id),
    dfc AS (SELECT tk, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tk),
    ranked AS (
      SELECT tk, doc_id, tf,
             ROW_NUMBER() OVER (PARTITION BY tk
                                ORDER BY tf DESC, doc_id) AS r
      FROM tf)
    SELECT ranked.tk, dfc.df,
           string_agg(ranked.doc_id || ':' || ranked.tf, ','
                      ORDER BY ranked.tf DESC, ranked.doc_id) AS postings
    FROM ranked JOIN dfc ON dfc.tk = ranked.tk
    WHERE ranked.r <= {_POSTINGS_K}
    GROUP BY ranked.tk, dfc.df
    """,
)
def index_postings(spark, sf):
    """Inverted-index posting-list materialization — the search-index
    build step (token -> df + the top-k (doc, tf) postings serialized
    in impact order), the artifact behind bm25_search's runtime side.
    The per-token top-k is a grouped window (Spark plans
    WindowGroupLimit: per-partition top-k before the shuffle, no
    global sort), df is counted BEFORE truncation so scores stay
    exact, and the final list is assembled by sorting a bounded
    k-element array inside the row — (tf DESC, doc_id) is a total
    order, so the serialized string is engine-identical. Scale shape:
    everything shuffles by token hash and each downstream relation is
    vocabulary-sized, never corpus-sized; the window and the two aggs
    share the token key so the exchanges line up, and a df-cap on
    stop-like hot tokens (the jaccard pattern) bounds the window's
    widest group at web scale."""
    d = t(spark, sf, "documents")
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tk"))
        .groupBy("tk", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dfc = tf.groupBy("tk").agg(F.count(F.lit(1)).cast("long").alias("df"))
    w = Window.partitionBy("tk").orderBy(F.desc("tf"), "doc_id")
    top = tf.withColumn("r", F.row_number().over(w)).filter(
        F.col("r") <= _POSTINGS_K
    )
    posting = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct((-F.col("tf")).alias("neg"), "doc_id", "tf"))
            ),
            lambda x: F.concat_ws(":", x.doc_id.cast("string"), x.tf.cast("string")),
        ),
        ",",
    )
    return (
        top.groupBy("tk")
        .agg(posting.alias("postings"))
        .join(dfc, "tk")
        .select("tk", "df", "postings")
    )


# ---------------------------------------------------------------------------
# snapshot diff: what changed between two crawl states
# ---------------------------------------------------------------------------
@q(
    "snapshot_diff",
    """
    WITH a AS (
      SELECT user_id, event_type, event_id AS eid FROM events
      WHERE ts < TIMESTAMP '2024-01-21'
      QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                 ORDER BY ts DESC, event_id DESC) = 1),
    b AS (
      SELECT user_id, event_type, event_id AS eid FROM events
      WHERE ts >= TIMESTAMP '2024-01-11'
      QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                 ORDER BY ts DESC, event_id DESC) = 1)
    SELECT COALESCE(a.user_id, b.user_id) AS user_id,
           COALESCE(a.event_type, b.event_type) AS event_type,
           CASE WHEN a.user_id IS NULL THEN 'added'
                WHEN b.user_id IS NULL THEN 'removed'
                WHEN a.eid = b.eid THEN 'same'
                ELSE 'changed' END AS status
    FROM a FULL JOIN b
      ON a.user_id = b.user_id AND a.event_type = b.event_type
    """,
)
def snapshot_diff(spark, sf):
    """Snapshot comparison — the change-data report between two crawl
    states (yesterday's compacted snapshot vs today's): per key,
    added / removed / changed / same. The two states are the events
    log compacted over two overlapping time windows (each via the
    crawl_latest max_by shape — map-side combinable, no window sort),
    then ONE full-outer join on the key. This is the read-only dual
    of crawl_upsert (which merges the delta in; this reports what the
    merge would do) — the audit every periodically-refreshed KG store
    publishes alongside a new snapshot. Scale shape: both compactions
    shuffle ~|keys| rows, the diff join is key-partitioned; nothing
    corpus-sized survives past the map side."""
    e = t(spark, sf, "events")

    def compact(df):
        ordk = F.struct(F.col("ts"), F.col("event_id"))
        return (
            df.groupBy("user_id", "event_type")
            .agg(F.max_by(F.col("event_id"), ordk).alias("eid"))
        )

    a = compact(e.filter(F.col("ts") < F.lit("2024-01-21").cast("timestamp")))
    b = compact(e.filter(F.col("ts") >= F.lit("2024-01-11").cast("timestamp")))
    j = a.alias("a").join(
        b.alias("b"),
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.event_type") == F.col("b.event_type")),
        "full_outer",
    )
    return j.select(
        F.coalesce("a.user_id", "b.user_id").alias("user_id"),
        F.coalesce("a.event_type", "b.event_type").alias("event_type"),
        F.when(F.col("a.user_id").isNull(), "added")
        .when(F.col("b.user_id").isNull(), "removed")
        .when(F.col("a.eid") == F.col("b.eid"), "same")
        .otherwise("changed")
        .alias("status"),
    )


@q(
    "stream_upsert",
    f"""
    WITH base_log AS (SELECT * FROM events WHERE event_id % 10 < 8),
    delta_log AS (SELECT * FROM events WHERE event_id % 10 >= 8),
    base AS ({_UPSERT_COMPACT.format(src="base_log")}),
    delta AS ({_UPSERT_COMPACT.format(src="delta_log")})
    SELECT b.user_id, b.event_id, b.ts, b.event_type
    FROM base b LEFT JOIN delta d ON b.user_id = d.user_id
    WHERE d.user_id IS NULL
    UNION ALL
    SELECT user_id, event_id, ts, event_type FROM delta
    WHERE event_type <> 'error'
    """,
)
def stream_upsert(spark, sf):
    """STREAMING incremental MERGE on the oracle gate: the same
    changelog delta as crawl_upsert, but arriving as a file-source
    STREAM one parquet file per trigger, folded into a compacted
    upsert state by ``foreachBatch`` (streaming/upsert_stream.py) —
    the continuously-refreshed-store shape (trigger(availableNow)
    here; a real deployment just changes the trigger). Latest-per-key
    compaction is associative over chunking, so the final state is
    independent of the micro-batch split and the DuckDB twin is
    crawl_upsert's batch SQL verbatim — the strongest cross-check a
    stateful streaming face can get. Tombstones stay IN the state as
    markers between epochs and are dropped only at final projection.
    The final relation is parquet-checkpointed before the temp delta
    spool is reclaimed."""
    import os
    import tempfile

    from ..operators.dedup import parquet_checkpoint
    from ..streaming.upsert_stream import compact_latest, run_upsert_stream

    e = t(spark, sf, "events").select("user_id", "event_id", "ts", "event_type")
    base = compact_latest(e.filter(F.col("event_id") % 10 < 8))
    delta_log = e.filter(F.col("event_id") % 10 >= 8)
    with tempfile.TemporaryDirectory(prefix="stream_upsert_") as tmp:
        delta_dir = os.path.join(tmp, "delta")
        delta_log.repartition(3).write.parquet(delta_dir)
        state = run_upsert_stream(
            spark,
            delta_dir,
            delta_log.schema,
            os.path.join(tmp, "state"),
            os.path.join(tmp, "ckpt"),
        )
        return parquet_checkpoint(state.merged(base), "stream_upsert_final")


# ---------------------------------------------------------------------------
# first BPE merge candidates — tokenizer training, step one
# ---------------------------------------------------------------------------
@q(
    "text_bpe_merge",
    """
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS tk FROM documents),
    w AS (SELECT tk FROM tok WHERE length(tk) >= 2),
    pairs AS (
      SELECT substr(tk, CAST(i AS INT), 2) AS pair
      FROM w, unnest(generate_series(1, length(tk) - 1)) AS t(i)),
    cnt AS (SELECT pair, CAST(COUNT(*) AS BIGINT) AS c
            FROM pairs GROUP BY pair)
    SELECT pair, c,
           CAST(ROW_NUMBER() OVER (ORDER BY c DESC, pair) AS INT) AS rnk
    FROM cnt QUALIFY rnk <= 20
    """,
)
def text_bpe_merge(spark, sf):
    """First BPE-merge candidates: the top-20 most frequent ADJACENT
    character pairs within whitespace tokens, weighted by occurrence
    — exactly the statistic byte-pair-encoding tokenizer training
    computes (and re-computes per merge round) over the full corpus;
    at 100 TB this one map-side agg IS the tokenizer-training inner
    loop, so its shape matters: a bounded per-token fan-out
    (length-1 positions via explode(sequence), never a self-join),
    one map-side-combinable pair count (pair-vocab-sized shuffle,
    never corpus-sized), then TakeOrderedAndProject top-20 — the
    token_topk discipline. The length >= 2 pre-filter both drops
    pairless tokens AND keeps Spark's sequence() total (sequence(1,0)
    would generate a DESCENDING [1,0], not an empty array — a
    silent-wrong-rows hazard, not just waste). Ties break on pair
    text; both engines compare strings by UTF-8 binary order and
    substr/length count CHARACTERS, so multibyte corpora agree."""
    d = t(spark, sf, "documents")
    tok = d.select(F.explode(F.split("text", " ")).alias("tk")).filter(
        F.length("tk") >= 2
    )
    pairs = tok.select(
        "tk",
        F.explode(
            F.sequence(F.lit(1), F.length("tk") - 1)
        ).alias("i"),
    ).select(F.col("tk").substr(F.col("i"), F.lit(2)).alias("pair"))
    cnt = pairs.groupBy("pair").agg(F.count(F.lit(1)).cast("long").alias("c"))
    top = cnt.orderBy(F.desc("c"), "pair").limit(20)
    win = Window.orderBy(F.desc("c"), "pair")
    return top.select(
        "pair", "c", F.row_number().over(win).cast("int").alias("rnk")
    )


# ---------------------------------------------------------------------------
# per-source Jensen-Shannon divergence vs the rest of the corpus
# ---------------------------------------------------------------------------
@q(
    "text_jsd",
    """
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS tk
      FROM documents WHERE text IS NOT NULL),
    st AS (
      SELECT source, tk, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok GROUP BY source, tk),
    ctw AS (
      SELECT source, tk, c, SUM(c) OVER (PARTITION BY tk) AS ct
      FROM st),
    srct AS (
      SELECT source, ns, SUM(ns) OVER () AS nt FROM (
        SELECT source, CAST(SUM(c) AS BIGINT) AS ns
        FROM st GROUP BY source) s),
    terms AS (
      SELECT w.source, w.c, w.ct - w.c AS cr, s.ns, s.nt - s.ns AS nr,
             CAST(w.c AS DOUBLE) / s.ns AS pd,
             CASE WHEN s.nt - s.ns = 0 THEN CAST(0 AS DOUBLE)
                  ELSE CAST(w.ct - w.c AS DOUBLE) / (s.nt - s.ns) END AS qd
      FROM ctw w JOIN srct s ON s.source = w.source),
    quant AS (
      SELECT source, ns, nr, cr,
             CAST(round(1000000.0
                        * (pd * ln(2.0 * pd / (pd + qd)))) AS BIGINT)
               AS tp_micros,
             CASE WHEN cr = 0 THEN CAST(0 AS BIGINT)
                  ELSE CAST(round(1000000.0
                            * (qd * ln(2.0 * qd / (pd + qd)))) AS BIGINT)
             END AS tq_micros
      FROM terms),
    agg AS (
      SELECT source, MAX(ns) AS ns, MAX(nr) AS nr,
             CAST(SUM(cr) AS BIGINT) AS s_cr,
             CAST(SUM(tp_micros) AS BIGINT) AS sum_tp,
             CAST(SUM(tq_micros) AS BIGINT) AS sum_tq
      FROM quant GROUP BY source)
    SELECT source, CAST(ns AS BIGINT) AS n_tokens,
           CASE WHEN nr = 0 THEN NULL
                ELSE round((sum_tp + sum_tq
                            + CAST(round(1000000.0 * ln(2.0)
                                   * (CAST(nr - s_cr AS DOUBLE) / nr))
                              AS BIGINT))
                           / 2000000.0, 6) + 0
           END AS jsd
    FROM agg
    """,
)
def text_jsd(spark, sf):
    """Domain divergence for corpus mixing: per source s, the
    Jensen-Shannon divergence between s's unigram distribution P and
    the REST-of-corpus distribution Q — the signal behind mixture
    reweighting (DoReMi-style) and 'is this crawl slice
    distributionally novel' triage; JSD over KL because it is finite
    even where supports differ (new-domain vocabulary). Decomposition
    that avoids the |S|x|V| cross join: rows exist only for tokens
    PRESENT in s; for the Q-half, every token absent from s
    contributes qd*ln2 (pd = 0 in the limit), which sums in CLOSED
    FORM to ln2 * (nr - SUM(ct - c)) / nr — one correction term per
    source, no fan-out. Per-term values are quantized to integer
    MICROS before summing (the kg_adamic_adar order-independence
    discipline; pd/qd/arg evaluated in identical float order both
    engines), so the per-source sums are exact BIGINT aggs. Scale
    shape: corpus → ONE (source, token) count (map-side combinable),
    parquet-checkpointed because two downstream branches consume it
    (the events_gapfill lesson — re-aggregation would re-tokenize
    the corpus per branch); corpus token totals ride a
    PARTITION-BY-token window (vocab-HASH-partitioned, never a
    single-partition sort); source totals collapse to the |S|-sized
    relation where the one OVER () window is over #sources rows,
    then attach by broadcast (sources are registry-bounded — the
    mix_domains precedent). The single-source corpus (nr = 0) is an
    ANSI DIVIDE_BY_ZERO hazard → NULL on both engines."""
    from ..operators.dedup import parquet_checkpoint

    d = t(spark, sf, "documents").filter(F.col("text").isNotNull())
    tok = d.select("source", F.explode(F.split("text", " ")).alias("tk"))
    st = parquet_checkpoint(
        tok.groupBy("source", "tk").agg(
            F.count(F.lit(1)).cast("long").alias("c")
        ),
        "jsd_st",
    )
    ctw = st.select(
        "source",
        "c",
        F.sum("c").over(Window.partitionBy("tk")).alias("ct"),
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    srct = (
        st.groupBy("source")
        .agg(F.sum("c").cast("long").alias("ns"))
        .withColumn("nt", F.sum("ns").over(wall))
    )
    terms = ctw.join(F.broadcast(srct), "source").select(
        "source",
        "c",
        (F.col("ct") - F.col("c")).alias("cr"),
        "ns",
        (F.col("nt") - F.col("ns")).alias("nr"),
        (F.col("c").cast("double") / F.col("ns")).alias("pd"),
        F.when((F.col("nt") - F.col("ns")) == 0, F.lit(0.0))
        .otherwise(
            (F.col("ct") - F.col("c")).cast("double")
            / (F.col("nt") - F.col("ns"))
        )
        .alias("qd"),
    )
    tp = F.round(
        F.lit(1000000.0)
        * (
            F.col("pd")
            * F.log(F.lit(2.0) * F.col("pd") / (F.col("pd") + F.col("qd")))
        )
    ).cast("long")
    tq = F.when(F.col("cr") == 0, F.lit(0).cast("long")).otherwise(
        F.round(
            F.lit(1000000.0)
            * (
                F.col("qd")
                * F.log(
                    F.lit(2.0) * F.col("qd") / (F.col("pd") + F.col("qd"))
                )
            )
        ).cast("long")
    )
    quant = terms.select(
        "source",
        "ns",
        "nr",
        "cr",
        tp.alias("tp_micros"),
        tq.alias("tq_micros"),
    )
    agg = quant.groupBy("source").agg(
        F.max("ns").alias("ns"),
        F.max("nr").alias("nr"),
        F.sum("cr").cast("long").alias("s_cr"),
        F.sum("tp_micros").cast("long").alias("sum_tp"),
        F.sum("tq_micros").cast("long").alias("sum_tq"),
    )
    corr = F.round(
        F.lit(1000000.0)
        * F.log(F.lit(2.0))
        * ((F.col("nr") - F.col("s_cr")).cast("double") / F.col("nr"))
    ).cast("long")
    return agg.select(
        "source",
        F.col("ns").cast("long").alias("n_tokens"),
        F.when(F.col("nr") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                (F.col("sum_tp") + F.col("sum_tq") + corr) / F.lit(2000000.0),
                6,
            )
            + F.lit(0.0)
        )
        .alias("jsd"),
    )


# ---------------------------------------------------------------------------
# tokenizer fertility report — chars per token, per language
# ---------------------------------------------------------------------------
@q(
    "text_fertility",
    """
    WITH d AS (
      SELECT lang, COALESCE(n_chars, 0) AS n_chars,
             len(string_split(COALESCE(text, ''), ' ')) AS n_tokens
      FROM documents)
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CASE WHEN SUM(n_tokens) = 0 THEN NULL
                ELSE round(CAST(SUM(n_chars) AS DOUBLE) / SUM(n_tokens), 6)
                     + 0
           END AS chars_per_token,
           round(CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*), 6) + 0
             AS tokens_per_doc
    FROM d GROUP BY lang
    """,
)
def text_fertility(spark, sf):
    """Tokenizer fertility report per language: documents, characters,
    whitespace tokens, chars/token and tokens/doc — the first number
    a tokenizer evaluation reads (a language whose chars-per-token
    ratio is far from the corpus mean is being over- or
    under-segmented, which skews both the token budget and the
    effective mixing weights of mix_domains). Map-only derivation +
    one map-side-combinable agg; exact integer sums, two round-6
    ratios in identical order, zero-token NULL guard. text is
    COALESCEd to '' before splitting — Spark's size(split(NULL)) is
    -1 where DuckDB's len is NULL (the text_readability hazard), and
    '' splits to [''] (one token) identically on both engines."""
    d = t(spark, sf, "documents").select(
        "lang",
        F.coalesce("n_chars", F.lit(0)).alias("n_chars"),
        F.size(F.split(F.coalesce("text", F.lit("")), " ")).alias("n_tokens"),
    )
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("n_chars"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.when(F.sum("n_tokens") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.sum("n_chars").cast("double") / F.sum("n_tokens"), 6
            )
            + F.lit(0.0)
        )
        .alias("chars_per_token"),
        (
            F.round(
                F.sum("n_tokens").cast("double") / F.count(F.lit(1)), 6
            )
            + F.lit(0.0)
        ).alias("tokens_per_doc"),
    )


# ---------------------------------------------------------------------------
# Simpson diversity — count-of-counts closed form, never ranks the vocab
# ---------------------------------------------------------------------------
@q(
    "text_simpson",
    """
    WITH tok AS (
      SELECT lang, unnest(string_split(text, ' ')) AS tk
      FROM documents),
    tc AS (
      SELECT lang, tk, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok WHERE tk <> '' GROUP BY lang, tk),
    agg AS (
      SELECT lang,
             CAST(SUM(c) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS vocab,
             CAST(SUM(c * (c - 1)) AS BIGINT) AS rep2
      FROM tc GROUP BY lang)
    SELECT lang, n_tokens, vocab,
           CASE WHEN n_tokens < 2 THEN NULL
                ELSE round(rep2 / (1.0 * n_tokens * (n_tokens - 1)), 6)
                     + 0 END AS simpson,
           CASE WHEN n_tokens < 2 OR rep2 = 0 THEN NULL
                ELSE round(1.0 * n_tokens * (n_tokens - 1) / rep2, 6)
                     + 0 END AS eff_vocab
    FROM agg
    """,
)
def text_simpson(spark, sf):
    """Per-language Simpson concentration λ = Σ c(c−1) / (N(N−1))
    (the probability two tokens drawn without replacement coincide)
    and its inverse — the "effective vocabulary size" that a
    repetition-heavy crawl shrinks long before the raw vocab count
    moves. Completes the lexical-diversity triptych: source_lang_
    stats measures entropy (log scale), text_heaps measures vocab
    GROWTH, Simpson measures concentration — the three disagree on
    exactly the skewed corpora a data mixer needs to catch. Pure
    count-of-counts arithmetic (the stat_gini discipline): one
    corpus scan to (lang, token, c), per-language Σ c(c−1) is an
    exact map-side-combinable BIGINT — the vocabulary is NEVER
    ranked or sorted, and there is no second corpus branch. Both
    outputs are one guarded round-6 division (N < 2 and the
    all-distinct rep2 = 0 corpus short-circuit to NULL — ANSI
    DIVIDE_BY_ZERO on the inverse). Headroom: Σ c(c−1) < N² — exact
    past 10⁹ tokens per language."""
    d = t(spark, sf, "documents")
    tok = d.select(
        "lang", F.explode(F.split("text", " ")).alias("tk")
    ).filter(F.col("tk") != "")
    tc = tok.groupBy("lang", "tk").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    agg = tc.groupBy("lang").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("long").alias("rep2"),
    )
    nt = F.col("n_tokens")
    return agg.select(
        "lang",
        "n_tokens",
        "vocab",
        F.when(nt < 2, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.col("rep2") / (F.lit(1.0) * nt * (nt - 1)), 6
            )
            + F.lit(0.0)
        )
        .alias("simpson"),
        F.when((nt < 2) | (F.col("rep2") == 0), F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.lit(1.0) * nt * (nt - 1) / F.col("rep2"), 6
            )
            + F.lit(0.0)
        )
        .alias("eff_vocab"),
    )


# ---------------------------------------------------------------------------
# TextRank keywords — 2 damped PageRank rounds on the adjacency graph
# ---------------------------------------------------------------------------
@q(
    "text_textrank",
    """
    WITH arrs AS (
      SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
    idx AS (
      SELECT doc_id, arr, generate_subscripts(arr, 1) AS pos FROM arrs),
    tok AS (
      SELECT doc_id, arr[pos] AS tk, pos FROM idx WHERE arr[pos] <> ''),
    adj AS (
      SELECT lag(tk) OVER (PARTITION BY doc_id ORDER BY pos) AS a,
             tk AS b
      FROM tok),
    pairs AS (
      SELECT a, b FROM adj WHERE a IS NOT NULL AND a <> b),
    ed AS (
      SELECT u, v, CAST(COUNT(*) AS BIGINT) AS w FROM (
        SELECT a AS u, b AS v FROM pairs
        UNION ALL
        SELECT b AS u, a AS v FROM pairs)
      GROUP BY u, v),
    od AS (
      SELECT u, v, w, SUM(w) OVER (PARTITION BY u) AS wd FROM ed),
    p1 AS (
      SELECT v,
             150000 + CAST(SUM(CAST(round(850000.0 * w / wd) AS BIGINT))
                           AS BIGINT) AS pr
      FROM od GROUP BY v),
    p2 AS (
      SELECT od.v,
             150000 + CAST(SUM(CAST(round(0.85 * p1.pr * od.w / od.wd)
                                    AS BIGINT)) AS BIGINT) AS pr
      FROM od JOIN p1 ON p1.v = od.u GROUP BY od.v)
    SELECT v AS word, CAST(pr AS BIGINT) AS pr_micros,
           round(pr / 1000000.0, 6) + 0 AS textrank
    FROM p2 ORDER BY pr DESC, v LIMIT 20
    """,
)
def text_textrank(spark, sf):
    """TextRank keyword extraction (Mihalcea & Tarau): two damped
    PageRank rounds (d = 0.85, pr₀ = 1) over the token-adjacency
    graph — the graph-centrality complement to doc_tfidf_topterms'
    frequency keywords (TextRank promotes tokens that GLUE contexts
    together, not merely frequent ones). The graph is built ONCE
    from a per-doc LAG over token positions (adjacent non-empty
    tokens, self-loops dropped), symmetrized by a two-way unpivot,
    and parquet-checkpointed WITH its weighted-degree window —
    round 1, round 2, and the final ranking all consume that
    bounded edge relation, never re-tokenizing the corpus. Float
    discipline is events_markov's: every damped contribution
    0.85·pr(u)·w/wd_u is quantized to integer MICROS per term, so
    both rounds are exact order-independent BIGINT sums and the
    top-20 cut (pr DESC, word tie-break) is engine-stable.
    TakeOrderedAndProject keeps the ranking a per-partition heap
    merge — the vocabulary-sized rank relation is never globally
    sorted."""
    from ..operators.dedup import parquet_checkpoint

    d = t(spark, sf, "documents")
    tok = d.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "tk"),
    ).filter(F.col("tk") != "")
    wseq = Window.partitionBy("doc_id").orderBy("pos")
    adj = tok.select(F.lag("tk").over(wseq).alias("a"), F.col("tk").alias("b"))
    pairs = adj.filter(
        F.col("a").isNotNull() & (F.col("a") != F.col("b"))
    )
    ed = (
        pairs.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionAll(pairs.select(F.col("b").alias("u"), F.col("a").alias("v")))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    od = parquet_checkpoint(
        ed.select(
            "u", "v", "w",
            F.sum("w").over(Window.partitionBy("u")).alias("wd"),
        ),
        "textrank_od",
    )
    p1 = od.groupBy("v").agg(
        (
            F.lit(150000)
            + F.sum(
                F.round(F.lit(850000.0) * F.col("w") / F.col("wd")).cast(
                    "long"
                )
            )
        )
        .cast("long")
        .alias("pr")
    )
    p2 = (
        od.join(p1.withColumnRenamed("v", "u"), "u")
        .groupBy("v")
        .agg(
            (
                F.lit(150000)
                + F.sum(
                    F.round(
                        F.lit(0.85) * F.col("pr") * F.col("w") / F.col("wd")
                    ).cast("long")
                )
            )
            .cast("long")
            .alias("pr")
        )
    )
    return (
        p2.orderBy(F.desc("pr"), "v")
        .limit(20)
        .select(
            F.col("v").alias("word"),
            F.col("pr").cast("long").alias("pr_micros"),
            (F.round(F.col("pr") / F.lit(1000000.0), 6) + F.lit(0.0)).alias(
                "textrank"
            ),
        )
    )


# ---------------------------------------------------------------------------
# unicode-script census — does the text match its language tag?
# ---------------------------------------------------------------------------
@q(
    "text_script_mix",
    r"""
    WITH m AS (
      SELECT lang,
             len(text) AS n_chars,
             len(regexp_extract_all(text, '[A-Za-z]')) AS latin,
             len(regexp_extract_all(text, '\p{Han}')) AS han,
             len(regexp_extract_all(text, '\p{Cyrillic}')) AS cyr,
             len(regexp_extract_all(text, '[0-9]')) AS digit
      FROM documents WHERE text IS NOT NULL)
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS chars,
           CAST(SUM(latin) AS BIGINT) AS latin,
           CAST(SUM(han) AS BIGINT) AS han,
           CAST(SUM(cyr) AS BIGINT) AS cyr,
           CAST(SUM(digit) AS BIGINT) AS digits,
           CASE WHEN SUM(n_chars) = 0 THEN NULL
                ELSE round(SUM(han + cyr) * 1.0 / SUM(n_chars), 6) + 0
           END AS non_latin_share
    FROM m GROUP BY lang
    """,
)
def text_script_mix(spark, sf):
    """Unicode-SCRIPT census per language tag: Latin / Han /
    Cyrillic / digit character counts and the non-Latin share — the
    mislabel detector one level below text_langid (langid guesses a
    language from n-grams; the script census catches the grosser
    and more common corpus rot: a `zh` shard full of Latin
    boilerplate, mojibake, or HTML entities — script mismatch is
    the cheapest high-precision signal and needs no model). Pure
    map-only JVM regex counting (Java `\\p{IsHan}` == RE2
    `\\p{Han}` — the dialect pair is pinned by the twin, the same
    discipline as feat_hashing's hex casts), one
    map-side-combinable agg to a |langs|-sized relation, zero UDFs;
    at 100 TB this is a single corpus pass that rides whole-stage
    codegen."""
    d = t(spark, sf, "documents").filter(F.col("text").isNotNull())
    m = d.select(
        "lang",
        F.length("text").alias("n_chars"),
        F.expr("regexp_count(text, '[A-Za-z]')").alias("latin"),
        F.expr(r"regexp_count(text, '\\p{IsHan}')").alias("han"),
        F.expr(r"regexp_count(text, '\\p{IsCyrillic}')").alias("cyr"),
        F.expr("regexp_count(text, '[0-9]')").alias("digit"),
    )
    return m.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("chars"),
        F.sum("latin").cast("long").alias("latin"),
        F.sum("han").cast("long").alias("han"),
        F.sum("cyr").cast("long").alias("cyr"),
        F.sum("digit").cast("long").alias("digits"),
        F.when(F.sum("n_chars") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.sum(F.col("han") + F.col("cyr"))
                * F.lit(1.0)
                / F.sum("n_chars"),
                6,
            )
            + F.lit(0.0)
        )
        .alias("non_latin_share"),
    )


# ---------------------------------------------------------------------------
# crawl politeness schedule — per-host rate budget and makespan
# ---------------------------------------------------------------------------
_CRAWL_RATE = 5  # fetches per host per tick


@q(
    "crawl_schedule",
    f"""
    WITH u AS (
      SELECT 'h' || CAST(doc_id % 53 AS VARCHAR) AS host FROM documents),
    h AS (
      SELECT host, CAST(COUNT(*) AS BIGINT) AS n_docs FROM u GROUP BY host),
    s AS (
      SELECT host, n_docs,
             (n_docs + {_CRAWL_RATE - 1}) // {_CRAWL_RATE} AS ticks
      FROM h)
    SELECT host, n_docs, CAST(ticks AS BIGINT) AS ticks,
           round(n_docs * 1.0 / ({_CRAWL_RATE} * ticks), 6) + 0
             AS utilization,
           ticks = MAX(ticks) OVER () AS is_critical
    FROM s
    """,
)
def crawl_schedule(spark, sf):
    """Crawl politeness schedule: with a budget of {rate} fetches
    per host per tick, how many ticks does each host's backlog
    need, how full are its tick slots, and which hosts sit on the
    critical path (ticks == makespan) — the planning report a
    recrawl runs BEFORE dispatching (host_stats measures what was
    crawled; this face budgets what's next — the makespan hosts are
    where politeness, not bandwidth, bounds the crawl, and the
    fix is raising their per-host rate agreement, not adding
    workers). Hosts derive from the same deterministic doc_id%53
    synthesis as host_stats. ceil division is the all-integer
    (n + r - 1) div r on both engines; utilization is one float
    division; the makespan is a frameless window over the
    |hosts|-sized relation (never a second aggregation branch).
    One map-side-combinable agg from the corpus — the report is
    host-bounded at any scale."""
    d = t(spark, sf, "documents")
    h = d.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 53).cast("string")).alias(
            "host"
        )
    ).groupBy("host").agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    r = _CRAWL_RATE
    s = h.select(
        "host",
        "n_docs",
        F.expr(f"(n_docs + {r - 1}) div {r}").alias("ticks"),
    )
    wall = Window.partitionBy()
    return s.select(
        "host",
        "n_docs",
        F.col("ticks").cast("long").alias("ticks"),
        (
            F.round(F.col("n_docs") * F.lit(1.0) / (r * F.col("ticks")), 6)
            + F.lit(0.0)
        ).alias("utilization"),
        (F.col("ticks") == F.max("ticks").over(wall)).alias("is_critical"),
    )


# ---------------------------------------------------------------------------
# largest-remainder stratified allocation — exact budget apportionment
# ---------------------------------------------------------------------------
_ALLOC_BUDGET = 1000


@q(
    "sample_allocate",
    f"""
    WITH h AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents
      GROUP BY lang),
    w AS (
      SELECT lang, n, SUM(n) OVER () AS tot,
             ({_ALLOC_BUDGET} * n) // SUM(n) OVER () AS base,
             ({_ALLOC_BUDGET} * n) % SUM(n) OVER () AS rem
      FROM h),
    r AS (
      SELECT lang, n, tot, base, rem,
             ROW_NUMBER() OVER (ORDER BY rem DESC, lang) AS rk,
             {_ALLOC_BUDGET} - SUM(base) OVER () AS leftover
      FROM w)
    SELECT lang, n, CAST(base AS BIGINT) AS base_quota,
           CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS quota,
           rk <= leftover AS got_remainder
    FROM r
    """,
)
def sample_allocate(spark, sf):
    """Largest-remainder apportionment of a fixed sample budget of
    {B} documents across language strata — the EXACT allocation
    step in front of sample_stratified (which samples a RATE;
    a labeling or eval budget is a COUNT, and naive rounding of
    B*n_g/N under- or over-shoots the total — Hamilton's method
    fixes the sum by handing the leftover units to the largest
    fractional remainders, deterministically tie-broken by lang).
    All-integer: base = (B*n) div N and the remainder (B*n) mod N
    are exact; the leftover B - sum(base) is a frameless window
    over the |strata|-sized relation; the remainder ranking is one
    ROW_NUMBER. The invariant the test pins: sum(quota) == B
    exactly, and every quota is within 1 of the real-valued
    proportional share."""
    h = t(spark, sf, "documents").groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    b = _ALLOC_BUDGET
    wall = Window.partitionBy()
    w = h.select(
        "lang",
        "n",
        F.sum("n").over(wall).alias("tot"),
        F.expr(f"({b} * n) div (SUM(n) OVER ())").alias("base"),
        (F.lit(b) * F.col("n") % F.sum("n").over(wall)).alias("rem"),
    )
    r = w.select(
        "lang",
        "n",
        "base",
        F.row_number()
        .over(Window.orderBy(F.desc("rem"), "lang"))
        .alias("rk"),
        (F.lit(b) - F.sum("base").over(wall)).alias("leftover"),
    )
    return r.select(
        "lang",
        "n",
        F.col("base").cast("long").alias("base_quota"),
        (
            F.col("base")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("long")
        .alias("quota"),
        (F.col("rk") <= F.col("leftover")).alias("got_remainder"),
    )


# ---------------------------------------------------------------------------
# cross-shard vocabulary overlap — pairwise Jaccard of token sets
# ---------------------------------------------------------------------------
@q(
    "text_vocab_overlap",
    """
    WITH tok AS (
      SELECT DISTINCT lang, unnest(string_split(text, ' ')) AS w
      FROM documents WHERE text IS NOT NULL),
    v AS (SELECT lang, w FROM tok WHERE w <> ''),
    sz AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS nv FROM v
           GROUP BY lang),
    inter AS (
      SELECT a.lang AS lang_a, b.lang AS lang_b,
             CAST(COUNT(*) AS BIGINT) AS n_common
      FROM v a JOIN v b ON a.w = b.w AND a.lang < b.lang
      GROUP BY 1, 2)
    SELECT i.lang_a, i.lang_b, i.n_common,
           sa.nv AS nv_a, sb.nv AS nv_b,
           round(i.n_common * 1.0
                 / (sa.nv + sb.nv - i.n_common), 6) + 0 AS jaccard
    FROM inter i
    JOIN sz sa ON sa.lang = i.lang_a
    JOIN sz sb ON sb.lang = i.lang_b
    """,
)
def text_vocab_overlap(spark, sf):
    """Pairwise vocabulary Jaccard between language shards — the
    cross-corpus contamination probe at the SHARD level
    (decontaminate catches document-level leaks against an eval
    set; this face catches shard-level rot: two "different
    language" shards sharing half their vocabulary are either
    mislabeled, boilerplate-dominated, or the same crawl ingested
    twice — and the mix_domains temperatures computed from them
    are then wrong). The corpus collapses ONCE to the distinct
    (lang, token) relation (vocab-bounded per shard); the
    intersection is one self-equi-join on the token (never a
    cross join — the join key is the word), sizes come from the
    same relation, and Jaccard is one guarded float division of
    exact counts. Denominator can't be zero: an inter row exists
    only if both shards have at least the common token. At web
    scale the token join takes the df-cap discipline
    (stopword-frequency tokens dominate pairs; the fixture is
    cap-free so the face stays exact)."""
    v = (
        t(spark, sf, "documents")
        .filter(F.col("text").isNotNull())
        .select("lang", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .distinct()
    )
    sz = v.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("nv"))
    a = v.select(F.col("lang").alias("lang_a"), "w")
    b = v.select(F.col("lang").alias("lang_b"), "w")
    inter = (
        a.join(b, "w")
        .filter(F.col("lang_a") < F.col("lang_b"))
        .groupBy("lang_a", "lang_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    sa = sz.select(F.col("lang").alias("lang_a"), F.col("nv").alias("nv_a"))
    sb = sz.select(F.col("lang").alias("lang_b"), F.col("nv").alias("nv_b"))
    return (
        inter.join(sa, "lang_a")
        .join(sb, "lang_b")
        .select(
            "lang_a",
            "lang_b",
            "n_common",
            "nv_a",
            "nv_b",
            (
                F.round(
                    F.col("n_common")
                    * F.lit(1.0)
                    / (F.col("nv_a") + F.col("nv_b") - F.col("n_common")),
                    6,
                )
                + F.lit(0.0)
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Burrows' Delta — stylometric distance between sources
# ---------------------------------------------------------------------------
@q(
    "text_burrows_delta",
    """
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS w
      FROM documents WHERE text IS NOT NULL),
    tf AS (
      SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok WHERE w <> '' GROUP BY source, w),
    topw AS (
      SELECT w FROM (
        SELECT w, SUM(c) AS tot FROM tf GROUP BY w
        ORDER BY tot DESC, w LIMIT 30)),
    stot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n
             FROM tf GROUP BY source),
    rel AS (
      SELECT s.source, tw.w,
             COALESCE(tf.c, 0) * 1000000.0 / s.n AS f
      FROM stot s CROSS JOIN topw tw
      LEFT JOIN tf ON tf.source = s.source AND tf.w = tw.w),
    z AS (
      SELECT source, w,
             (f - AVG(f) OVER (PARTITION BY w))
               / NULLIF(stddev_samp(f) OVER (PARTITION BY w), 0) AS zf
      FROM rel),
    pairs AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(SUM(CAST(round(1000000.0 * ABS(a.zf - b.zf))
                           AS BIGINT)) AS BIGINT) AS d_us,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM z a JOIN z b ON a.w = b.w AND a.source < b.source
      WHERE a.zf IS NOT NULL AND b.zf IS NOT NULL
      GROUP BY 1, 2)
    SELECT src_a, src_b,
           round(d_us / 1000000.0 / k, 6) + 0 AS delta
    FROM pairs
    ORDER BY delta, src_a, src_b
    LIMIT 20
    """,
)
def text_burrows_delta(spark, sf):
    """Burrows' Delta between sources: mean |z-score difference| of
    the 30 most frequent tokens' relative frequencies — the
    stylometric distance authorship attribution runs on, and at
    corpus scale the SOURCE-forensics probe (two "independent"
    hosts with near-zero Delta are mirrors or one bot farm —
    text_vocab_overlap sees shared WORDS, Delta sees shared USAGE
    RATES of the words everyone shares, which is why it
    fingerprints style rather than topic). The corpus collapses
    once to the (source, token) tf relation; the top-30 function
    words come from a TakeOrderedAndProject over its token fold;
    relative frequencies land on a dense source x 30 grid (the
    LEFT JOIN's zero-fill is load-bearing — a source never using a
    word is signal, not a missing row); per-word z-scores are
    windows over the grid (30 x |sources| — bounded); and each
    pair's |dz| terms micros-quantize before the sum (exact
    order-independent agg). A zero-variance word (identical rate
    everywhere) drops via the NULLIF guard on BOTH engines. The
    float chain (f -> avg/stddev -> z) runs in identical op order;
    stddev_samp == Spark stddev."""
    tok = (
        t(spark, sf, "documents")
        .filter(F.col("text").isNotNull())
        .select("source", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
    )
    tf = tok.groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    from ..operators.dedup import parquet_checkpoint

    tf = parquet_checkpoint(tf, "burrows_tf")
    topw = (
        tf.groupBy("w")
        .agg(F.sum("c").alias("tot"))
        .orderBy(F.desc("tot"), "w")
        .limit(30)
        .select("w")
    )
    stot = tf.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    rel = (
        stot.crossJoin(topw)
        .join(tf, ["source", "w"], "left")
        .select(
            "source",
            "w",
            (
                F.coalesce(F.col("c"), F.lit(0))
                * F.lit(1000000.0)
                / F.col("n")
            ).alias("f"),
        )
    )
    ww = Window.partitionBy("w")
    z = rel.select(
        "source",
        "w",
        (
            (F.col("f") - F.avg("f").over(ww))
            / F.nullif(F.stddev_samp("f").over(ww), F.lit(0.0))
        ).alias("zf"),
    )
    a = z.select(
        F.col("source").alias("src_a"), "w", F.col("zf").alias("za")
    )
    b = z.select(
        F.col("source").alias("src_b"), "w", F.col("zf").alias("zb")
    )
    pairs = (
        a.join(b, "w")
        .filter(F.col("src_a") < F.col("src_b"))
        .filter(F.col("za").isNotNull() & F.col("zb").isNotNull())
        .groupBy("src_a", "src_b")
        .agg(
            F.sum(
                F.round(
                    F.lit(1000000.0) * F.abs(F.col("za") - F.col("zb"))
                ).cast("long")
            )
            .cast("long")
            .alias("d_us"),
            F.count(F.lit(1)).cast("long").alias("k"),
        )
    )
    return (
        pairs.select(
            "src_a",
            "src_b",
            (
                F.round(F.col("d_us") / F.lit(1000000.0) / F.col("k"), 6)
                + F.lit(0.0)
            ).alias("delta"),
        )
        .orderBy("delta", "src_a", "src_b")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# UTF-8 byte census — bytes-per-char drives storage and fertility
# ---------------------------------------------------------------------------
@q(
    "text_utf8_census",
    """
    WITH m AS (
      SELECT lang, len(text) AS chars,
             octet_length(encode(text)) AS bytes
      FROM documents WHERE text IS NOT NULL)
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(chars) AS BIGINT) AS chars,
           CAST(SUM(bytes) AS BIGINT) AS bytes,
           CAST(SUM(bytes - chars) AS BIGINT) AS extra_bytes,
           CASE WHEN SUM(chars) = 0 THEN NULL
                ELSE round(SUM(bytes) * 1.0 / SUM(chars), 6) + 0
           END AS bytes_per_char
    FROM m GROUP BY lang
    """,
)
def text_utf8_census(spark, sf):
    """UTF-8 byte census per language: codepoints vs encoded bytes
    and the bytes-per-char ratio — the cheap number three budgets
    hang off: storage (a zh corpus at 3 bytes/char is 3x the disk
    of its char count), tokenizer fertility (byte-fallback BPE
    spends tokens per BYTE, so bytes-per-char is a floor on
    tokens-per-char for unseen scripts — the text_fertility
    companion from the encoding side), and bandwidth planning.
    extra_bytes = bytes - chars counts exactly the multibyte
    continuation bytes (0 for pure ASCII — the fixture's Latin
    shards pin that identity, the zh shard would pin the 3x if it
    carried real Han text; cf. text_script_mix which flagged it).
    Map-only length arithmetic (Spark length() counts codepoints,
    octet_length counts bytes — same pair as DuckDB len/
    octet_length(encode())), one fold."""
    m = t(spark, sf, "documents").filter(F.col("text").isNotNull()).select(
        "lang",
        F.length("text").alias("chars"),
        F.octet_length("text").alias("bytes"),
    )
    return m.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("chars").cast("long").alias("chars"),
        F.sum("bytes").cast("long").alias("bytes"),
        F.sum(F.col("bytes") - F.col("chars"))
        .cast("long")
        .alias("extra_bytes"),
        F.when(F.sum("chars") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(F.sum("bytes") * F.lit(1.0) / F.sum("chars"), 6)
            + F.lit(0.0)
        )
        .alias("bytes_per_char"),
    )


# ---------------------------------------------------------------------------
# vocabulary coverage curve — OOV rate vs vocabulary budget
# ---------------------------------------------------------------------------
@q(
    "text_vocab_coverage",
    """
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS w
      FROM documents WHERE text IS NOT NULL),
    tf AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok WHERE w <> '' GROUP BY w),
    rk AS (
      SELECT c,
             ROW_NUMBER() OVER (ORDER BY c DESC, w) AS r,
             SUM(c) OVER (ORDER BY c DESC, w
                          ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(c) OVER () AS tot,
             COUNT(*) OVER () AS n_types
      FROM tf),
    ks AS (SELECT unnest([10, 100, 1000, 10000]) AS k)
    SELECT CAST(ks.k AS BIGINT) AS k,
           CAST(MAX(rk.n_types) AS BIGINT) AS n_types,
           CAST(MAX(CASE WHEN rk.r <= ks.k THEN rk.cum END) AS BIGINT)
             AS covered,
           CAST(MAX(rk.tot) AS BIGINT) AS total_tokens,
           round(COALESCE(MAX(CASE WHEN rk.r <= ks.k THEN rk.cum END),
                          MAX(rk.tot))
                 * 1.0 / MAX(rk.tot), 6) + 0 AS coverage
    FROM ks CROSS JOIN rk
    GROUP BY ks.k
    """,
)
def text_vocab_coverage(spark, sf):
    """The vocabulary-budget coverage curve: what fraction of all
    token OCCURRENCES do the top-k types cover, for k in
    {10, 100, 1k, 10k} — the tokenizer/embedding-table sizing curve
    (1 - coverage IS the OOV rate a k-type vocab ships with;
    text_heaps fits how fast TYPES grow, text_zipf_fit fits the
    frequency law — this face reads the decision number straight
    off the data). One corpus scan to the vocab-sized tf relation;
    rank and cumulative mass are windows over it (count-of-counts
    discipline: the corpus is never sorted, the VOCABULARY is, and
    the (c DESC, w) total order makes every prefix deterministic);
    the four checkpoints evaluate by one cross join of a 4-row
    literal against the ranked relation folded per k — MAX(CASE)
    picks the cumulative at rank k exactly, COALESCE handles a k
    beyond the vocabulary (coverage 1.0). Exact integers until the
    final share division."""
    tok = (
        t(spark, sf, "documents")
        .filter(F.col("text").isNotNull())
        .select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
    )
    tf = tok.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("c"))
    word = Window.orderBy(F.desc("c"), "w")
    wcum = word.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy()
    rk = tf.select(
        "c",
        F.row_number().over(word).alias("r"),
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("tot"),
        F.count(F.lit(1)).over(wall).alias("n_types"),
    )
    ks = t(spark, sf, "documents").sparkSession.createDataFrame(
        [(10,), (100,), (1000,), (10000,)], "k long"
    )
    j = ks.crossJoin(rk)
    cov = F.max(F.when(F.col("r") <= F.col("k"), F.col("cum")))
    return j.groupBy("k").agg(
        F.max("n_types").cast("long").alias("n_types"),
        cov.cast("long").alias("covered"),
        F.max("tot").cast("long").alias("total_tokens"),
        (
            F.round(
                F.coalesce(cov, F.max("tot")) * F.lit(1.0) / F.max("tot"),
                6,
            )
            + F.lit(0.0)
        ).alias("coverage"),
    )


# ---------------------------------------------------------------------------
# Good-Turing missing mass — how much probability is unseen?
# ---------------------------------------------------------------------------
@q(
    "text_good_turing",
    """
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS w
      FROM documents WHERE text IS NOT NULL),
    tf AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok WHERE w <> '' GROUP BY w),
    spectrum AS (
      SELECT c, CAST(COUNT(*) AS BIGINT) AS fc
      FROM tf GROUP BY c)
    SELECT CAST(SUM(c * fc) AS BIGINT) AS n_tokens,
           CAST(SUM(fc) AS BIGINT) AS n_types,
           CAST(MAX(CASE WHEN c = 1 THEN fc ELSE 0 END) AS BIGINT) AS f1,
           CAST(MAX(CASE WHEN c = 2 THEN fc ELSE 0 END) AS BIGINT) AS f2,
           CASE WHEN SUM(c * fc) = 0 THEN NULL
                ELSE round(MAX(CASE WHEN c = 1 THEN fc ELSE 0 END)
                           * 1.0 / SUM(c * fc), 6) + 0
           END AS p0_unseen
    FROM spectrum
    """,
)
def text_good_turing(spark, sf):
    """The Good-Turing missing-mass estimate P0 = f1/N from the
    frequency-of-frequencies spectrum — the principled answer to
    'how much probability does this corpus assign to words it has
    NEVER seen?' (Turing's Enigma-era estimator: the hapax share
    f1/N is an unbiased estimate of the unseen mass), which is the
    number that prices OOV risk for text_vocab_coverage's budget
    curve and justifies text_unigram_lm_pruned's smoothing floor —
    a corpus with P0 = 0.02 will OOV 2% of the NEXT document's
    tokens no matter how big its observed vocabulary looks. The
    count-of-counts discipline taken one level up: corpus ->
    vocabulary tf (one agg) -> frequency SPECTRUM f_c (an agg over
    the vocab-sized relation — the spectrum is tiny), and every
    output is an exact fold over the spectrum; f2 rides along
    because f1/f2 drives the full Good-Turing discount chain."""
    tok = (
        t(spark, sf, "documents")
        .filter(F.col("text").isNotNull())
        .select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
    )
    tf = tok.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("c"))
    spectrum = tf.groupBy("c").agg(
        F.count(F.lit(1)).cast("long").alias("fc")
    )
    f1 = F.max(F.when(F.col("c") == 1, F.col("fc")).otherwise(0))
    ntok = F.sum(F.col("c") * F.col("fc"))
    return spectrum.agg(
        ntok.cast("long").alias("n_tokens"),
        F.sum("fc").cast("long").alias("n_types"),
        f1.cast("long").alias("f1"),
        F.max(F.when(F.col("c") == 2, F.col("fc")).otherwise(0))
        .cast("long")
        .alias("f2"),
        F.when(ntok == 0, F.lit(None).cast("double"))
        .otherwise(F.round(f1 * F.lit(1.0) / ntok, 6) + F.lit(0.0))
        .alias("p0_unseen"),
    )


# ---------------------------------------------------------------------------
# KL divergence to the target language mix
# ---------------------------------------------------------------------------
_MIX_TARGET = (
    ("en", 0.4),
    ("de", 0.15),
    ("es", 0.15),
    ("fr", 0.15),
    ("zh", 0.15),
)


@q(
    "mix_kl_target",
    f"""
    WITH tgt(lang, q) AS (VALUES
      {", ".join(f"('{lg}', {w})" for lg, w in _MIX_TARGET)}),
    c AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY lang),
    w AS (
      SELECT tgt.lang, tgt.q, COALESCE(c.n, 0) AS n,
             SUM(COALESCE(c.n, 0)) OVER () AS tot
      FROM tgt LEFT JOIN c ON c.lang = tgt.lang),
    terms AS (
      SELECT lang, n, q,
             CASE WHEN tot = 0 THEN NULL
                  ELSE round(n * 1.0 / tot, 6) + 0 END AS p,
             CASE WHEN n = 0 OR tot = 0 THEN CAST(0 AS BIGINT)
                  ELSE CAST(round(1000000.0 * (n * 1.0 / tot)
                            * ln((n * 1.0 / tot) / q)) AS BIGINT)
             END AS kl_us
      FROM w)
    SELECT lang, n, p, q,
           CAST(kl_us AS BIGINT) AS kl_term_us,
           round(SUM(kl_us) OVER () / 1000000.0, 6) + 0 AS kl_total
    FROM terms
    """,
)
def mix_kl_target(spark, sf):
    """KL divergence of the observed language mix from the TARGET
    mix (the sampling contract mix_domains' temperatures aim at),
    per-language terms plus the total — the monitoring face for
    mix drift: KL is the exact penalty a model pays in average
    log-loss for training on the wrong mix, per-term signs say who
    is over- (p > q, positive term) and under-represented, and
    drift_chi2 tests significance where this face measures COST.
    The target is a literal VALUES dim (broadcast for free, the
    sql_inline_values shape) LEFT-joined so a missing language
    shows as n = 0 with its zero KL term by the 0*ln(0) = 0
    convention (an ABSENT row would hide the gap instead); each
    term micros-quantizes in identical order (kg_adamic_adar),
    the total is a frameless window over the |langs| relation.
    Assumes the observed mix's support is inside the target's
    (q > 0 everywhere by construction — KL to a zero-q cell is
    infinite and means the TARGET is wrong, not the corpus)."""
    tgt = t(spark, sf, "documents").sparkSession.createDataFrame(
        list(_MIX_TARGET), "lang string, q double"
    )
    c = t(spark, sf, "documents").groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    wall = Window.partitionBy()
    w = tgt.join(c, "lang", "left").select(
        "lang",
        "q",
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        F.sum(F.coalesce(F.col("n"), F.lit(0))).over(wall).alias("tot"),
    )
    p = F.col("n") * F.lit(1.0) / F.col("tot")
    kl_us = F.when(
        (F.col("n") == 0) | (F.col("tot") == 0), F.lit(0).cast("long")
    ).otherwise(
        F.round(F.lit(1000000.0) * p * F.log(p / F.col("q"))).cast("long")
    )
    terms = w.select(
        "lang",
        "n",
        F.when(F.col("tot") == 0, F.lit(None).cast("double"))
        .otherwise(F.round(p, 6) + F.lit(0.0))
        .alias("p"),
        "q",
        kl_us.alias("kl_us"),
    )
    return terms.select(
        "lang",
        "n",
        "p",
        "q",
        F.col("kl_us").cast("long").alias("kl_term_us"),
        (
            F.round(F.sum("kl_us").over(wall) / F.lit(1000000.0), 6)
            + F.lit(0.0)
        ).alias("kl_total"),
    )


# ---------------------------------------------------------------------------
# line-structure census — the dedup_lines planning numbers
# ---------------------------------------------------------------------------
@q(
    "text_line_stats",
    r"""
    WITH d AS (
      SELECT lang, string_split(text, chr(10)) AS lines
      FROM documents WHERE text IS NOT NULL),
    m AS (
      SELECT lang, len(lines) AS n_lines,
             len(list_filter(lines, x -> trim(x) = '')) AS n_blank,
             list_max(list_transform(lines, x -> length(x)))
               AS max_line_len
      FROM d)
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_lines) AS BIGINT) AS lines,
           CAST(SUM(n_blank) AS BIGINT) AS blank_lines,
           CAST(MAX(max_line_len) AS BIGINT) AS max_line_len,
           round(SUM(n_lines) * 1.0 / COUNT(*), 6) + 0
             AS lines_per_doc
    FROM m GROUP BY lang
    """,
)
def text_line_stats(spark, sf):
    """Line-structure census per language: lines per document, blank
    lines, and the longest single line — the numbers that size a
    line-granular pipeline BEFORE running it (dedup_lines' unit of
    work is the line; a shard averaging 1.0 lines/doc has no line
    structure to dedup, and a 10^6-char max line means some 'text'
    is minified payload that will blow any per-line buffer — two
    failure modes this one cheap pass catches). All in-row
    higher-order lambdas over the split array (size / filter /
    transform+max — the sql_array_hof discipline: per-line work
    without exploding corpus x lines rows), one
    map-side-combinable fold; the max-line certificate is an exact
    integer."""
    d = t(spark, sf, "documents").filter(F.col("text").isNotNull()).select(
        "lang", F.split("text", "\n").alias("lines")
    )
    m = d.select(
        "lang",
        F.size("lines").alias("n_lines"),
        F.size(F.expr("filter(lines, x -> trim(x) = '')")).alias("n_blank"),
        F.expr(
            "array_max(transform(lines, x -> length(x)))"
        ).alias("max_line_len"),
    )
    return m.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_lines").cast("long").alias("lines"),
        F.sum("n_blank").cast("long").alias("blank_lines"),
        F.max("max_line_len").cast("long").alias("max_line_len"),
        (
            F.round(F.sum("n_lines") * F.lit(1.0) / F.count(F.lit(1)), 6)
            + F.lit(0.0)
        ).alias("lines_per_doc"),
    )


# ---------------------------------------------------------------------------
# DSIR-style importance weights — hashed-unigram target/raw likelihood ratio
# ---------------------------------------------------------------------------
_DSIR_DIM = 64
_DSIR_TARGET_LANG = "en"


@q(
    "mix_dsir",
    f"""
    WITH tok AS (
      SELECT doc_id, lang,
             CAST(('0x' || substr(md5(tk), 1, 8))::UBIGINT % {_DSIR_DIM}
                  AS INT) AS b
      FROM (SELECT doc_id, lang,
                   unnest(string_split(text, ' ')) AS tk
            FROM documents WHERE text IS NOT NULL)
      WHERE tk <> ''),
    cells AS (
      SELECT b, CAST(COUNT(*) AS BIGINT) AS c_all,
             CAST(SUM(CASE WHEN lang = '{_DSIR_TARGET_LANG}'
                           THEN 1 ELSE 0 END) AS BIGINT) AS c_tgt
      FROM tok GROUP BY b),
    rates AS (
      SELECT b,
             CAST(round(1000000.0 * ln(
               ((c_tgt + 1.0) / (SUM(c_tgt) OVER () + {_DSIR_DIM}.0))
               / ((c_all + 1.0) / (SUM(c_all) OVER () + {_DSIR_DIM}.0))
             )) AS BIGINT) AS lr_us
      FROM cells),
    doc AS (
      SELECT tok.doc_id, tok.lang,
             CAST(SUM(lr_us) AS BIGINT) AS lw_us
      FROM tok JOIN rates ON rates.b = tok.b
      GROUP BY tok.doc_id, tok.lang)
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(lw_us) AS BIGINT) AS sum_lw_us,
           CAST(SUM(CASE WHEN lw_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_target_like,
           round(CAST(SUM(lw_us) AS DOUBLE) / COUNT(*) / 1000000.0, 6)
             + 0 AS avg_lw
    FROM doc GROUP BY lang
    """,
)
def mix_dsir(spark, sf):
    """DSIR-style data-selection importance weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    each document scores log p_target(x)/p_raw(x) under two
    hashed-unigram bag models — the scalable stand-in for
    'train-on-what-looks-like-the-target-domain' selection, here with
    the English shard as the target the way DSIR uses a Wikipedia/
    books pile. Every token maps to one of 64 md5 buckets (the
    feat_hashing portability hash — no vocabulary build, any executor
    featurizes statelessly), bucket counts for target and raw come
    from ONE corpus scan (c_tgt rides c_all as a conditional sum),
    add-one smoothing on both, and the per-bucket log-ratio is
    micros-quantized ONCE so each document's log-weight is an exact
    order-independent BIGINT sum of bucket constants (the
    kg_adamic_adar sum-of-logs trick). The tokenized relation feeds
    TWO consumers (bucket census + the per-doc scoring join), so it
    is parquet-checkpointed — column pruning defeats ReuseExchange
    and the uncheckpointed twin subtree re-tokenizes the corpus per
    branch. The 64-row rate relation joins unhinted (AQE broadcasts
    iff it fits). Output is the per-language selection report:
    document count, exact summed log-weight, how many docs score
    target-like (lw > 0), and the mean log-weight in nats. Empty
    corpus: every relation is empty, output empty."""
    from ..operators.dedup import parquet_checkpoint

    bucket = (
        F.pmod(
            F.conv(F.substring(F.md5("tk"), 1, 8), 16, 10).cast("long"),
            F.lit(_DSIR_DIM),
        )
        .cast("int")
        .alias("b")
    )
    tok = parquet_checkpoint(
        t(spark, sf, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id", "lang", F.explode(F.split("text", " ")).alias("tk")
        )
        .filter(F.col("tk") != "")
        .select("doc_id", "lang", bucket),
        "dsir_tok",
    )
    cells = tok.groupBy("b").agg(
        F.count(F.lit(1)).cast("long").alias("c_all"),
        F.sum(
            F.when(F.col("lang") == _DSIR_TARGET_LANG, 1).otherwise(0)
        )
        .cast("long")
        .alias("c_tgt"),
    )
    wall = Window.partitionBy()
    p_t = (F.col("c_tgt") + F.lit(1.0)) / (
        F.sum("c_tgt").over(wall) + F.lit(float(_DSIR_DIM))
    )
    p_r = (F.col("c_all") + F.lit(1.0)) / (
        F.sum("c_all").over(wall) + F.lit(float(_DSIR_DIM))
    )
    rates = cells.select(
        "b",
        F.round(F.lit(1000000.0) * F.log(p_t / p_r))
        .cast("long")
        .alias("lr_us"),
    )
    doc = (
        tok.join(rates, "b")
        .groupBy("doc_id", "lang")
        .agg(F.sum("lr_us").cast("long").alias("lw_us"))
    )
    return doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("lw_us").cast("long").alias("sum_lw_us"),
        F.sum(F.when(F.col("lw_us") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_target_like"),
        (
            F.round(
                F.sum("lw_us").cast("double")
                / F.count(F.lit(1))
                / F.lit(1000000.0),
                6,
            )
            + F.lit(0.0)
        ).alias("avg_lw"),
    )


# ---------------------------------------------------------------------------
# RAKE keyword extraction — stopword-delimited phrases, degree/frequency
# ---------------------------------------------------------------------------
def _rake_stop_sql() -> str:
    from ..functions.text import LINKING_STOPWORDS

    return ", ".join(f"'{w}'" for w in sorted(LINKING_STOPWORDS))


@q(
    "text_rake",
    f"""
    WITH tok AS (
      SELECT doc_id, generate_subscripts(a, 1) - 1 AS pos,
             lower(unnest(a)) AS w
      FROM (SELECT doc_id, string_split(text, ' ') AS a
            FROM documents WHERE text IS NOT NULL)),
    cand AS (
      SELECT doc_id, pos, w FROM tok
      WHERE w <> '' AND w NOT IN ({_rake_stop_sql()})),
    isl AS (
      SELECT doc_id, pos, w,
             pos - ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY pos) AS grp
      FROM cand),
    pl AS (
      SELECT doc_id, pos, w, grp,
             COUNT(*) OVER (PARTITION BY doc_id, grp) AS plen
      FROM isl),
    ws AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(plen) AS BIGINT) AS deg
      FROM pl GROUP BY w),
    su AS (
      SELECT w, (2000000 * deg + freq) // (2 * freq) AS s_us FROM ws),
    ph AS (
      SELECT pl.doc_id, pl.grp,
             string_agg(pl.w, ' ' ORDER BY pl.pos) AS phrase,
             SUM(su.s_us) AS score_us
      FROM pl JOIN su ON su.w = pl.w
      GROUP BY pl.doc_id, pl.grp),
    agg AS (
      SELECT phrase, CAST(MAX(score_us) AS BIGINT) AS score_us,
             CAST(COUNT(*) AS BIGINT) AS n_occur
      FROM ph GROUP BY phrase)
    SELECT phrase, score_us, n_occur,
           round(score_us / 1000000.0, 6) + 0 AS score
    FROM agg ORDER BY score_us DESC, phrase LIMIT 20
    """,
)
def text_rake(spark, sf):
    """RAKE keyword extraction (Rose et al. 2010, "Automatic Keyword
    Extraction from Individual Documents"): candidate phrases are the
    maximal stopword-free token runs, each word scores
    deg(w)/freq(w) — degree counts every co-member of every phrase
    occurrence (Σ phrase_len over w's occurrences), so words that
    live in LONG phrases outrank equally-frequent words that stand
    alone — and a phrase scores the sum of its member words. The
    corpus-level top-20 is the keyword vocabulary a curation
    pipeline tags shards with. Shapes: phrase segmentation is the
    gaps-and-islands anchor (pos - row_number per doc — win_streaks'
    day-minus-rn trick applied to token positions); phrase length
    attaches as a COUNT window over the SAME partition the island
    grouping uses; deg/freq quantizes half-up to EXACT integer
    micros with pure BIGINT arithmetic ((2e6*deg + freq) div
    (2*freq) — no float rounding seam at all), so phrase scores are
    exact integer sums and the top-20 order is deterministic
    (score DESC, phrase). Phrase text re-assembles via array_sort
    over carried (pos, w) structs — collect_list alone is
    order-unstable (kg_entity_card precedent) — vs DuckDB's ordered
    string_agg. The island relation feeds TWO consumers (word stats
    + phrase assembly) so it is parquet-checkpointed. The stopword
    literal list is generated from functions.text.LINKING_STOPWORDS
    into BOTH plans, one source of truth. At corpus scale every
    stage keys on doc_id or w — no global window, no self-join."""
    from ..functions.text import LINKING_STOPWORDS
    from ..operators.dedup import parquet_checkpoint

    tok = (
        t(spark, sf, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
        )
        .select("doc_id", "pos", F.lower("w").alias("w"))
    )
    cand = tok.filter(
        (F.col("w") != "")
        & ~F.col("w").isin(*sorted(LINKING_STOPWORDS))
    )
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    isl = cand.select(
        "doc_id",
        "pos",
        "w",
        (F.col("pos") - F.row_number().over(wdoc)).alias("grp"),
    )
    pl = parquet_checkpoint(
        isl.select(
            "doc_id",
            "pos",
            "w",
            "grp",
            F.count(F.lit(1))
            .over(Window.partitionBy("doc_id", "grp"))
            .alias("plen"),
        ),
        "rake_pl",
    )
    ws = pl.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum("plen").cast("long").alias("deg"),
    )
    su = ws.select(
        "w", F.expr("(2000000 * deg + freq) div (2 * freq)").alias("s_us")
    )
    ph = (
        pl.join(su, "w")
        .groupBy("doc_id", "grp")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "w"))
                    ),
                    lambda x: x["w"],
                ),
                " ",
            ).alias("phrase"),
            F.sum("s_us").alias("score_us"),
        )
    )
    agg = ph.groupBy("phrase").agg(
        F.max("score_us").cast("long").alias("score_us"),
        F.count(F.lit(1)).cast("long").alias("n_occur"),
    )
    return (
        agg.orderBy(F.desc("score_us"), "phrase")
        .limit(20)
        .select(
            "phrase",
            "score_us",
            "n_occur",
            (
                F.round(F.col("score_us") / F.lit(1000000.0), 6)
                + F.lit(0.0)
            ).alias("score"),
        )
    )


# ---------------------------------------------------------------------------
# explode-free token-length moments — HOF struct accumulator, in-row fold
# ---------------------------------------------------------------------------
@q(
    "text_inrow_moments",
    """
    WITH d AS (
      SELECT lang,
             list_filter(string_split(text, ' '), x -> x <> '') AS lf
      FROM documents WHERE text IS NOT NULL),
    m AS (
      SELECT lang,
             CAST(len(lf) AS BIGINT) AS n,
             CAST(COALESCE(list_sum(
               list_transform(lf, x -> length(x))), 0) AS BIGINT) AS s,
             CAST(COALESCE(list_sum(
               list_transform(lf, x -> length(x) * length(x))), 0)
               AS BIGINT) AS q
      FROM d)
    SELECT lang,
           CAST(SUM(n) AS BIGINT) AS n_tokens,
           CAST(SUM(s) AS BIGINT) AS len_sum,
           CAST(SUM(q) AS BIGINT) AS len_sumsq,
           CASE WHEN SUM(n) = 0 THEN NULL
                ELSE round(CAST(SUM(n) * SUM(q) - SUM(s) * SUM(s)
                                AS DOUBLE)
                           / (CAST(SUM(n) AS DOUBLE) * SUM(n)), 6) + 0
           END AS len_var
    FROM m GROUP BY lang
    """,
)
def text_inrow_moments(spark, sf):
    """Token-length moments per language WITHOUT exploding a token
    row per word: one ``aggregate`` higher-order function folds each
    document's token array into a (n, sum, sumsq) STRUCT accumulator
    entirely inside the row — the composite-accumulator HOF shape
    sql_array_hof's scalar lambdas don't exercise — and the corpus
    agg then sums three BIGINTs per document. At 100 TB this is the
    difference between shuffling |tokens| rows (the posexplode
    formulation materializes every word; Tungsten row churn was the
    measured dominant cost of the minhash family pre-fold) and
    shuffling 3 integers per document: the moment algebra is
    associative, so fold-in-row-then-sum equals explode-then-sum
    exactly, which is what the DuckDB twin (list_transform/list_sum,
    no engine HOF structs needed — values are the contract, not the
    plan) certifies. Variance cross-multiplies to exact BIGINTs
    (stat_anova discipline): len <= ~50, so q fits comfortably at
    any sf. Plan: zero Generate, zero joins, one scan (audit #75).
    Empty token lists fold to the (0,0,0) init struct — DuckDB's
    list_sum yields NULL on empties, COALESCE'd to 0 to match."""
    arr = F.filter(F.split("text", " "), lambda x: x != "")
    acc0 = F.named_struct(
        F.lit("n"), F.lit(0).cast("long"),
        F.lit("s"), F.lit(0).cast("long"),
        F.lit("q"), F.lit(0).cast("long"),
    )
    m = (
        t(spark, sf, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "lang",
            F.aggregate(
                arr,
                acc0,
                lambda acc, x: F.named_struct(
                    F.lit("n"), acc["n"] + 1,
                    F.lit("s"), acc["s"] + F.length(x),
                    F.lit("q"),
                    acc["q"] + F.length(x).cast("long") * F.length(x),
                ),
            ).alias("m"),
        )
    )
    g = m.groupBy("lang").agg(
        F.sum("m.n").cast("long").alias("n_tokens"),
        F.sum("m.s").cast("long").alias("len_sum"),
        F.sum("m.q").cast("long").alias("len_sumsq"),
    )
    var = (
        F.col("n_tokens") * F.col("len_sumsq")
        - F.col("len_sum") * F.col("len_sum")
    ).cast("double") / (
        F.col("n_tokens").cast("double") * F.col("n_tokens")
    )
    return g.select(
        "lang",
        "n_tokens",
        "len_sum",
        "len_sumsq",
        F.when(F.col("n_tokens") == 0, F.lit(None).cast("double"))
        .otherwise(F.round(var, 6) + F.lit(0.0))
        .alias("len_var"),
    )


# ---------------------------------------------------------------------------
# parse_url function family — host/path/query-param/fragment extraction
# ---------------------------------------------------------------------------
@q(
    "url_parse_fns",
    """
    WITH u AS (
      SELECT 'https://h' || CAST(doc_id % 53 AS VARCHAR)
             || '.example.com/p/' || CAST(doc_id % 7 AS VARCHAR)
             || '/page?k=' || CAST(doc_id % 10 AS VARCHAR)
             || '&x=1#s' || CAST(doc_id % 3 AS VARCHAR) AS url
      FROM documents),
    p AS (
      SELECT regexp_extract(url, '^[a-z]+://([^/]+)/', 1) AS host,
             regexp_extract(url, '^[a-z]+://[^/]+(/[^?#]*)', 1)
               AS path,
             CAST(regexp_extract(url, '[?&]k=([0-9]+)', 1) AS BIGINT)
               AS k,
             regexp_extract(url, '#(.*)$', 1) AS frag
      FROM u)
    SELECT host,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT path) AS BIGINT) AS n_paths,
           CAST(SUM(k) AS BIGINT) AS k_sum,
           CAST(COUNT(DISTINCT frag) AS BIGINT) AS n_frags
    FROM p GROUP BY host
    """,
)
def url_parse_fns(spark, sf):
    """The ``parse_url`` function family (HOST / PATH / QUERY-param /
    REF) — the JVM-native URL decomposition a crawl pipeline should
    reach for BEFORE the regexp toolbox url_normalize builds from
    (parse_url understands delimiters; regexes understand bytes):
    per-host census of paths, query-parameter mass and fragments
    over the host_stats synthesized-URL corpus (the fixture carries
    no real URLs; both sides build the same ones from doc_id). The
    twin extracts with regexps — agreement proves the native parser
    and the portable regex rules coincide on well-formed URLs, which
    is the compatibility contract that lets the 100-TB pipeline mix
    both (parse_url in the JVM hot path, the regex table wherever an
    engine lacks it). Map-side expressions into one host-keyed agg;
    parse_url returns NULL, never an error, on malformed input —
    the try_* tolerance family's contract."""
    u = t(spark, sf, "documents").select(
        F.concat(
            F.lit("https://h"),
            (F.col("doc_id") % 53).cast("string"),
            F.lit(".example.com/p/"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit("/page?k="),
            (F.col("doc_id") % 10).cast("string"),
            F.lit("&x=1#s"),
            (F.col("doc_id") % 3).cast("string"),
        ).alias("url")
    )
    p = u.select(
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("k"))
        .cast("long")
        .alias("k"),
        F.parse_url("url", F.lit("REF")).alias("frag"),
    )
    return p.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.countDistinct("path").cast("long").alias("n_paths"),
        F.sum("k").cast("long").alias("k_sum"),
        F.countDistinct("frag").cast("long").alias("n_frags"),
    )


# ---------------------------------------------------------------------------
# wave 125: crawl frontier — per-source round-robin interleave
# ---------------------------------------------------------------------------
@q(
    "crawl_frontier",
    """
    WITH r AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source
               ORDER BY md5('fr:' || CAST(doc_id AS VARCHAR)), doc_id)
               AS host_rank
      FROM documents),
    g AS (
      SELECT doc_id, source, host_rank,
             ROW_NUMBER() OVER (ORDER BY host_rank,
               md5('fr:' || CAST(doc_id AS VARCHAR)), doc_id)
               AS fetch_order
      FROM r)
    SELECT fetch_order, doc_id, source,
           CAST(host_rank AS BIGINT) AS host_rank
    FROM g WHERE fetch_order <= 40
    """,
)
def crawl_frontier(spark, sf):
    """Politeness-interleaved crawl frontier — the fetch schedule a
    crawler actually issues: ranking candidates WITHIN each source
    first (md5 order = deterministic pseudo-random priority,
    doc_id tiebreak for totality) and then interleaving by that
    per-source rank, so the head of the queue cycles through
    sources round-robin instead of hammering one host with its
    whole backlog — the global-ordering spelling of the per-host
    rate limit (crawl_schedule decides WHEN a host is due; this
    face decides the ORDER of a ready batch). Every source with at
    least rank-1 work appears in the first |sources| positions —
    the interleave guarantee, pinned in tests. Both windows are
    exact integer machinery over the same total order, so the
    emitted head-40 plan is bit-identical cross-engine. Scale note:
    the global interleave window is the documented single-partition
    cost over the BOUNDED ready-batch (a frontier emits fixed-size
    batches), never over the full URL store."""
    pri = F.md5(
        F.concat(F.lit("fr:"), F.col("doc_id").cast("string"))
    )
    r = t(spark, sf, "documents").select(
        "doc_id",
        "source",
        F.row_number()
        .over(Window.partitionBy("source").orderBy(pri, "doc_id"))
        .alias("host_rank"),
    )
    pri2 = F.md5(
        F.concat(F.lit("fr:"), F.col("doc_id").cast("string"))
    )
    g = r.select(
        "doc_id",
        "source",
        "host_rank",
        F.row_number()
        .over(Window.orderBy("host_rank", pri2, "doc_id"))
        .alias("fetch_order"),
    )
    return g.filter(F.col("fetch_order") <= 40).select(
        "fetch_order",
        "doc_id",
        "source",
        F.col("host_rank").cast("long").alias("host_rank"),
    )


# ---------------------------------------------------------------------------
# wave 127: type-token ratio — per-source lexical diversity with
# hapax share
# ---------------------------------------------------------------------------
@q(
    "text_ttr",
    """
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS w
      FROM documents),
    tw AS (SELECT source, w FROM tok WHERE w <> ''),
    tf AS (
      SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
      FROM tw GROUP BY source, w),
    agg AS (
      SELECT source,
             CAST(SUM(c) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_types,
             CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hapax
      FROM tf GROUP BY source)
    SELECT source, n_tokens, n_types, n_hapax,
           round(n_types * 1.0 / n_tokens, 6) + 0 AS ttr,
           round(n_hapax * 1.0 / n_types, 6) + 0 AS hapax_share
    FROM agg WHERE n_tokens > 0
    """,
)
def text_ttr(spark, sf):
    """Type-token ratio and hapax share per source — the lexical-
    diversity profile a corpus-mixing decision reads next to
    text_simpson's concentration and text_heaps' growth curve: a
    source whose TTR collapses is template/boilerplate-heavy (the
    text_repetition signal at vocabulary granularity), and a source
    whose hapax share is extreme in either direction is suspect —
    near-zero means generated/looping text, near-one means OCR
    noise or tokenizer breakage. One explode to per-source term
    frequencies (the corpus-proportional relation, shuffled once on
    (source, token)), then counts-of-counts: tokens, types, and
    hapaxes are exact BIGINTs, the two ratios final floats. Empty
    tokenizations drop (parity: Spark split and DuckDB string_split
    both yield empty strings on consecutive spaces — filtered on
    BOTH sides). TTR is length-sensitive by construction — comparing
    sources of very different sizes calls for the windowed MATTR
    variant, documented here rather than silently conflated."""
    tok = t(spark, sf, "documents").select(
        "source",
        F.explode(F.split(F.col("text"), " ")).alias("w"),
    ).filter(F.col("w") != "")
    tf = tok.groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    agg = tf.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_hapax"),
    )
    return agg.filter(F.col("n_tokens") > 0).select(
        "source",
        "n_tokens",
        "n_types",
        "n_hapax",
        (
            F.round(
                F.col("n_types") * F.lit(1.0) / F.col("n_tokens"), 6
            )
            + F.lit(0.0)
        ).alias("ttr"),
        (
            F.round(
                F.col("n_hapax") * F.lit(1.0) / F.col("n_types"), 6
            )
            + F.lit(0.0)
        ).alias("hapax_share"),
    )


# ---------------------------------------------------------------------------
# wave 136: MATTR — moving-average type-token ratio, in-row HOF
# ---------------------------------------------------------------------------
@q(
    "text_mattr",
    """
    WITH tok AS (
      SELECT source, doc_id,
             list_filter(string_split(text, ' '), w -> w <> '') AS arr
      FROM documents),
    d AS (
      SELECT source, doc_id, arr, len(arr) AS nt FROM tok
      WHERE len(arr) >= 20),
    wd AS (
      SELECT source, doc_id, nt,
             CAST(round(1000000.0 * list_avg(list_transform(
               generate_series(1, nt - 20 + 1),
               i -> len(list_distinct(arr[i:i+19])) / 20.0)))
               AS BIGINT) AS mattr_mic
      FROM d)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(mattr_mic) AS BIGINT) AS sum_mattr_mic,
           round(CAST(SUM(mattr_mic) AS DOUBLE) / 1000000.0
                 / COUNT(*), 6) + 0 AS mattr
    FROM wd GROUP BY source
    """,
)
def text_mattr(spark, sf):
    """MATTR — moving-average type-token ratio over a sliding
    20-token window, the length-INVARIANT lexical diversity measure
    text_ttr's docstring defers to (raw TTR falls with document
    length by Heaps' law, so cross-source TTR comparisons confound
    diversity with size; MATTR's fixed window removes the
    confound). The whole computation is IN-ROW higher-order
    functions — transform over the window-start sequence, slice,
    array_distinct, size — so the plan is map-only with zero
    Generate and zero shuffle before the per-source aggregate (the
    text_inrow_moments class; O(n_tokens * 20) work per document,
    distributed with the documents partitioning). Each document's
    mean window-TTR is micros-quantized once (a single rounding of
    the same rational on both engines — window TTRs are exact
    20ths, their mean exact up to one division in identical order),
    making the per-source sums exact BIGINTs. Docs under 20 tokens
    drop by contract (no window fits). Engine parity: Spark slice
    is (start, length), DuckDB list slicing arr[i:i+19] is
    START:END INCLUSIVE — both spell a 20-token window; empty-token
    filtering mirrors text_ttr."""
    arr = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    d = (
        t(spark, sf, "documents")
        .select("source", "doc_id", arr.alias("arr"))
        .withColumn("nt", F.size("arr"))
        .filter(F.col("nt") >= 20)
    )
    win_ttrs = F.transform(
        F.sequence(F.lit(1), F.col("nt") - 20 + 1),
        lambda i: F.size(F.array_distinct(F.slice(F.col("arr"), i, 20)))
        / F.lit(20.0),
    )
    mattr_mic = (
        F.round(
            F.lit(1000000.0)
            * F.aggregate(
                win_ttrs, F.lit(0.0), lambda acc, x: acc + x
            )
            / F.size(win_ttrs)
        )
        .cast("long")
        .alias("mattr_mic")
    )
    wd = d.select("source", mattr_mic)
    return wd.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("mattr_mic").cast("long").alias("sum_mattr_mic"),
        (
            F.round(
                F.sum("mattr_mic").cast("double")
                / F.lit(1000000.0)
                / F.count(F.lit(1)),
                6,
            )
            + F.lit(0.0)
        ).alias("mattr"),
    )
