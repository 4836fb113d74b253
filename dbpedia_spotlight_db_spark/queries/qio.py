"""Format round-trip faces (round-3 wave 12): the non-parquet
source/sink surface — ORC, quoted CSV, and JSON-lines with a nested
struct — each exercised as write -> re-read -> aggregate ON the
oracle gate. The DuckDB twin aggregates the original parquet table
directly, so a green row proves the round trip is LOSSLESS (any
encode/decode drift — quoting, escaping, type coercion, struct
nesting — flips the value hash).

Sinks land under spark.local.dir (tmpfs) in a per-call unique dir,
removed at interpreter exit; every read supplies an EXPLICIT schema
(schema inference is a second corpus scan and a type lottery — never
acceptable at 10^12 rows, so the faces don't model it either).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import Window, functions as F

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


_TMPDIRS: list[str] = []


def _sink_dir(spark, tag: str) -> str:
    base = spark.conf.get("spark.local.dir", "/tmp").split(",")[0]
    d = tempfile.mkdtemp(prefix=f"qio_{tag}_", dir=base)
    _TMPDIRS.append(d)
    return d


@atexit.register
def _cleanup() -> None:
    for d in _TMPDIRS:
        shutil.rmtree(d, ignore_errors=True)


_DOCS_DDL = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


@q(
    "orc_roundtrip",
    """
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents GROUP BY lang
    """,
)
def orc_roundtrip(spark, sf):
    """documents -> ORC sink -> ORC source -> aggregate; the twin
    aggregates the parquet original, so equality proves the columnar
    round trip preserves every value. ORC is the other splittable
    columnar container a lake ingests from (Hive-era feeds); the
    writer path is the same partitioned DataFrameWriter as the
    parquet catalog sink."""
    d = _sink_dir(spark, "orc")
    t(spark, sf, "documents").write.mode("overwrite").orc(d)
    back = spark.read.schema(_DOCS_DDL).orc(d)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
    )


@q(
    "csv_roundtrip",
    """
    SELECT source, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents GROUP BY source
    """,
)
def csv_roundtrip(spark, sf):
    """documents -> quoted CSV -> explicit-schema read -> aggregate.
    CSV is where round trips actually break (delimiters and quotes
    inside free text, type re-inference), which is exactly what the
    hash-equality twin guards: quoteAll + escape on the way out, a
    declared schema (never inferSchema — that's a second full scan)
    on the way in. The crawl-side reality this models is exporting
    review samples / blocklists to spreadsheet-facing tools and
    reading them back without corruption."""
    d = _sink_dir(spark, "csv")
    (
        t(spark, sf, "documents")
        .write.mode("overwrite")
        .options(header=True, quoteAll=True, escape='"')
        .csv(d)
    )
    back = (
        spark.read.options(header=True, escape='"', multiLine=True)
        .schema(_DOCS_DDL)
        .csv(d)
    )
    return back.groupBy("source").agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.max("n_chars").cast("long").alias("max_chars"),
    )


@q(
    "json_roundtrip",
    """
    SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents GROUP BY lang, source
    """,
)
def json_roundtrip(spark, sf):
    """documents re-shaped with a NESTED struct (meta.lang,
    meta.source — the shape crawl sidecar metadata actually arrives
    in) -> JSON-lines sink -> explicit-schema read -> unnest ->
    aggregate. JSON-lines is the lingua franca for crawl interchange
    (WARC sidecars, labeling exports); the twin proves nesting +
    unicode text survive the trip bit-for-bit."""
    d = _sink_dir(spark, "json")
    (
        t(spark, sf, "documents")
        .select(
            "doc_id",
            "text",
            F.struct("lang", "source").alias("meta"),
            "n_chars",
        )
        .write.mode("overwrite")
        .json(d)
    )
    back = spark.read.schema(
        "doc_id long, text string, "
        "meta struct<lang:string,source:string>, n_chars long"
    ).json(d)
    return back.groupBy(
        F.col("meta.lang").alias("lang"), F.col("meta.source").alias("source")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
    )


@q(
    "xml_roundtrip",
    """
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(SUM(len(text)) AS BIGINT) AS sum_len
    FROM documents GROUP BY lang
    """,
)
def xml_roundtrip(spark, sf):
    """documents -> native XML sink (Spark 4's built-in xml data
    source, one <doc> element per row) -> explicit-schema XML read ->
    aggregate; the twin aggregates the parquet original. XML is the
    interchange format where FREE TEXT breaks naive writers — &, <,
    >, quotes and newlines inside the text column must entity-escape
    out and decode back — which is exactly what hash equality over
    sum(len(text)) proves. Same discipline as the other roundtrips:
    explicit schema on the read (inference is a second corpus scan),
    splittable multi-file layout, per-call unique tmpfs sink."""
    d = _sink_dir(spark, "xml")
    (
        t(spark, sf, "documents")
        .write.mode("overwrite")
        .option("rowTag", "doc")
        .format("xml")
        .save(d)
    )
    back = (
        spark.read.option("rowTag", "doc")
        # the XML reader TRIMS text nodes by default — lossy for
        # free text with leading/trailing whitespace; disable it
        .option("ignoreSurroundingSpaces", "false")
        .schema(_DOCS_DDL)
        .format("xml")
        .load(d)
    )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.sum(F.length("text")).cast("long").alias("sum_len"),
    )


@q(
    "text_roundtrip",
    """
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(text)) AS BIGINT) AS sum_len
    FROM documents GROUP BY lang
    """,
)
def text_roundtrip(spark, sf):
    """documents -> line-oriented text sink -> spark.read.text ->
    parse -> aggregate: the lowest-common-denominator interchange
    (log shippers, queue dumps) where the ONLY row delimiter is the
    newline, so free text must be ARMORED before it rides a line —
    each row serializes as `lang \\t hex(text)`. Hex, NOT base64:
    Spark's base64 is RFC 2045 (MIME) and inserts a CRLF every 76
    chars, which shatters long documents into extra lines (measured:
    5 langs exploded into 2275 "langs" on this fixture); hex never
    emits a delimiter byte. The read side is the plain
    text source (one string column), split + unhex'd back; the
    twin aggregates the parquet original, so hash equality proves
    the armor is lossless, embedded newlines included. Map-only both
    directions; the text source splits on HDFS block boundaries
    exactly like any line format, so the path scales as parquet
    does (minus columnar pruning — which is why this is the
    interchange face, not the storage format)."""
    d = _sink_dir(spark, "txt")
    (
        t(spark, sf, "documents")
        .select(
            F.concat_ws(
                "\t", F.col("lang"), F.hex(F.encode("text", "UTF-8"))
            ).alias("value")
        )
        .write.mode("overwrite")
        .text(d)
    )
    back = spark.read.text(d).select(
        F.split_part(F.col("value"), F.lit("\t"), F.lit(1)).alias("lang"),
        F.decode(
            F.unhex(F.split_part(F.col("value"), F.lit("\t"), F.lit(2))),
            "UTF-8",
        ).alias("text"),
    )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.length("text")).cast("long").alias("sum_len"),
    )


@q(
    "hive_partition_prune",
    """
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents WHERE lang = 'en' GROUP BY source
    """,
)
def hive_partition_prune(spark, sf):
    """Hive-style partitioned layout + partition PRUNING — the table
    layout primitive every 100-TB lake leans on: documents written
    `partitionBy(lang)` (one directory per language), read back with
    a `lang = 'en'` filter that must resolve at the DIRECTORY level
    (PartitionFilters in the scan, zero non-English files opened) —
    at web scale this is the difference between scanning one
    language's share and scanning everything. The twin aggregates
    the unpartitioned original, so hash equality proves the
    partition round trip loses nothing and prunes to exactly the
    right slice; audit check #39 asserts the filter lands in
    PartitionFilters (not a post-scan Filter). Read with the
    explicit DDL rather than inference: it pins the partition
    column's type (directory names would otherwise be type-GUESSED
    per Spark's partition-inference rules) and keeps the read total
    on an empty source (zero data files = nothing to infer from)."""
    d = _sink_dir(spark, "hivepart")
    t(spark, sf, "documents").write.mode("overwrite").partitionBy(
        "lang"
    ).parquet(d)
    back = spark.read.schema(_DOCS_DDL).parquet(d).filter(
        F.col("lang") == "en"
    )
    return back.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
    )


@q(
    "parquet_merge_schema",
    """
    SELECT CAST(2 * COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_text,
           CAST(COUNT(*) AS BIGINT) AS n_lang,
           CAST(COUNT(*) AS BIGINT) AS n_source,
           CAST(COUNT(*) AS BIGINT) AS n_nchars,
           CAST(SUM(n_chars) AS BIGINT) AS sum_nchars
    FROM documents
    """,
)
def parquet_merge_schema(spark, sf):
    """Schema EVOLUTION at the source: two parquet file generations
    with different column sets ((doc_id, text, lang) vs (doc_id,
    source, n_chars) — the add-a-column / drop-a-column drift every
    long-lived feed accumulates) land in one directory and are read
    with mergeSchema=true, which unions the schemas and null-fills
    the gaps per file. The probe aggregates COUNT(col) per column —
    each generation's columns are non-null exactly on its own rows,
    so the counts PROVE the per-file null-fill (and SUM over the
    evolved column proves values survive). mergeSchema is a
    footer-union at planning time, not a data pass — cheap at any
    file count; the default (schema from one file) would silently
    DROP the evolved columns, which is why the option is the
    contract here."""
    d = _sink_dir(spark, "mergeschema")
    docs = t(spark, sf, "documents")
    docs.select("doc_id", "text", "lang").write.mode("append").parquet(d)
    docs.select("doc_id", "source", "n_chars").write.mode("append").parquet(
        d
    )
    back = spark.read.option("mergeSchema", "true").parquet(d)
    return back.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count("text").cast("long").alias("n_text"),
        F.count("lang").cast("long").alias("n_lang"),
        F.count("source").cast("long").alias("n_source"),
        F.count("n_chars").cast("long").alias("n_nchars"),
        F.sum("n_chars").cast("long").alias("sum_nchars"),
    )


@q(
    "scan_row_index",
    """
    SELECT CAST(CASE WHEN COUNT(*) = 0 THEN 0 ELSE 4 END AS BIGINT)
             AS n_files,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CASE WHEN COUNT(*) = 0 THEN NULL ELSE 1 END AS contiguous,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    """,
)
def scan_row_index(spark, sf):
    """Hidden `_metadata` file-source columns (file_path + row_index)
    — the provenance primitive behind row-level lineage, CDC file
    attribution, and stable row ids at 100 TB (join a quality verdict
    back to the exact file+offset that produced it without writing a
    surrogate key). The layout is pinned (repartition(4, doc_id), so
    n_files = 4 whenever the corpus is non-empty and 0 otherwise);
    the probe then PROVES row_index semantics per file from inside
    the engine: min = 0, max = cnt-1, and 2*sum = cnt*(cnt-1) — an
    exact integer certificate that each file's indexes are the
    contiguous prefix 0..cnt-1 (any dropped/duplicated/shifted index
    breaks at least one equation). The oracle carries the row-count /
    content parity; `contiguous` is the in-engine certificate.
    _metadata is constant-folded per file split at scan time — zero
    data-pass cost — and the scan reads only (doc_id is pruned too:
    audit #40 asserts the sink scan's ReadSchema is n_chars-only)."""
    d = _sink_dir(spark, "rowindex")
    t(spark, sf, "documents").repartition(4, "doc_id").write.mode(
        "overwrite"
    ).parquet(d)
    back = spark.read.schema(_DOCS_DDL).parquet(d).select(
        "n_chars",
        F.col("_metadata.file_path").alias("fp"),
        F.col("_metadata.row_index").alias("ri"),
    )
    per = back.groupBy("fp").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min("ri").alias("mn"),
        F.max("ri").alias("mx"),
        F.sum("ri").alias("s"),
        F.sum("n_chars").alias("sc"),
    )
    ok = (
        (F.col("mn") == 0)
        & (F.col("mx") == F.col("cnt") - 1)
        & (F.lit(2) * F.col("s") == F.col("cnt") * (F.col("cnt") - 1))
    )
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("n_rows"),
        F.min(ok).cast("int").alias("contiguous"),
        F.sum("sc").cast("long").alias("sum_chars"),
    )


# ---------------------------------------------------------------------------
# binaryFile source — opaque-bytes ingestion with in-engine decode
# ---------------------------------------------------------------------------
@q(
    "scan_binaryfile",
    """
    WITH agg AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      FROM documents GROUP BY lang)
    SELECT lang, n_docs, sum_chars,
           md5(lang || '|' || CAST(n_docs AS VARCHAR) || '|'
               || CAST(sum_chars AS VARCHAR)) AS payload_md5,
           TRUE AS bytes_ok
    FROM agg
    """,
)
def scan_binaryfile(spark, sf):
    """The `binaryFile` source — Spark's opaque-bytes ingestion path
    (each file one row: path, modificationTime, length, content) and
    the front door of every multimodal pipeline (images, audio,
    model shards arrive as whole files, not records). The face
    writes a per-language digest line (`lang|n_docs|sum_chars`)
    through the text sink, reads the part files back as RAW BINARY,
    and does everything downstream in-engine: decode(content,
    'UTF-8') + split + explode recovers the records regardless of
    how the writer packed rows into files, and the source's
    `length` metadata column is reconciled byte-for-byte against
    the decoded payload (Σ octet_length(line)+1 per file == length
    — proving content arrived untruncated), AND-reduced into the
    gated bytes_ok column. The oracle rebuilds the digest from the
    views and md5s the same payload string — hash equality proves
    the bytes that rode the binary path are exactly the bytes the
    relational path predicts. Scale shape: binaryFile is one row
    per file (never splits a file), so partition parallelism =
    file count and per-row memory = file size — right for media
    blobs, documented wrong for huge single files."""
    d = _sink_dir(spark, "binf")
    (
        t(spark, sf, "documents")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
        .select(
            F.concat_ws(
                "|", F.col("lang"), F.col("n_docs"), F.col("sum_chars")
            ).alias("value")
        )
        .repartition(2)
        .write.mode("overwrite")
        .text(d)
    )
    bf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "part-*")
        .load(d)
    )
    lines = bf.select(
        "path",
        "length",
        F.explode(
            F.split(F.decode(F.col("content"), "UTF-8"), "\n")
        ).alias("line"),
    ).filter(F.col("line") != "")
    wfile = Window.partitionBy("path")
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    per = lines.select(
        "line",
        (
            F.sum(F.octet_length("line") + 1).over(wfile)
            == F.max("length").over(wfile)
        ).alias("file_ok"),
    )
    parsed = per.select(
        F.split_part(F.col("line"), F.lit("|"), F.lit(1)).alias("lang"),
        F.split_part(F.col("line"), F.lit("|"), F.lit(2))
        .cast("long")
        .alias("n_docs"),
        F.split_part(F.col("line"), F.lit("|"), F.lit(3))
        .cast("long")
        .alias("sum_chars"),
        F.md5(F.col("line")).alias("payload_md5"),
        F.min(F.col("file_ok").cast("int")).over(wall).alias("min_ok"),
    )
    return parsed.select(
        "lang",
        "n_docs",
        "sum_chars",
        "payload_md5",
        (F.col("min_ok") == 1).alias("bytes_ok"),
    )


# ---------------------------------------------------------------------------
# PERMISSIVE CSV with corrupt-record routing — the dirty-feed face
# ---------------------------------------------------------------------------
@q(
    "csv_permissive",
    """
    WITH lab AS (
      SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             o_orderpriority,
             substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) < '2' AS bad
      FROM orders)
    SELECT CAST(COUNT(*) FILTER (WHERE NOT bad) AS BIGINT) AS n_clean,
           CAST(COUNT(*) FILTER (WHERE bad) AS BIGINT) AS n_corrupt,
           CAST(SUM(cents) FILTER (WHERE NOT bad) AS BIGINT)
             AS clean_cents
    FROM lab
    """,
)
def csv_permissive(spark, sf):
    """PERMISSIVE-mode CSV ingestion with corrupt-record routing —
    the posture every real feed needs (a 100-TB crawl drop ALWAYS
    contains broken lines; FAILFAST kills the job on the first one,
    DROPMALFORMED silently eats data — PERMISSIVE quarantines them
    into `_corrupt_record` so the pipeline can both proceed AND
    account). The face writes one CSV line per order, deliberately
    corrupting a deterministic 1/16 slice (md5(o_orderkey) first
    hex < '2' — the sample_hash coin) by smashing a non-numeric
    into the BIGINT column; the read declares the schema PLUS the
    corrupt column, and the gated row reconciles clean count,
    corrupt count, and the clean-side money total against the
    relational replay of the same coin. Spark restriction honored:
    a query may not reference ONLY the corrupt column off a CSV
    scan — the aggregate touches the data columns too. Exact: money
    rides integer cents through the CSV as text."""
    d = _sink_dir(spark, "csvperm")
    bad = F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1) < "2"
    (
        t(spark, sf, "orders")
        .select(
            F.when(bad, F.lit("junk"))
            .otherwise(F.col("o_orderkey").cast("string"))
            .alias("k"),
            F.round(F.col("o_totalprice") * 100)
            .cast("long")
            .cast("string")
            .alias("c"),
            F.col("o_orderpriority").alias("p"),
        )
        .select(F.concat_ws(",", "k", "c", "p").alias("value"))
        .write.mode("overwrite")
        .text(d)
    )
    back = (
        spark.read.schema(
            "o_orderkey LONG, cents LONG, prio STRING, _bad_rec STRING"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad_rec")
        .csv(d)
    )
    # the CSV parser only parses REFERENCED columns (column pruning
    # reaches into the parser) — a corrupt value in an unreferenced
    # column is then never detected. The aggregate must touch every
    # data column or the quarantine silently under-counts (measured:
    # 0 corrupt rows out of 1948 until o_orderkey was referenced).
    clean = (
        F.col("_bad_rec").isNull()
        & F.col("o_orderkey").isNotNull()
        & F.col("prio").isNotNull()
    )
    return back.agg(
        F.count(F.when(clean, 1)).cast("long").alias("n_clean"),
        F.count(F.when(~clean, 1)).cast("long").alias("n_corrupt"),
        F.sum(F.when(clean, F.col("cents"))).cast("long").alias(
            "clean_cents"
        ),
    )


# ---------------------------------------------------------------------------
# PERMISSIVE JSON-lines — syntax-corruption quarantine
# ---------------------------------------------------------------------------
@q(
    "json_permissive",
    """
    WITH lab AS (
      SELECT event_id, user_id,
             substr(md5(CAST(event_id AS VARCHAR)), 1, 1) < '2' AS bad
      FROM events)
    SELECT CAST(COUNT(*) FILTER (WHERE NOT bad) AS BIGINT) AS n_clean,
           CAST(COUNT(*) FILTER (WHERE bad) AS BIGINT) AS n_corrupt,
           CAST(SUM(user_id) FILTER (WHERE NOT bad) AS BIGINT)
             AS clean_user_sum
    FROM lab
    """,
)
def json_permissive(spark, sf):
    """PERMISSIVE JSON-lines ingestion — csv_permissive's sibling for
    the OTHER dirty-feed class: SYNTAX corruption (truncated
    payloads from a killed producer, half-flushed buffers) rather
    than type mismatch. A deterministic 1/16 md5 slice of the
    events is serialized with its closing brace torn off; the read
    declares the schema plus `_corrupt_record`, and the gated row
    reconciles clean/corrupt counts and a clean-side checksum
    against the relational coin replay. The JSON parser shares the
    CSV parser's column-pruning trap for TYPE errors, but a
    SYNTACTICALLY broken line is flagged regardless of which
    columns are referenced — this face pins that distinction (the
    aggregate deliberately touches only a subset of columns and
    still counts every torn line). Empty corpus: (0, 0, NULL)."""
    d = _sink_dir(spark, "jsonperm")
    bad = F.substring(F.md5(F.col("event_id").cast("string")), 1, 1) < "2"
    payload = F.concat(
        F.lit('{"event_id": '),
        F.col("event_id").cast("string"),
        F.lit(', "user_id": '),
        F.col("user_id").cast("string"),
        F.lit(', "event_type": "'),
        F.col("event_type"),
        F.lit('"}'),
    )
    (
        t(spark, sf, "events")
        .select(
            F.when(bad, F.substring(payload, 1, 20))
            .otherwise(payload)
            .alias("value")
        )
        .write.mode("overwrite")
        .text(d)
    )
    back = (
        spark.read.schema(
            "event_id LONG, user_id LONG, event_type STRING, "
            "_bad_rec STRING"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad_rec")
        .json(d)
    )
    clean = F.col("_bad_rec").isNull()
    return back.agg(
        F.count(F.when(clean, 1)).cast("long").alias("n_clean"),
        F.count(F.when(~clean, 1)).cast("long").alias("n_corrupt"),
        F.sum(F.when(clean, F.col("user_id")))
        .cast("long")
        .alias("clean_user_sum"),
    )


# ---------------------------------------------------------------------------
# dynamic partition overwrite — surgical partition replacement
# ---------------------------------------------------------------------------
@q(
    "hive_dynamic_overwrite",
    """
    WITH kept AS (
      SELECT lang, doc_id FROM documents
      WHERE lang <> 'en'
         OR substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8')
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM kept GROUP BY lang
    """,
)
def hive_dynamic_overwrite(spark, sf):
    """DYNAMIC partition overwrite (partitionOverwriteMode=dynamic)
    — the surgical lake maintenance primitive: rewrite exactly the
    partitions present in the incoming frame and leave every other
    partition untouched. In STATIC mode (the default) the same
    mode("overwrite") write would TRUNCATE THE WHOLE TABLE first —
    the classic footgun that deletes every other language's data
    during a single-language backfill; this face is the regression
    pin that the engine's layout path gets it right. Sequence:
    write the full lang-partitioned table, then overwrite ONLY the
    'en' partition with its deterministic md5 half; the gated
    rollup proves 'en' shrank to the half while every other
    partition survived byte-for-byte (the id checksum pins the
    surviving SETS, not just counts). The mode rides the writer
    option, not a session config — per-job semantics, no global
    state leaked into sibling faces."""
    d = _sink_dir(spark, "dynover")
    docs = t(spark, sf, "documents").select("doc_id", "lang")
    docs.write.mode("overwrite").partitionBy("lang").parquet(d)
    half_en = docs.filter(
        (F.col("lang") == "en")
        & (
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
            < "8"
        )
    )
    (
        half_en.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("lang")
        .parquet(d)
    )
    back = spark.read.schema("doc_id long, lang string").parquet(d)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("doc_id").cast("long").alias("id_sum"),
    )


# ---------------------------------------------------------------------------
# corrupt-file tolerance — ignoreCorruptFiles over a poisoned directory
# ---------------------------------------------------------------------------
@q(
    "scan_ignore_corrupt",
    """
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM documents GROUP BY lang
    """,
)
def scan_ignore_corrupt(spark, sf):
    """ignoreCorruptFiles over a directory poisoned with a
    truncated/garbage `.parquet` — the FILE-level dirty-lake face
    completing the tolerance ladder (csv_permissive and
    json_permissive quarantine bad ROWS; a half-uploaded or
    bitrotted object kills the whole job without this option). The
    face re-sinks the documents table, drops a garbage part file
    beside it, and reads back with an EXPLICIT schema (planning
    never touches the poisoned footer) + ignoreCorruptFiles, which
    skips the file at execution when its footer read throws. The
    per-lang id-sum gated against the original proves tolerance is
    surgical: every good row survives, nothing is double-read. The
    production caveat the docstring must carry: this option also
    silently eats REAL corruption, so lakes pair it with a manifest
    row-count reconciliation (jobs/compact.py's conservation gate)."""
    import os

    d = _sink_dir(spark, "poison")
    (
        t(spark, sf, "documents")
        .select("doc_id", "lang")
        .write.mode("overwrite")
        .parquet(d)
    )
    with open(os.path.join(d, "part-99999-garbage.parquet"), "wb") as fh:
        fh.write(b"PAR1 this is not a parquet file" * 8)
    back = (
        spark.read.option("ignoreCorruptFiles", "true")
        .schema("doc_id long, lang string")
        .parquet(d)
    )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("doc_id").cast("long").alias("id_sum"),
    )


# ---------------------------------------------------------------------------
# directory-glob scan — path-level pruning with partition recovery
# ---------------------------------------------------------------------------
@q(
    "scan_glob",
    """
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents WHERE lang LIKE 'e%' GROUP BY lang
    """,
)
def scan_glob(spark, sf):
    """Directory-GLOB scan over a Hive-partitioned layout: documents
    written partitionBy(lang), read back with the glob path
    `.../lang=e*` plus basePath — the path-level pruning idiom for
    when the slice is a PATTERN of partitions rather than one value
    (hive_partition_prune covers lang = 'en'; a LIKE filter can't
    land in PartitionFilters as a single directory lookup, but the
    glob resolves it at FILE-LISTING time, before any footer is
    read — at 100 TB the listing is the whole cost difference).
    basePath is the load-bearing option: reading `lang=e*` subdirs
    directly would DROP the partition column (paths below the glob
    no longer look partitioned); declaring the parent as basePath
    re-attaches lang from the directory names, proven by the
    per-lang grouping hashing against the unpartitioned original.
    A glob that matches zero directories is a read-time error, not
    an empty relation — the empty-corpus guard returns the typed
    empty result instead (the new-tenant case)."""
    import glob as _glob

    d = _sink_dir(spark, "scanglob")
    t(spark, sf, "documents").write.mode("overwrite").partitionBy(
        "lang"
    ).parquet(d)
    out_ddl = "lang string, n_docs long, id_sum long, sum_chars long"
    if not _glob.glob(os.path.join(d, "lang=e*")):
        return spark.createDataFrame([], out_ddl)
    back = (
        spark.read.option("basePath", d)
        .schema(_DOCS_DDL)
        .parquet(os.path.join(d, "lang=e*"))
    )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("doc_id").cast("long").alias("id_sum"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
    )


# ---------------------------------------------------------------------------
# dynamic partition pruning — runtime dim filter prunes fact partitions
# ---------------------------------------------------------------------------
@q(
    "join_dpp",
    """
    SELECT CAST(year(o_orderdate) AS INT) AS oyear,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM orders
    WHERE year(o_orderdate) % 2 = 0
    GROUP BY 1
    """,
)
def join_dpp(spark, sf):
    """Dynamic partition pruning: the orders fact is laid out
    partitionBy(order year) and joined to a year dimension whose
    filter (even years) lives on a DIM attribute — static pruning
    can't see it, so Catalyst injects the dim's join keys as a
    runtime `dynamicpruning` subquery into the fact scan's
    PartitionFilters and the fact side never lists, let alone
    reads, the odd-year directories. This is THE star-schema scan
    economizer at 100 TB (hive_partition_prune covers the literal
    WHERE year = k; real dashboards filter on dim attributes —
    fiscal flags, seasons, holiday tables — and without DPP every
    such query scans the full fact). The dim is a real parquet scan
    (an inline VALUES would constant-fold past the mechanism); with
    the dim broadcast, Spark REUSES the broadcast as the pruning
    subquery, so DPP costs nothing extra. The twin inlines the
    dim predicate; hash equality proves pruning dropped no rows."""
    fact_dir = _sink_dir(spark, "dppfact")
    dim_dir = _sink_dir(spark, "dppdim")
    orders = t(spark, sf, "orders").withColumn(
        "oyear", F.year("o_orderdate").cast("int")
    )
    orders.write.mode("overwrite").partitionBy("oyear").parquet(fact_dir)
    orders.select("oyear").distinct().select(
        "oyear",
        F.when(F.pmod(F.col("oyear"), F.lit(2)) == 0, "even")
        .otherwise("odd")
        .alias("season"),
    ).write.mode("overwrite").parquet(dim_dir)
    fact = spark.read.schema("o_totalprice double, oyear int").parquet(
        fact_dir
    )
    # a literal equality on a dim attribute: the "likely selective"
    # filter shape Spark's PartitionPruning rule requires (a bare
    # boolean attribute does NOT qualify as a pruning filter)
    dim = (
        spark.read.parquet(dim_dir)
        .filter(F.col("season") == "even")
        .select("oyear")
    )
    return (
        fact.join(dim, "oyear")
        .groupBy("oyear")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )
    )


# ---------------------------------------------------------------------------
# modifiedAfter scan — mtime-windowed incremental file ingest
# ---------------------------------------------------------------------------
@q(
    "scan_modified_after",
    """
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM documents WHERE lang <> 'en' GROUP BY lang
    """,
)
def scan_modified_after(spark, sf):
    """mtime-windowed scan: two ingest batches land in ONE directory
    (English docs first, the rest later), the first batch's files
    are aged to an epoch-2000 mtime, and the reader uses
    modifiedAfter to pick up ONLY the newer batch — the
    zero-bookkeeping incremental-ingest idiom for feeds that drop
    files into a shared prefix (the poor man's streaming source:
    no checkpoint, no manifest, the filesystem's own mtime is the
    cursor; Structured Streaming's file source is the stateful big
    sibling). modifiedAfter applies at FILE-LISTING time like the
    glob face — pruned files are never opened. The twin selects the
    second batch by its defining predicate (lang <> 'en'); hash
    equality proves the mtime window selected exactly the files it
    should. The directory-listing mutation is driver-side test
    plumbing; the read path is the production surface."""
    d = _sink_dir(spark, "modafter")
    docs = t(spark, sf, "documents")
    docs.filter(F.col("lang") == "en").write.mode("append").parquet(d)
    old = 946684800  # 2000-01-01T00:00:00Z
    for fn in os.listdir(d):
        os.utime(os.path.join(d, fn), (old, old))
    docs.filter(F.col("lang") != "en").write.mode("append").parquet(d)
    back = (
        spark.read.schema(_DOCS_DDL)
        .option("modifiedAfter", "2020-01-01T00:00:00")
        .parquet(d)
    )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("doc_id").cast("long").alias("id_sum"),
    )


# ---------------------------------------------------------------------------
# compression-codec round trips — zstd and gzip lose nothing
# ---------------------------------------------------------------------------
@q(
    "parquet_codecs",
    """
    SELECT 'gzip' AS codec, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    UNION ALL
    SELECT 'zstd', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(doc_id) AS BIGINT), CAST(SUM(n_chars) AS BIGINT)
    FROM documents
    """,
)
def parquet_codecs(spark, sf):
    """Compression-codec round trips: the documents table written
    with zstd and with gzip, each read back and aggregated — the
    codec knob is the single biggest storage/scan-cost lever on a
    100-TB lake (zstd is the modern default: gzip-class ratios at
    several-fold faster decompression; snappy trades ratio for
    speed), and the one thing a codec change must never touch is
    the DATA, which is exactly what hashing both reads against the
    raw original proves. The codec is a WRITER property — readers
    dispatch per page from the file metadata, so mixed-codec
    directories read fine and a lake can migrate codecs file by
    file during routine compaction (compact_plan's moment) rather
    than in one rewrite. Each leg is one write + one
    map-side-combinable agg; codec choice changes bytes and CPU,
    never the plan shape."""
    out = []
    for codec in ("gzip", "zstd"):
        d = _sink_dir(spark, f"codec_{codec}")
        t(spark, sf, "documents").write.mode("overwrite").option(
            "compression", codec
        ).parquet(d)
        back = spark.read.schema(_DOCS_DDL).parquet(d)
        out.append(
            back.agg(
                F.lit(codec).alias("codec"),
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("doc_id").cast("long").alias("id_sum"),
                F.sum("n_chars").cast("long").alias("sum_chars"),
            )
        )
    return out[0].unionByName(out[1])


# ---------------------------------------------------------------------------
# unionByName with allowMissingColumns — operator-level schema drift
# ---------------------------------------------------------------------------
@q(
    "set_union_evolve",
    """
    SELECT 'v1' AS gen, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(lang) AS BIGINT) AS n_lang,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    UNION ALL
    SELECT 'v2', CAST(COUNT(*) AS BIGINT),
           CAST(0 AS BIGINT), CAST(SUM(n_chars) AS BIGINT)
    FROM documents
    """,
)
def set_union_evolve(spark, sf):
    """unionByName(allowMissingColumns=True) across two schema
    generations — the OPERATOR-level schema-drift union
    (parquet_merge_schema handles drift at the SOURCE via footer
    union; this is the in-flight version for combining a live
    DataFrame with an older extract whose columns differ): v1
    carries (doc_id, lang, n_chars), v2 dropped lang and added a
    quality column; the name-aligned union null-fills each side's
    missing columns. The trap it guards: plain union() aligns BY
    POSITION and would silently zip lang against quality — a
    corruption no error surfaces; by-name alignment is the only
    safe spelling once schemas drift. COUNT(lang) proves the
    null-fill landed exactly on v2's rows; the twin reproduces
    both generations from the original table."""
    d = t(spark, sf, "documents")
    v1 = d.select("doc_id", "lang", "n_chars").withColumn(
        "gen", F.lit("v1")
    )
    v2 = d.select(
        "doc_id", "n_chars", (F.col("n_chars") > 200).alias("quality")
    ).withColumn("gen", F.lit("v2"))
    u = v1.unionByName(v2, allowMissingColumns=True)
    return u.groupBy("gen").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count("lang").cast("long").alias("n_lang"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
    )


# ---------------------------------------------------------------------------
# INT96 legacy timestamps — Hive/Impala interop round trip
# ---------------------------------------------------------------------------
@q(
    "parquet_int96",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(epoch_us(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sum_us,
           CAST(MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS BIGINT) AS min_us
    FROM events WHERE ts IS NOT NULL GROUP BY event_type
    """,
)
def parquet_int96(spark, sf):
    """INT96 timestamp round trip — the legacy parquet encoding
    Hive/Impala-era feeds still emit and expect
    (outputTimestampType=INT96 vs the modern TIMESTAMP_MICROS):
    events timestamps written as 12-byte INT96, read back, reduced
    to exact epoch-microsecond aggregates against the original.
    INT96 is the interop tax of a 100-TB lake fed by older
    warehouses — a pipeline that can't write it can't hand data
    back to them; one that reads it wrong shifts every timestamp
    by the session zone. The conf is set around the WRITE only and
    restored in a finally (writer property, not session state);
    the NTZ source column casts to TIMESTAMP first (identity under
    the UTC-pinned session — the unix_micros discipline), because
    INT96 encodes an instant. Epoch sums are exact BIGINTs — any
    zone shift or precision loss flips the hash."""
    d = _sink_dir(spark, "int96")
    key = "spark.sql.parquet.outputTimestampType"
    prev = spark.conf.get(key)
    spark.conf.set(key, "INT96")
    try:
        t(spark, sf, "events").filter(F.col("ts").isNotNull()).select(
            "event_type", F.col("ts").cast("timestamp").alias("ts")
        ).write.mode("overwrite").parquet(d)
    finally:
        spark.conf.set(key, prev)
    back = spark.read.schema("event_type string, ts timestamp").parquet(d)
    us = F.unix_micros(F.col("ts"))
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(us).cast("long").alias("sum_us"),
        F.min(us).cast("long").alias("min_us"),
    )


# ---------------------------------------------------------------------------
# nested-column pruning — read one leaf of a struct, not the struct
# ---------------------------------------------------------------------------
@q(
    "scan_nested_prune",
    """
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents WHERE source = 'src7' GROUP BY lang
    """,
)
def scan_nested_prune(spark, sf):
    """Nested-column pruning + struct-field filter pushdown: the
    documents table re-written with its metadata packed into a
    struct (meta.lang, meta.source, meta.n_chars — the shape crawl
    sidecars and protobuf-derived feeds actually have), then read
    with a filter on ONE leaf and a projection of TWO — and the
    scan must read exactly those leaves, not the whole struct
    (ReadSchema shows the pruned struct; the source = 'web'
    predicate reaches PushedFilters as a nested-field filter).
    At 100 TB with fat metadata structs (image EXIF, WARC headers)
    the difference between leaf-reads and struct-reads is the
    whole scan budget; Spark's nestedSchemaPruning is ON by
    default but silently lost if the query passes the struct
    whole — this face pins the plan shape (audit) and the values
    (gate). The payload column (text) rides along UNREAD — its
    absence from ReadSchema is the proof."""
    d = _sink_dir(spark, "nested")
    t(spark, sf, "documents").select(
        "doc_id",
        "text",
        F.struct("lang", "source", "n_chars").alias("meta"),
    ).write.mode("overwrite").parquet(d)
    back = spark.read.schema(
        "doc_id long, text string, "
        "meta struct<lang:string,source:string,n_chars:long>"
    ).parquet(d)
    return (
        back.filter(F.col("meta.source") == "src7")
        .groupBy(F.col("meta.lang").alias("lang"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("meta.n_chars").cast("long").alias("sum_chars"),
        )
    )


# ---------------------------------------------------------------------------
# DROPMALFORMED — the silent-drop CSV mode, with its count pinned
# ---------------------------------------------------------------------------
@q(
    "csv_dropmalformed",
    """
    WITH d AS (
      SELECT doc_id, n_chars,
             substr(md5('cm:' || CAST(doc_id AS VARCHAR)), 1, 1) < '2'
               AS corrupt
      FROM documents)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN corrupt THEN 0 ELSE 1 END) AS BIGINT)
             AS n_kept,
           CAST(SUM(CASE WHEN corrupt THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dropped,
           CAST(SUM(CASE WHEN corrupt THEN 0 ELSE n_chars END)
                AS BIGINT) AS kept_chars
    FROM d
    """,
)
def csv_dropmalformed(spark, sf):
    """CSV mode=DROPMALFORMED with its drop count PINNED — the
    third member of the tolerance ladder's CSV rung
    (csv_permissive quarantines corrupt rows into a column,
    FAILFAST kills the job, DROPMALFORMED silently discards), and
    'silently' is the operational hazard this face converts into a
    number: rows are deterministically corrupted (md5 coin: the
    numeric n_chars field becomes junk on ~1/8 of rows), the file
    is read in DROPMALFORMED mode, and the twin computes exactly
    which rows a correct implementation must keep — any
    over-eager or under-eager drop flips counts AND the kept-chars
    sum. The csv_permissive lesson still binds: the parser
    validates only REFERENCED columns, so the aggregate touches
    every data column. Use this mode only with such an
    accounting; unaudited DROPMALFORMED is how corpora lose 3% of
    rows without anyone noticing."""
    d = _sink_dir(spark, "dropmal")
    docs = t(spark, sf, "documents").select(
        "doc_id",
        F.when(
            F.substring(
                F.md5(F.concat(F.lit("cm:"), F.col("doc_id").cast("string"))),
                1,
                1,
            )
            < "2",
            F.lit("JUNK"),
        )
        .otherwise(F.col("n_chars").cast("string"))
        .alias("n_chars_s"),
    )
    docs.write.mode("overwrite").options(header=True).csv(d)
    back = (
        spark.read.options(header=True, mode="DROPMALFORMED")
        .schema("doc_id long, n_chars_s long")
        .csv(d)
    )
    kept = back.agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.sum("n_chars_s").cast("long").alias("kept_chars"),
    )
    total = t(spark, sf, "documents").count()
    return kept.select(
        F.lit(total).cast("long").alias("n_total"),
        "n_kept",
        (F.lit(total) - F.col("n_kept")).cast("long").alias("n_dropped"),
        "kept_chars",
    ).select("n_total", "n_kept", "n_dropped", "kept_chars")


# ---------------------------------------------------------------------------
# AQE skew-join split — the runtime answer to hot-key joins
# ---------------------------------------------------------------------------
@q(
    "join_skew_aqe",
    """
    SELECT CAST(64 * COUNT(*) AS BIGINT) AS n,
           CAST(64 * SUM(event_id
                 + length(CASE WHEN event_id % 10 < 8
                               THEN 'hot' ELSE event_type END))
             AS BIGINT) AS s
    FROM events
    """,
)
def join_skew_aqe(spark, sf):
    """AQE SKEW-JOIN splitting actually firing — the runtime
    mechanism that saves a hot-key join at 100 TB, demonstrated the
    way join_dpp demonstrates DPP: a deliberately skewed fact (80%
    of events collapse onto one 'hot' key, x64 amplified) sort-merge
    joins a disk-resident dimension, and AQE splits the oversized
    reduce partition into per-map chunks, replicating the matching
    dim rows (`SortMergeJoin(skew=true)` + `AQEShuffleRead skewed`,
    pinned by audit #68 / tests). Two shape requirements this face
    documents because both silently disable the rule: (a) the
    OptimizeSkewedJoin pattern needs shuffle->sort DIRECTLY under
    the join on BOTH sides, so the dim arrives from a parquet
    snapshot, not through a distinct-aggregate leg; (b) splitting is
    map-chunk-granular, so a single-map-task input cannot split —
    the fact is pre-spread across 8 map tasks (a multi-file input at
    scale gives this for free). The skew thresholds are scaled to
    fixture bytes inside the face (set/restored in finally, the
    parquet_int96 discipline — the 256MB defaults are right at
    cluster scale and unreachable in a sandbox); AQE changes
    PARTITIONING, never values, so the twin is the closed form of
    the amplified join (every amp row matches exactly one dim row).
    The aggregate is executed INSIDE the conf scope via
    parquet_checkpoint — a lazily returned plan would execute after
    the finally restored the defaults and the split would silently
    not fire."""
    import os
    import tempfile

    from ..operators.dedup import parquet_checkpoint

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            "1KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.5",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        e = t(spark, sf, "events").select(
            F.when(F.col("event_id") % 10 < 8, F.lit("hot"))
            .otherwise(F.col("event_type"))
            .alias("k"),
            "event_id",
        )
        amp = e.select(
            "k",
            "event_id",
            F.explode(F.sequence(F.lit(1), F.lit(64))).alias("rep"),
        ).repartition(8)
        with tempfile.TemporaryDirectory(prefix="join_skew_dim_") as tmp:
            dimp = os.path.join(tmp, "dim")
            e.select("k").distinct().withColumn(
                "tag", F.length("k")
            ).write.parquet(dimp)
            dim = spark.read.parquet(dimp)
            out = amp.join(dim, "k").agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(F.col("event_id") + F.col("tag"))
                .cast("long")
                .alias("s"),
            )
            return parquet_checkpoint(out, "join_skew_aqe_final")
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# ---------------------------------------------------------------------------
# Catalyst-injected runtime bloom filter — InjectRuntimeFilter actually fires
# ---------------------------------------------------------------------------
@q(
    "join_runtime_bloom",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COALESCE(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)),
                         0) AS BIGINT) AS rev_cents,
           TRUE AS bloom_injected
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    WHERE o_orderpriority = '1-URGENT'
    """,
)
def join_runtime_bloom(spark, sf):
    """Catalyst's OWN runtime bloom filter (InjectRuntimeFilter,
    Spark 3.3+): on a shuffle join with a selective dim filter, the
    optimizer plants ``bloom_filter_agg`` over the dim keys and a
    ``might_contain`` predicate on the FACT side's scan — rows that
    cannot join are dropped before the shuffle, the engine-native
    version of what the manual join_bloom face builds by hand with
    md5 bitmap literals. The injected filter is false-positive-only,
    so values are provably identical with or without it; what is
    gated is the MECHANISM, ridden into the output as the
    plan-derived ``bloom_injected`` boolean (the scan_agg_pushdown
    discipline — a silent fallback to the uninjected plan fails the
    hash). The sandbox's tables sit under the 10 GB
    applicationSideScanSizeThreshold, so the face lowers it (and
    disables broadcast so a shuffle join exists for the filter to
    protect — at real scale both happen by themselves); confs are
    scoped via the eager-checkpoint-then-restore idiom
    (scan_bucket_prune). At 100 TB this is the free 5-50x fact-scan
    reduction on every selective dim join that is too big to
    broadcast but too selective to shuffle whole."""
    from ..operators.dedup import parquet_checkpoint

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "1KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        fact = t(spark, sf, "lineitem").select(
            "l_orderkey", "l_extendedprice"
        )
        dim = (
            t(spark, sf, "orders")
            .filter(F.col("o_orderpriority") == "1-URGENT")
            .select("o_orderkey")
        )
        j = fact.join(
            dim, fact.l_orderkey == dim.o_orderkey
        ).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.coalesce(
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")),
                F.lit(0),
            )
            .cast("long")
            .alias("rev_cents"),
        )
        injected = (
            "might_contain"
            in j._jdf.queryExecution().optimizedPlan().toString()
        )
        out = j.select(
            "n", "rev_cents", F.lit(injected).alias("bloom_injected")
        )
        return parquet_checkpoint(out, "runtime_bloom_out")
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# ---------------------------------------------------------------------------
# chunked range join — interval overlap as equi-join on time chunks
# ---------------------------------------------------------------------------
_CHUNK_US = 3600 * 1000000  # 1-hour chunks == the window length


@q(
    "join_range_chunked",
    """
    WITH ev AS (
      SELECT event_id, event_type, epoch_us(ts) AS us,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
    w AS (
      SELECT event_id AS incident_id, us AS t0,
             us + 3600000000 AS t1
      FROM ev WHERE event_type = 'error'),
    hit AS (
      SELECT w.incident_id, e.cents
      FROM w JOIN ev e ON e.us >= w.t0 AND e.us <= w.t1)
    SELECT incident_id,
           CAST(COUNT(*) AS BIGINT) AS n_within,
           CAST(SUM(cents) AS BIGINT) AS cents_within
    FROM hit GROUP BY incident_id
    ORDER BY n_within DESC, incident_id LIMIT 20
    """,
)
def join_range_chunked(spark, sf):
    """Range join by CHUNKING: every error event opens a 1-hour
    incident window and the face counts ALL events falling inside
    each window — a pure interval-overlap join with NO equi-key,
    which planned naively is a broadcast-nested-loop / cartesian
    scan (|errors| x |events| predicate evaluations, the classic
    range-join scale-killer). The chunk trick makes it an EQUI-join:
    time splits into fixed chunks the size of the window, each
    window expands to the <= 2 chunks it touches (explode of a
    bounded sequence — the events_rolling_dau fan-out), each probe
    event maps to its single chunk, the join runs hash/merge on the
    chunk id, and the original range predicate stays as a cheap
    RESIDUAL filter. Each (window, event) pair meets in EXACTLY one
    chunk (the event's own), so no post-join dedup is needed — the
    correctness subtlety that makes people wrongly add a DISTINCT.
    This is precisely what engine-level range-join optimizations
    (e.g. binned range joins) do internally; audit #72 pins the
    absence of any nested-loop operator. The twin runs the honest
    unchunked range join — value equality proves chunking is pure
    plan optimization. Window length == chunk size keeps the
    expansion factor at <= 2; a window of W with chunk C expands to
    ceil(W/C)+1 chunks, the knob to turn for mixed window sizes.
    unix_micros needs the NTZ->TIMESTAMP cast (house rule) and
    matches DuckDB's epoch_us under the UTC-pinned session."""
    ev = (
        t(spark, sf, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .select(
            "event_id",
            "event_type",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    w = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        F.col("us").alias("t0"),
        (F.col("us") + F.lit(_CHUNK_US)).alias("t1"),
    )
    wch = w.select(
        "incident_id",
        "t0",
        "t1",
        F.explode(
            F.sequence(
                F.expr(f"t0 div {_CHUNK_US}"),
                F.expr(f"t1 div {_CHUNK_US}"),
            )
        ).alias("chunk"),
    )
    ech = ev.select(
        "us", "cents", F.expr(f"us div {_CHUNK_US}").alias("chunk")
    )
    hit = wch.join(ech, "chunk").filter(
        (F.col("us") >= F.col("t0")) & (F.col("us") <= F.col("t1"))
    )
    return (
        hit.groupBy("incident_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_within"),
            F.sum("cents").cast("long").alias("cents_within"),
        )
        .orderBy(F.desc("n_within"), "incident_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# variant_explode — schema-free JSON key census over the props column
# ---------------------------------------------------------------------------
@q(
    "json_variant_census",
    r"""
    WITH kv AS (
      SELECT regexp_extract(props, '"([^"]+)" *:', 1) AS key,
             TRY_CAST(regexp_extract(props, ': *(-?[0-9]+) *\}$', 1)
                      AS BIGINT) AS ival
      FROM events WHERE props IS NOT NULL)
    SELECT key,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(ival) AS BIGINT) AS n_int,
           CAST(COALESCE(SUM(ival), 0) AS BIGINT) AS int_sum
    FROM kv GROUP BY key
    """,
)
def json_variant_census(spark, sf):
    """Schema-free JSON key census via the VARIANT path:
    ``parse_json`` (binary variant, no schema declared) +
    ``variant_explode`` (lateral TVF over the object's key/value
    pairs) + per-key type counting — the first question a lake asks
    of a semi-structured column it does NOT control ('what keys
    exist, how often, what types, what magnitudes') and the reason
    VARIANT exists: from_json needs the schema up front, the
    variant census DISCOVERS it. Integer-typed values are summed
    through try_variant_get (non-integer values contribute NULL, not
    an error — tolerant by construction, the try_* ladder). The
    sandbox DuckDB build has no json extension (json_each is
    unavailable and the driver runs twins verbatim), so the twin
    parses the fixture's FLAT single-key objects with regexp — exact
    on this corpus, while the Spark side stays general JSON.
    Scale shape: parse once, one Generate for the lateral explode,
    one aggregate keyed on the (tiny) key census — and the variant
    binary's per-row parse is the cost from_json would pay anyway,
    paid WITHOUT knowing the schema."""
    return spark.sql(
        f"""
        WITH src AS (
          SELECT parse_json(props) AS j
          FROM parquet.`{sf}/events.parquet`
          WHERE props IS NOT NULL),
        kv AS (
          SELECT v.key AS key,
                 try_variant_get(v.value, '$', 'bigint') AS ival
          FROM src, LATERAL variant_explode(j) v)
        SELECT key, COUNT(*) AS n,
               COUNT(ival) AS n_int,
               COALESCE(SUM(ival), CAST(0 AS BIGINT)) AS int_sum
        FROM kv GROUP BY key
        """
    )


# ---------------------------------------------------------------------------
# type-widening read — int32/float32 files read under a long/double schema
# ---------------------------------------------------------------------------
@q(
    "scan_type_widening",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COALESCE(SUM(event_id), 0) AS BIGINT) AS id_sum,
           CAST(COALESCE(SUM(CAST(round(
                 CAST(CAST(value AS REAL) AS DOUBLE) * 100)
                 AS BIGINT)), 0) AS BIGINT) AS cents_sum,
           TRUE AS widened
    FROM events WHERE event_id <= 2147483647 AND value IS NOT NULL
    """,
)
def scan_type_widening(spark, sf):
    """TYPE-WIDENING read: parquet files written INT32/FLOAT32 read
    back under an explicit LONG/DOUBLE schema — the schema-evolution
    move every long-lived lake eventually needs (ids outgrow int32,
    measures move to double) and the one that historically threw
    SCHEMA_MISMATCH; Spark's vectorized reader now upcasts
    int->long and float->double per-file, so OLD files stay
    readable under the NEW table schema with no rewrite — at 100 TB
    'widen the declared schema' must never mean 'rewrite the lake'.
    The face writes a narrowed snapshot (event_id as int, value as
    float), reads it back under the widened schema, and aggregates;
    the float32 path is the subtle half of the twin — DuckDB
    reproduces the precision truncation with CAST(value AS REAL)
    before widening, because sum-of-cents over float32-rounded
    values differs from the double original (that difference being
    REAL is exactly why the face pins it). The `widened` certificate
    rides the read-back dataframe's own schema. Eager checkpoint +
    temp dir under spark.local.dir (scan_bucket_prune idiom)."""
    import tempfile

    from ..operators.dedup import parquet_checkpoint

    base = spark.conf.get("spark.local.dir", "/tmp").split(",")[0]
    root = tempfile.mkdtemp(prefix="qio_widen_", dir=base)
    narrow = f"{root}/narrow"
    (
        t(spark, sf, "events")
        .filter(
            (F.col("event_id") <= 2147483647)
            & F.col("value").isNotNull()
        )
        .select(
            F.col("event_id").cast("int").alias("event_id"),
            F.col("value").cast("float").alias("value"),
        )
        .write.mode("overwrite")
        .parquet(narrow)
    )
    back = spark.read.schema("event_id long, value double").parquet(
        narrow
    )
    widened = [f.dataType.simpleString() for f in back.schema.fields] == [
        "bigint",
        "double",
    ]
    out = back.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.coalesce(F.sum("event_id"), F.lit(0))
        .cast("long")
        .alias("id_sum"),
        F.coalesce(
            F.sum(F.round(F.col("value") * 100).cast("long")), F.lit(0)
        )
        .cast("long")
        .alias("cents_sum"),
        F.lit(widened).alias("widened"),
    )
    return parquet_checkpoint(out, "widen_out")


# ---------------------------------------------------------------------------
# wholetext read — one file = one row, the crawl-page ingestion shape
# ---------------------------------------------------------------------------
@q(
    "scan_wholetext",
    """
    WITH s AS (
      SELECT doc_id, text FROM documents
      WHERE doc_id % 101 = 0 AND text IS NOT NULL),
    h AS (
      SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || text),
                             1, 7))::UBIGINT AS hv
      FROM s)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COALESCE(SUM(hv), 0) AS BIGINT) AS digest
    FROM h
    """,
)
def scan_wholetext(spark, sf):
    """``wholetext`` — the text-source mode that reads EACH FILE as
    ONE row instead of one row per line: the ingestion shape for
    document stores where one file IS one document (crawl page
    dumps, extracted article files) and the only lossless way to
    read multi-line documents from plain text, where the default
    line mode shatters them (the text_roundtrip face needed hex
    armor for exactly that reason; wholetext needs none). The face
    round-trips a doc sample out through a doc_id-partitioned text
    sink (one single-row file per partition directory) and back via
    wholetext, recovering the document body EXACTLY — measured: the
    single-row-per-file text sink writes no trailing record
    separator, so no newline stripping is needed (the test pins
    byte equality); identity is certified by a
    28-bit-limb md5 digest over (doc_id, restored text) — the
    lake_content_digest discipline — against the twin computing the
    same digest from the source table directly. The read-back uses
    an EXPLICIT schema (value + the doc_id partition column) and
    pins partition-column recovery. Zero-doc totality needs a
    driver-side listing guard: with NO partition directories the
    text reader has nothing to discover, treats doc_id as a DATA
    column, and rejects BIGINT (UNSUPPORTED_DATA_TYPE_FOR_DATASOURCE
    — measured), so an empty write short-circuits to the literal
    empty census row the twin produces. Scale
    shape: one task per file on read — the wholetext contract also
    means ONE ROW PER TASK in memory, so at 100 TB it is for
    document-sized files, never log-sized ones."""
    import glob as _glob
    import tempfile

    from ..operators.dedup import parquet_checkpoint

    base = spark.conf.get("spark.local.dir", "/tmp").split(",")[0]
    root = tempfile.mkdtemp(prefix="qio_wholetext_", dir=base)
    out_dir = f"{root}/docs"
    (
        t(spark, sf, "documents")
        .filter((F.col("doc_id") % 101 == 0) & F.col("text").isNotNull())
        .select("text", "doc_id")
        .write.mode("overwrite")
        .partitionBy("doc_id")
        .text(out_dir)
    )
    if not _glob.glob(f"{out_dir}/doc_id=*"):
        return spark.range(1).select(
            F.lit(0).cast("long").alias("n_docs"),
            F.lit(0).cast("long").alias("digest"),
        )
    back = (
        spark.read.schema("value string, doc_id bigint")
        .option("wholetext", "true")
        .text(out_dir)
    )
    h = back.select(
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit(":"),
                        F.col("value"),
                    )
                ),
                1,
                7,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("hv")
    )
    out = h.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.coalesce(F.sum("hv"), F.lit(0)).cast("long").alias("digest"),
    )
    return parquet_checkpoint(out, "wholetext_out")


# ---------------------------------------------------------------------------
# XPath function family — structural extraction with an XPath sum()
# ---------------------------------------------------------------------------
@q(
    "xml_xpath",
    """
    WITH x AS (
      SELECT o_orderstatus AS status,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             o_orderkey % 5 AS q1, o_orderkey % 3 AS q2
      FROM orders)
    SELECT status,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS cents_sum,
           CAST(SUM(q1 + q2) AS BIGINT) AS qty_sum
    FROM x GROUP BY status
    """,
)
def xml_xpath(spark, sf):
    """The XPath function family (``xpath_long`` for scalar node
    extraction, ``xpath_double('sum(...)')`` for real XPath
    AGGREGATION inside one document) — the structural sibling of
    json_variant_census for the other half of the semi-structured
    web: each order renders as a small XML document with two nested
    line items, the price comes back via a node-path lookup and the
    quantity total via XPath's own sum() over the repeated <q>
    elements (the part a regexp cannot do safely — repetition with
    structure). The twin computes the same numbers straight from the
    source columns, so hash equality proves render -> xpath-extract
    is lossless end to end (the xml_roundtrip discipline at the
    FUNCTION level, no files involved). Map-side expressions into
    one status-keyed agg; at 100 TB this is the shape for sampling
    structured fields out of crawl-archived XML/HTML fragments
    without a parser UDF in the hot path."""
    x = t(spark, sf, "orders").select(
        F.col("o_orderstatus").alias("status"),
        F.concat(
            F.lit("<o><p>"),
            F.round(F.col("o_totalprice") * 100).cast("long").cast(
                "string"
            ),
            F.lit("</p><it><q>"),
            (F.col("o_orderkey") % 5).cast("string"),
            F.lit("</q></it><it><q>"),
            (F.col("o_orderkey") % 3).cast("string"),
            F.lit("</q></it></o>"),
        ).alias("xml"),
    )
    e = x.select(
        "status",
        F.expr("xpath_long(xml, '/o/p')").alias("cents"),
        F.expr("xpath_double(xml, 'sum(/o/it/q)')")
        .cast("long")
        .alias("qty"),
    )
    return e.groupBy("status").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("cents_sum"),
        F.sum("qty").cast("long").alias("qty_sum"),
    )


# ---------------------------------------------------------------------------
# AQE runtime broadcast conversion — SMJ statically, BHJ once sizes are real
# ---------------------------------------------------------------------------
@q(
    "join_aqe_bhj_convert",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COALESCE(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)),
                         0) AS BIGINT) AS rev_cents,
           TRUE AS smj_initial, TRUE AS bhj_final
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE o_orderpriority = '1-URGENT'
    """,
)
def join_aqe_bhj_convert(spark, sf):
    """AQE's flagship move, pinned as a face: the STATIC planner is
    told it may never broadcast (autoBroadcastJoinThreshold = -1 —
    the defensive production setting when size ESTIMATES cannot be
    trusted: estimates come from file sizes and propagate wrongly
    through filters/aggs), so the initial plan is a sort-merge join;
    at runtime the dim side's ACTUAL shuffle bytes come in under
    spark.sql.adaptive.autoBroadcastJoinThreshold and AQE rewrites
    the running query to a broadcast join mid-flight. That split —
    distrust estimates, trust measurements — is exactly how a
    100-TB job gets broadcast wins without broadcast OOM risk, and
    it is a RUNTIME effect no EXPLAIN of the initial plan can show:
    the face executes eagerly, captures the initial plan's
    SortMergeJoin and the final adaptive plan's BroadcastHashJoin
    (+ isFinalPlan=true), and rides both booleans into the hash
    (the scan_agg_pushdown discipline). Values are the plain join
    aggregate either way — join strategy is value-neutral, which is
    what makes the mechanism safely hash-gatable."""
    from ..operators.dedup import parquet_checkpoint

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "10MB",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        fact = t(spark, sf, "lineitem").select(
            "l_orderkey", "l_extendedprice"
        )
        dim = (
            t(spark, sf, "orders")
            .filter(F.col("o_orderpriority") == "1-URGENT")
            .select("o_orderkey")
        )
        j = fact.join(dim, fact.l_orderkey == dim.o_orderkey).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.coalesce(
                F.sum(
                    F.round(F.col("l_extendedprice") * 100).cast("long")
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("rev_cents"),
        )
        init = j._jdf.queryExecution().executedPlan().toString()
        smj_initial = (
            "SortMergeJoin" in init and "BroadcastHashJoin" not in init
        )
        j.collect()  # drive AQE to the final plan
        final = j._jdf.queryExecution().executedPlan().toString()
        bhj_final = (
            "BroadcastHashJoin" in final and "isFinalPlan=true" in final
        )
        out = j.select(
            "n",
            "rev_cents",
            F.lit(smj_initial).alias("smj_initial"),
            F.lit(bhj_final).alias("bhj_final"),
        )
        return parquet_checkpoint(out, "aqe_bhj_out")
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# ---------------------------------------------------------------------------
# wave 102: ignoreMissingFiles — objects deleted between listing and
# execution
# ---------------------------------------------------------------------------
@q(
    "scan_ignore_missing",
    """
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           TRUE AS survived_listing_race
    FROM documents WHERE doc_id % 2 = 0 GROUP BY lang
    """,
)
def scan_ignore_missing(spark, sf):
    """ignoreMissingFiles — the third rung of the file-tolerance
    ladder (ignoreCorruptFiles skips files whose BYTES are bad; this
    skips files that VANISH between listing and task execution — the
    lifecycle-policy / compaction race every long-running job on a
    live 100-TB lake eventually loses). The face reproduces the race
    deterministically: sink the even/odd doc_id halves as two named
    part files, force the file INDEX to materialize (listing),
    delete the odd file from under the plan, then execute — with the
    option on, the dead file's tasks are dropped instead of failing
    the stage, and the surviving aggregate equals the even half
    exactly (the twin's WHERE doc_id % 2 = 0), proving the skip is
    surgical. Executes eagerly behind a checkpoint because the race
    window is inside the face by construction. Same production
    caveat as ignoreCorruptFiles: the option also eats REAL losses —
    pair it with manifest row-count reconciliation."""
    import glob
    import os
    import shutil

    from ..operators.dedup import parquet_checkpoint

    d = _sink_dir(spark, "missing")
    os.makedirs(d, exist_ok=True)
    for name in os.listdir(d):
        os.remove(os.path.join(d, name))
    for half, fname in ((0, "00_even.parquet"), (1, "01_odd.parquet")):
        sdir = d + f"_stage{half}"
        (
            t(spark, sf, "documents")
            .select("doc_id", "lang")
            .filter(F.col("doc_id") % 2 == half)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(sdir)
        )
        parts = glob.glob(os.path.join(sdir, "part-*.parquet"))
        if parts:
            shutil.copy(parts[0], os.path.join(d, fname))
    back = (
        spark.read.option("ignoreMissingFiles", "true")
        .schema("doc_id long, lang string")
        .parquet(d)
    )
    listed = back.inputFiles()  # materialize the file index
    gone = os.path.join(d, "01_odd.parquet")
    if os.path.exists(gone):
        os.remove(gone)
    survived = any(f.endswith("01_odd.parquet") for f in listed)
    out = back.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("doc_id").cast("long").alias("id_sum"),
    ).select(
        "lang",
        "n_docs",
        "id_sum",
        F.lit(bool(survived)).alias("survived_listing_race"),
    )
    return parquet_checkpoint(out, "ignore_missing_out")


# ---------------------------------------------------------------------------
# wave 108: localCheckpoint — built-in lineage truncation, and why
# the repo's parquet checkpoint is still the production choice
# ---------------------------------------------------------------------------
@q(
    "scan_local_checkpoint",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS cents,
           TRUE AS lineage_truncated
    FROM orders GROUP BY o_orderpriority
    """,
)
def scan_local_checkpoint(spark, sf):
    """``localCheckpoint(eager=True)`` — Spark's built-in lineage
    cut, the in-engine sibling of the repo's parquet_checkpoint
    discipline: after the call the plan bottoms out at the
    materialized RDD (pinned: no FileScan of orders remains in the
    returned plan — the `lineage_truncated` boolean rides the hash)
    and every downstream consumer reuses the computed rows instead
    of re-running the subtree — the cure for the measured
    multi-consumer double-scan class (stat_mutual_info lesson).
    Why the repo still prefers the parquet spelling for corpus-scale
    intermediates, documented here: localCheckpoint stores blocks on
    EXECUTORS (lost on executor death — an hours-long 100-TB job
    cannot re-derive truncated lineage, the failure is fatal by
    design), keeps deserialized rows on the JVM heap (the r2 GC-storm
    lesson that made .persist() SUPERLINEAR at 1.2M docs), and dies
    with the session; a parquet checkpoint is executor-loss-proof,
    columnar-compressed, and resumable. localCheckpoint's niche is
    small hot relations inside one job — exactly this 5-row
    rollup."""
    agg = (
        t(spark, sf, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )
    )
    lc = agg.localCheckpoint(eager=True)
    plan = lc._jdf.queryExecution().executedPlan().toString()
    truncated = "orders.parquet" not in plan
    return lc.select(
        "o_orderpriority",
        "n",
        "cents",
        F.lit(bool(truncated)).alias("lineage_truncated"),
    )


# ---------------------------------------------------------------------------
# wave 108: DataFrame.to(schema) — declarative schema reconciliation
# at the writer boundary
# ---------------------------------------------------------------------------
@q(
    "sql_schema_enforce",
    """
    SELECT CAST(p_size AS BIGINT) AS p_size,
           p_partkey,
           upper(p_brand) AS brand,
           TRUE AS schema_ok
    FROM part
    """,
)
def sql_schema_enforce(spark, sf):
    """``DataFrame.to(schema)`` — declarative schema reconciliation,
    the one-call writer-boundary contract (Spark 3.4): given a
    TARGET schema it reorders columns, applies safe upcasts (int ->
    bigint here — never a silent narrowing; an unsafe cast is an
    ANALYSIS error, not a runtime surprise), and matches names
    case-insensitively — replacing the hand-rolled select/cast
    chains every sink job accumulates. The face pins the reconciled
    schema EXACTLY (schema_ok = returned schema == target, riding
    the hash) and the values through the upcast; the twin is the
    explicit CAST spelling, which is also precisely what Catalyst
    lowers .to() into (Project over scan — map-only, pinned by the
    audit's Exchange=0). At 100 TB this is the cheap half of schema
    evolution: .to() standardizes what the job WRITES;
    parquet_merge_schema (footer-union) handles what it READS."""
    src = t(spark, sf, "part").select(
        "p_partkey",
        F.upper(F.col("p_brand")).alias("brand"),
        F.col("p_size"),
    )
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    target = StructType(
        [
            StructField("p_size", LongType()),
            StructField("p_partkey", LongType()),
            StructField("brand", StringType()),
        ]
    )
    out = src.to(target)
    ok = out.schema == target
    return out.select(
        "p_size",
        "p_partkey",
        "brand",
        F.lit(bool(ok)).alias("schema_ok"),
    )


# ---------------------------------------------------------------------------
# wave 112: recursiveFileLookup — flat-listing a nested non-partition
# directory tree
# ---------------------------------------------------------------------------
@q(
    "scan_recursive",
    """
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           TRUE AS deep_file_listed
    FROM documents GROUP BY lang
    """,
)
def scan_recursive(spark, sf):
    """``recursiveFileLookup=true`` — reading a directory tree whose
    nesting carries NO partition semantics (the layout every
    hand-rolled archiver, log shipper, and S3 sync job produces:
    files scattered at mixed depths under plain-named dirs). Spark's
    default listing treats subdirectories as partition-discovery
    candidates — plain names (no key=value) don't parse as
    partitions, so nested files are either missed or break
    inference; the option flips the lister to a flat recursive walk
    and explicitly DISABLES partition inference (the two are
    mutually exclusive by contract). The face plants the even doc_id
    half at the root and the odd half two directories deep, reads
    with the option plus an explicit schema (never infer on a mixed
    tree), and the twin is the whole table — equality proves the
    deep file was neither dropped nor double-counted; the
    `deep_file_listed` boolean (derived from inputFiles()) rides the
    hash. Eager + checkpoint because the staging tree is reclaimed
    on return (the scan_ignore_missing discipline). At 100 TB the
    flat walk is one LIST per prefix — same cost class as the
    default lister; what it costs you is partition PRUNING, so it is
    the ingest-once pattern, not the serving layout."""
    import glob
    import os
    import shutil

    from ..operators.dedup import parquet_checkpoint

    d = _sink_dir(spark, "recursive")
    shutil.rmtree(d, ignore_errors=True)
    deep = os.path.join(d, "sub", "deep")
    os.makedirs(deep, exist_ok=True)
    for half, dest in ((0, d), (1, deep)):
        sdir = d + f"_stage{half}"
        (
            t(spark, sf, "documents")
            .select("doc_id", "lang")
            .filter(F.col("doc_id") % 2 == half)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(sdir)
        )
        parts = glob.glob(os.path.join(sdir, "part-*.parquet"))
        if parts:
            shutil.copy(parts[0], os.path.join(dest, f"h{half}.parquet"))
    back = (
        spark.read.option("recursiveFileLookup", "true")
        .schema("doc_id long, lang string")
        .parquet(d)
    )
    saw_deep = any("sub/deep" in f for f in back.inputFiles())
    out = back.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("doc_id").cast("long").alias("id_sum"),
    ).select(
        "lang",
        "n_docs",
        "id_sum",
        F.lit(bool(saw_deep)).alias("deep_file_listed"),
    )
    return parquet_checkpoint(out, "scan_recursive_out")


# ---------------------------------------------------------------------------
# wave 121: pathGlobFilter — listing-time file selection
# ---------------------------------------------------------------------------
@q(
    "scan_path_glob_filter",
    """
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           TRUE AS junk_excluded
    FROM documents GROUP BY lang
    """,
)
def scan_path_glob_filter(spark, sf):
    """``pathGlobFilter`` — the LISTING-time rung of the
    file-tolerance ladder, below all three read-time rungs
    (ignoreCorruptFiles reads bytes and drops bad ones,
    ignoreMissingFiles tolerates vanishing files, PERMISSIVE parses
    bad records): a glob applied while ENUMERATING the directory,
    so excluded files cost nothing — no open, no footer read, no
    task. The face plants a data-bearing parquet part next to two
    landmines a live ingest dir always contains — a half-written
    `.tmp` spill (GARBAGE bytes: without the filter the read
    ERRORS, with ignoreCorruptFiles it would still be OPENED) and a
    zero-byte `_WIP` marker — reads with pathGlobFilter='*.parquet',
    and the twin is the whole table: equality proves selection
    happened at listing (the junk never became tasks), and the
    `junk_excluded` boolean (no junk path in inputFiles()) rides
    the hash. Eager + checkpoint (staging reclaimed on return).
    At 100 TB this is the difference between skipping a million
    temp files for free and paying a failed-read retry storm."""
    import glob
    import os
    import shutil

    from ..operators.dedup import parquet_checkpoint

    d = _sink_dir(spark, "pathglob")
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    sdir = d + "_stage"
    (
        t(spark, sf, "documents")
        .select("doc_id", "lang")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(sdir)
    )
    parts = glob.glob(os.path.join(sdir, "part-*.parquet"))
    if parts:
        shutil.copy(parts[0], os.path.join(d, "data.parquet"))
    with open(os.path.join(d, "spill-0001.tmp"), "wb") as fh:
        fh.write(b"\x00garbage-not-parquet\xff" * 64)
    open(os.path.join(d, "_WIP"), "wb").close()
    back = (
        spark.read.option("pathGlobFilter", "*.parquet")
        .schema("doc_id long, lang string")
        .parquet(d)
    )
    listed = back.inputFiles()
    junk_seen = any(
        f.endswith(("spill-0001.tmp", "_WIP")) for f in listed
    )
    out = back.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("doc_id").cast("long").alias("id_sum"),
    ).select(
        "lang",
        "n_docs",
        "id_sum",
        F.lit(not junk_seen).alias("junk_excluded"),
    )
    return parquet_checkpoint(out, "pathglob_out")


# ---------------------------------------------------------------------------
# wave 133: multi-path load — one reader over several roots
# ---------------------------------------------------------------------------
@q(
    "scan_multipath",
    """
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(event_id) AS BIGINT) AS id_sum,
           TRUE AS both_roots_listed
    FROM events GROUP BY event_type
    """,
)
def scan_multipath(spark, sf):
    """Multi-path load — ``spark.read.parquet(path_a, path_b)``,
    the one-reader-many-roots API every dated-directory layout
    leans on (`.../2024-01-01`, `.../2024-01-02`, ... passed as N
    roots): the listing unions the roots BEFORE planning, so the
    result is one scan relation with shared pushdown/pruning — not
    a DataFrame union of N reads (which plans N scans and defeats
    global file-size coalescing of splits across roots). The face
    splits events into two root directories on event_id parity,
    loads both roots in one call, and the twin is the whole table:
    equality proves no row was dropped or double-listed across
    roots; the boolean (inputFiles() shows files under BOTH roots)
    rides the hash. Eager + checkpoint (staging reclaimed on
    return). Scale note: N roots = N LIST calls but ONE job — the
    opposite trade of scan_recursive's single flat walk."""
    import os
    import tempfile

    from ..operators.dedup import parquet_checkpoint

    e = t(spark, sf, "events").select("event_id", "event_type")
    with tempfile.TemporaryDirectory(prefix="multipath_") as tmp:
        pa = os.path.join(tmp, "root_a")
        pb = os.path.join(tmp, "root_b")
        e.filter(F.col("event_id") % 2 == 0).write.mode(
            "overwrite"
        ).parquet(pa)
        e.filter(F.col("event_id") % 2 == 1).write.mode(
            "overwrite"
        ).parquet(pb)
        back = spark.read.parquet(pa, pb)
        listed = back.inputFiles()
        both = any("root_a" in f for f in listed) and any(
            "root_b" in f for f in listed
        )
        out = back.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("event_id").cast("long").alias("id_sum"),
        ).select(
            "event_type",
            "n",
            "id_sum",
            F.lit(bool(both)).alias("both_roots_listed"),
        )
        return parquet_checkpoint(out, "multipath_out")


# ---------------------------------------------------------------------------
# wave 151: multi-character CSV delimiter roundtrip
# ---------------------------------------------------------------------------
@q(
    "csv_multichar_delim",
    """
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(SUM(length(substr(text, 1, 40))) AS BIGINT)
             AS sum_head_len
    FROM documents GROUP BY lang, source
    """,
)
def csv_multichar_delim(spark, sf):
    """Multi-character CSV delimiter ('||') roundtrip — the
    interchange shape legacy ETL feeds actually use when the data
    contains commas and tabs (double-pipe survives where single
    chars collide): documents (ids, lang, source, n_chars, plus the
    first 40 raw text chars as a hostile free-text column) written
    with sep='||', read back with the SAME multi-char sep, an
    explicit schema (inferSchema is a second scan AND a type
    gamble), and multiLine for embedded newlines in the head
    fragment. Spark 4 supports multi-char separators on BOTH write
    and read (measured — this was read-only until Spark 3.0).
    Values containing the separator are quoted by the writer and
    unquoted by the reader — but quoting does NOT protect trailing
    whitespace: the Univocity WRITER trims it by default
    (ignoreLeading/TrailingWhiteSpace default TRUE on write, FALSE
    on read — asymmetric!), measured as an off-by-one length mass
    on every head fragment ending in a space; both flags are
    explicitly disabled on the write. The aggregate twin over the
    ORIGINAL parquet proves byte-lossless transit including the
    head fragment's length mass (the csv_roundtrip hash-equality
    idiom). Scale: the sink is a partitioned write, the read is
    multiLine (one task per file — the documented multiLine
    throughput tradeoff, acceptable for interchange exports)."""
    d = _sink_dir(spark, "mcd")
    (
        t(spark, sf, "documents")
        .select(
            "doc_id",
            "lang",
            "source",
            "n_chars",
            F.substring("text", 1, 40).alias("head40"),
        )
        .write.mode("overwrite")
        .options(
            header=True,
            sep="||",
            quoteAll=True,
            escape='"',
            # the WRITER trims whitespace by default (reader does
            # not): a head fragment ending in a space loses it even
            # inside quotes — measured as an off-by-one length mass
            ignoreLeadingWhiteSpace=False,
            ignoreTrailingWhiteSpace=False,
        )
        .csv(d)
    )
    back = (
        spark.read.options(
            header=True, sep="||", escape='"', multiLine=True
        )
        .schema(
            "doc_id BIGINT, lang STRING, source STRING,"
            " n_chars BIGINT, head40 STRING"
        )
        .csv(d)
    )
    return back.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.sum(F.length(F.coalesce(F.col("head40"), F.lit(""))))
        .cast("long")
        .alias("sum_head_len"),
    )


# ---------------------------------------------------------------------------
# wave 171: COUNT(*) answered from parquet footers — zero columns read
# ---------------------------------------------------------------------------
@q(
    "scan_count_star",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST((SELECT COUNT(*) FROM orders) AS BIGINT)
             AS n_orders,
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT)
             AS n_lineitems
    FROM events
    """,
)
def scan_count_star(spark, sf):
    """COUNT(*) answered from parquet FOOTER metadata — the
    cheapest query a lakehouse serves, and the mechanism is worth
    pinning because it is easy to silently lose: a bare count
    reads ZERO data pages (ReadSchema: struct<> — the scan
    projects no columns; row-group counts come from footers), but
    add any predicate, or count a nullable COLUMN instead of *,
    and the scan is back to reading pages. The face counts three
    tables in one query; the plan test pins the empty ReadSchema
    on every scan. At 100 TB the difference is a metadata
    operation versus a full-table read — the reason `SELECT
    COUNT(*)` is free on parquet and `COUNT(col)` is not, which
    every table-stats dashboard should know before it polls."""
    ev = t(spark, sf, "events").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    od = t(spark, sf, "orders").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )
    li = t(spark, sf, "lineitem").agg(
        F.count(F.lit(1)).cast("long").alias("n_lineitems")
    )
    return ev.crossJoin(od).crossJoin(li)


# ---------------------------------------------------------------------------
# wave 171: predicate pushdown THROUGH a UNION ALL
# ---------------------------------------------------------------------------
@q(
    "scan_union_pushdown",
    """
    WITH u AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL
      UNION ALL
      SELECT o_orderpriority AS event_type,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders)
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM u WHERE cents > 10000
    GROUP BY event_type ORDER BY event_type
    """,
)
def scan_union_pushdown(spark, sf):
    """Predicate pushdown THROUGH a UNION ALL — the optimizer
    mechanism behind every unioned-sources view (this round's
    stream_union in batch clothing, and the shape every
    multi-region lake view has): a filter applied ABOVE the union
    must reach BOTH branch scans, or one branch reads its full
    table just to discard rows post-union. Catalyst's
    PushProjectionThroughUnion + predicate pushdown rewrite the
    filter into each branch; the plan test pins `cents > 10000`
    appearing as a pushed/early filter on BOTH sides (the value
    and totalprice expressions differ per branch, so the rewrite
    must substitute through each branch's aliases — exactly the
    part naive view-expansion engines get wrong). The union is
    heterogeneous on purpose (events + orders share no lineage);
    results are exact cents; one scan per branch, one aggregate
    above."""
    ev = (
        t(spark, sf, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    od = t(spark, sf, "orders").select(
        F.col("o_orderpriority").alias("event_type"),
        F.round(F.col("o_totalprice") * 100)
        .cast("long")
        .alias("cents"),
    )
    u = ev.unionByName(od).filter(F.col("cents") > 10000)
    return (
        u.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
        .orderBy("event_type")
    )
