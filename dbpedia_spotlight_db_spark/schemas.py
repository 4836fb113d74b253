"""Explicit StructType schemas — single source of truth (SURVEY.md §1).

The reference keeps these implicit in hand-rolled store layouts
(MemoryResourceStore / MemorySurfaceFormStore / MemoryCandidateMapStore /
MemoryTokenTypeStore / MemoryContextStore — canonical upstream paths in
SURVEY.md §1.1, UNVERIFIED-LOCALLY). Here every table is a declared
relational schema; Parquet dictionary/RLE encoding subsumes the
reference's quantized count stores.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Primary input (authoritative shape: BASELINE.json `input_hint`)
# ---------------------------------------------------------------------------
PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# Annotated corpus for store building (stands in for the Wikipedia dump)
LINK = T.StructType(
    [
        T.StructField("start", T.IntegerType(), False),
        T.StructField("end", T.IntegerType(), False),
        T.StructField("surface_form", T.StringType(), False),
        T.StructField("uri", T.StringType(), False),
    ]
)
WIKI_CORPUS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("links", T.ArrayType(LINK), False),
    ]
)

REDIRECTS = T.StructType(
    [
        T.StructField("src_uri", T.StringType(), False),
        T.StructField("dst_uri", T.StringType(), False),
    ]
)
DISAMBIGUATIONS = T.StructType([T.StructField("uri", T.StringType(), False)])

# ---------------------------------------------------------------------------
# Derived model stores (the "database": SURVEY.md §1.3)
# ---------------------------------------------------------------------------
ENTITIES = T.StructType(
    [
        T.StructField("entity_id", T.LongType(), False),
        T.StructField("uri", T.StringType(), False),
        T.StructField("support", T.LongType(), False),
        T.StructField("types", T.ArrayType(T.StringType()), True),
    ]
)
SURFACE_FORMS = T.StructType(
    [
        T.StructField("sf_id", T.LongType(), False),
        T.StructField("surface_form", T.StringType(), False),
        T.StructField("annotated_count", T.LongType(), False),
        T.StructField("total_count", T.LongType(), False),
        T.StructField("annotation_prob", T.DoubleType(), False),
    ]
)
CANDIDATE_MAP = T.StructType(
    [
        T.StructField("sf_id", T.LongType(), False),
        T.StructField("entity_id", T.LongType(), False),
        T.StructField("pair_count", T.LongType(), False),
        T.StructField("p_e_given_s", T.DoubleType(), False),
    ]
)
TOKENS = T.StructType(
    [
        T.StructField("token_id", T.LongType(), False),
        T.StructField("token", T.StringType(), False),
        T.StructField("count", T.LongType(), False),
    ]
)
CONTEXT_COUNTS = T.StructType(
    [
        T.StructField("entity_id", T.LongType(), False),
        T.StructField("token_id", T.LongType(), False),
        T.StructField("count", T.LongType(), False),
    ]
)
ENTITY_VECTORS = T.StructType(
    [
        T.StructField("entity_id", T.LongType(), False),
        T.StructField("token_ids", T.ArrayType(T.LongType()), False),
        T.StructField("weights", T.ArrayType(T.FloatType()), False),
        T.StructField("norm", T.FloatType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Pipeline intermediates / outputs
# ---------------------------------------------------------------------------
TOKEN = T.StructType(
    [
        T.StructField("text", T.StringType(), False),
        T.StructField("start", T.IntegerType(), False),
        # T2 analysis chain (functions/text.py): Porter stem +
        # stopword flag of the lowercased token
        T.StructField("stem", T.StringType(), False),
        T.StructField("is_stop", T.BooleanType(), False),
    ]
)
TOKENIZED = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(TOKEN), False),
    ]
)
MENTIONS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("start", T.IntegerType(), False),
        T.StructField("end", T.IntegerType(), False),
        T.StructField("surface_form", T.StringType(), False),
    ]
)
ANNOTATIONS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("start", T.IntegerType(), False),
        T.StructField("end", T.IntegerType(), False),
        T.StructField("surface_form", T.StringType(), False),
        T.StructField("uri", T.StringType(), False),
        T.StructField("score", T.DoubleType(), False),
        T.StructField("second_rank_ratio", T.DoubleType(), True),
    ]
)
TRIPLES = T.StructType(
    [
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj", T.StringType(), False),
    ]
)

# Lineage / metrics (north_rule: resumable, per-partition lineage)
LINEAGE = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("phase", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("rows_out", T.LongType(), False),
        T.StructField("wall_ms", T.LongType(), False),
        T.StructField("status", T.StringType(), False),
    ]
)
