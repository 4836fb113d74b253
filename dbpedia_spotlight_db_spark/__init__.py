"""dbpedia_spotlight_db_spark — a from-scratch, PySpark-native
knowledge-graph construction engine with the query/data-processing
capabilities of DBpedia Spotlight's statistical "db" backend
(reference: chrishokamp/dbpedia-spotlight-db; see SURVEY.md).

This is NOT a port: the reference is an in-memory JVM entity-linking
service; this engine re-expresses its semantics as distributed
DataFrame transforms (broadcast-dictionary spotting, groupBy-agg count
stores, generative disambiguation as column math + vectorized Arrow
UDFs, redirect-closure canonicalization, triple materialization),
designed for 10^12-document scale with explicit partitioning, salting,
and broadcast-join strategy.

Layout
------
schemas     : single source of truth for every table StructType
session     : SparkSession factory (AQE, Arrow, shuffle sizing)
fixtures    : deterministic synthetic corpus generator (FIXTURES.md)
sources/    : catalog seam (Iceberg DDL in prod, Parquet+manifest here)
functions/  : text extraction, tokenization, text analytics, hashing
operators/  : salted aggs, spotting, candidate joins, scoring, top-k,
              redirect closure, dedup (exact/MinHash/SimHash/Jaccard),
              ANN similarity search
plans/      : P0 build_stores, P1 annotate, P2 canonicalize,
              P3 materialize, lineage/checkpoint-resume
streaming/  : incremental (micro-batch) annotate — thin wrapper only;
              the reference is a batch/request system (SURVEY.md §1.1)
"""

__version__ = "0.1.0"
