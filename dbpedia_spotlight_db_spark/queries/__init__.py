"""Driver-facing query registry (SURVEY.md §2.6): every implemented
operator has a `queries()` callable and (where SQL-expressible) a
DuckDB `oracle_sql()` twin with IDENTICAL column names and value
semantics.

Engine-parity rules used throughout (so order-insensitive value
hashes match):
- monetary doubles -> exact integer cents: cast(round(x*100) as bigint)
- float math (log/exp/cosine) -> round(..., 6) in BOTH engines
- every ranking window carries a deterministic tie-break key
- hashes are md5 hex (identical in Spark and DuckDB); never
  xxhash/murmur in oracle-checked paths
"""

from .registry import ORACLES, QUERIES  # noqa: F401
