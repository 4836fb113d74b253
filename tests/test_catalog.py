"""CATALOG.md sync gate (VERDICT r4 "Next round" #4): the committed
catalog must cover EXACTLY the registry key set with the right gate
labels — regenerate with `python tools/gen_catalog.py` whenever a
wave adds keys. No Spark session needed; pure text vs registry."""

from __future__ import annotations

import re
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def test_catalog_matches_registry():
    from dbpedia_spotlight_db_spark.queries import ORACLES, QUERIES

    text = (ROOT / "CATALOG.md").read_text()
    rows = re.findall(r"^\| `([a-z0-9_]+)` \| (twin|rows-only) \|", text, re.M)
    keys = {k for k, _ in rows}
    assert len(rows) == len(keys), "duplicate catalog rows"
    assert keys == set(QUERIES), (
        f"catalog drift: missing={sorted(set(QUERIES) - keys)[:5]} "
        f"extra={sorted(keys - set(QUERIES))[:5]} — regenerate"
    )
    for k, gate in rows:
        assert (gate == "twin") == (k in ORACLES), f"{k} gate label wrong"


def test_catalog_header_count_matches():
    from dbpedia_spotlight_db_spark.queries import QUERIES

    text = (ROOT / "CATALOG.md").read_text()
    m = re.search(r"\*\*(\d+) keys\*\*", text)
    assert m and int(m.group(1)) == len(QUERIES)
