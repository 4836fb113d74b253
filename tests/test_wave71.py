"""Wave-71 invariants: embedding drift against a quantized centroid
replay (cos is arbitrary for zero-centered halves — range-checked only), the UTF-8 census against a
Python encode replay (extra_bytes == continuation bytes), the AQE
empty-propagation plan collapse, and the suppression pattern against
a disclosure-audit replay (no single-suppressed row may be
reconstructable by subtraction)."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qcorpus, qembed, qfeat, qrel
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"
K = 10


def _rnd_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_embed_drift_matches_centroid_replay(spark):
    sums: dict[tuple, list] = {}
    for r in (
        t(spark, SF, "embeddings")
        .filter("embedding IS NOT NULL")
        .collect()
    ):
        in_a = (
            hashlib.md5(f"drift:{r['vec_id']}".encode()).hexdigest()[0]
            < "8"
        )
        for dim, v in enumerate(r["embedding"]):
            q = _rnd_away(1e6 * float(v))
            c = sums.setdefault((in_a, dim), [0, 0])
            c[0] += 1
            c[1] += q
    dims = sorted({d for _, d in sums})
    d2 = dot = na2 = nb2 = 0.0
    d_cnt = 0
    for dim in dims:
        a = sums.get((True, dim))
        b = sums.get((False, dim))
        if not a or not b:
            continue
        d_cnt += 1
        ma, mb = a[1] / a[0], b[1] / b[0]
        d2 += (ma - mb) ** 2
        dot += ma * mb
        na2 += ma * ma
        nb2 += mb * mb
    got = qembed.Q["embed_drift"](spark, SF).collect()[0]
    assert got["d"] == d_cnt
    assert abs(got["centroid_l2"] - round(math.sqrt(d2) / 1e6, 6)) < 1e-6
    assert abs(
        got["centroid_cos"] - round(dot / math.sqrt(na2 * nb2), 6)
    ) < 1e-6
    # zero-centered embeddings: half-centroids are noise vectors, so
    # the cosine is arbitrary — only its range is guaranteed
    assert -1.0 <= got["centroid_cos"] <= 1.0
    assert got["centroid_l2"] >= 0.0


def test_utf8_census_matches_encode_replay(spark):
    agg: dict[str, list] = {}
    for r in (
        t(spark, SF, "documents")
        .filter("text IS NOT NULL")
        .select("lang", "text")
        .collect()
    ):
        v = agg.setdefault(r["lang"], [0, 0, 0])
        v[0] += 1
        v[1] += len(r["text"])
        v[2] += len(r["text"].encode("utf-8"))
    got = {
        r["lang"]: (
            r["n_docs"],
            r["chars"],
            r["bytes"],
            r["extra_bytes"],
            r["bytes_per_char"],
        )
        for r in qcorpus.Q["text_utf8_census"](spark, SF).collect()
    }
    assert set(got) == set(agg)
    for lang, v in agg.items():
        g = got[lang]
        assert g[:4] == (v[0], v[1], v[2], v[2] - v[1])
        assert abs(g[4] - round(v[2] / v[1], 6)) < 1e-9


def test_empty_prop_collapses_join_branch(spark):
    df = qrel.Q["join_empty_prop"](spark, SF)
    rows = df.collect()
    n_orders = t(spark, SF, "orders").count()
    assert rows[0]["n_matched"] == 0
    assert rows[0]["n_orders"] == n_orders
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AQE collapsed the impossible join branch to an empty local scan
    assert "LocalTableScan" in plan or "EmptyRelation" in plan


def test_suppression_pattern_is_disclosure_safe(spark):
    cells: dict[tuple, int] = {}
    for r in (
        t(spark, SF, "documents").select("lang", "source").collect()
    ):
        k = (r["lang"], r["source"])
        cells[k] = cells.get(k, 0) + 1
    got = {
        (r["lang"], r["source"]): (r["released"], r["suppressed"])
        for r in qfeat.Q["privacy_suppress"](spark, SF).collect()
    }
    assert set(got) == set(cells)
    by_lang: dict[str, list] = {}
    for (lang, src), n in cells.items():
        by_lang.setdefault(lang, []).append((n, src))
    for lang, items in by_lang.items():
        primaries = [(n, s) for n, s in items if n < K]
        suppressed = {
            s for (lg, s), (rel, why) in got.items() if lg == lang and why
        }
        for n, s in primaries:
            assert got[(lang, s)] == (None, "primary")
        if len(primaries) == 1:
            # complementary: smallest surviving cell also suppressed
            survivors = sorted((n, s) for n, s in items if n >= K)
            comp = survivors[0][1]
            assert got[(lang, comp)] == (None, "complementary")
            assert len(suppressed) == 2
        elif len(primaries) == 0:
            assert not suppressed
        # disclosure audit: a row with any suppression hides >= 2 cells
        if suppressed:
            assert len(suppressed) >= 2
        # released values are the raw counts
        for n, s in items:
            rel, why = got[(lang, s)]
            if why is None:
                assert rel == n
    # the fixture must exercise at least one suppression
    assert any(why for _, why in got.values())
