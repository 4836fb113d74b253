"""Wave-61 invariants: McNemar discordance table against a row
replay, per-user OLS trend against a moments replay, the SCALAR_ITER
UDF against a Python count (and the plan must be an ArrowEvalPython —
the point of the face is the Python execution mode), and the crawl
schedule against a ceil-division replay."""

from __future__ import annotations

import hashlib
import math
import re

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qcorpus, qdata, qfeat, qml
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _rnd_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_mcnemar_matches_row_replay(spark):
    rows = (
        t(spark, SF, "events")
        .filter("value IS NOT NULL")
        .select("event_id", "event_type", "value")
        .collect()
    )
    b10 = c01 = 0
    for r in rows:
        y = 1 if r["event_type"] == "purchase" else 0
        a = 1 if _rnd_away(r["value"] * 100) % 7 < 3 else 0
        b = (
            1
            if hashlib.md5(str(r["event_id"]).encode()).hexdigest()[0] < "7"
            else 0
        )
        a_ok, b_ok = a == y, b == y
        if a_ok and not b_ok:
            b10 += 1
        elif b_ok and not a_ok:
            c01 += 1
    got = qml.Q["stat_mcnemar"](spark, SF).collect()[0]
    assert (got["n"], got["b10"], got["c01"]) == (len(rows), b10, c01)
    if b10 + c01:
        assert abs(
            got["chi2"] - round((b10 - c01) ** 2 / (b10 + c01), 6)
        ) < 1e-9
        assert abs(
            got["chi2_cc"]
            - round((abs(b10 - c01) - 1.0) ** 2 / (b10 + c01), 6)
        ) < 1e-9


def test_trend_matches_moments_replay(spark):
    rows = (
        t(spark, SF, "events")
        .filter("ts IS NOT NULL AND value IS NOT NULL AND user_id IS NOT NULL")
        .select(
            "user_id",
            F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("x"),
            "value",
        )
        .collect()
    )
    pts: dict[int, list] = {}
    for r in rows:
        pts.setdefault(r["user_id"], []).append(
            (r["x"], _rnd_away(r["value"] * 100))
        )
    got = {
        r["user_id"]: (r["n"], r["slope_cents_per_day"], r["intercept_cents"])
        for r in qfeat.Q["feat_trend"](spark, SF).collect()
    }
    assert set(got) == set(pts)
    slopes_seen = 0
    for uid, p in pts.items():
        n = len(p)
        sx = sum(x for x, _ in p)
        sy = sum(y for _, y in p)
        sxy = sum(x * y for x, y in p)
        sxx = sum(x * x for x, _ in p)
        den = n * sxx - sx * sx
        g = got[uid]
        assert g[0] == n
        if n < 2 or den == 0:
            assert g[1] is None and g[2] is None
        else:
            slopes_seen += 1
            slope = (n * sxy - sx * sy) / den
            assert abs(g[1] - round(slope, 6)) < 1e-9
            assert abs(g[2] - round((sy - slope * sx) / n, 6)) < 1e-6
    assert slopes_seen > 0


def test_scalar_iter_udf_counts_and_plans_arrow(spark):
    df = qdata.Q["udf_scalar_iter"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    got = {r["doc_id"]: r["n_vowels"] for r in df.collect()}
    for r in t(spark, SF, "documents").select("doc_id", "text").collect():
        want = (
            None
            if r["text"] is None
            else len(re.findall(r"[aeiou]", r["text"].lower()))
        )
        assert got[r["doc_id"]] == want


def test_crawl_schedule_matches_ceil_replay(spark):
    hosts: dict[str, int] = {}
    for r in t(spark, SF, "documents").select("doc_id").collect():
        h = f"h{r['doc_id'] % 53}"
        hosts[h] = hosts.get(h, 0) + 1
    ticks = {h: (n + 4) // 5 for h, n in hosts.items()}
    makespan = max(ticks.values())
    got = {
        r["host"]: (r["n_docs"], r["ticks"], r["utilization"], r["is_critical"])
        for r in qcorpus.Q["crawl_schedule"](spark, SF).collect()
    }
    assert set(got) == set(hosts)
    for h, n in hosts.items():
        g = got[h]
        assert g[0] == n and g[1] == ticks[h]
        assert abs(g[2] - round(n / (5 * ticks[h]), 6)) < 1e-9
        assert g[3] == (ticks[h] == makespan)
    assert any(v[3] for v in got.values())
