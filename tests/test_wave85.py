"""Wave-85 invariants: the SQL table function conserves revenue
across its bands, MSCK discovers exactly the out-of-band partitions
and cleans its catalog entry up, Bartlett matches a quantized
pure-Python replay, and the merged minhash signature equals a
hashlib replay of the full recompute."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qdata, qlake, qml, qsql
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _rnd_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_table_udf_conserves_revenue(spark):
    rows = {r["band"]: r for r in qsql.Q["sql_table_udf"](spark, SF).collect()}
    assert set(rows) == {"lo", "hi"}
    tot = sum(
        _rnd_away(r["o_totalprice"] * 100)
        for r in t(spark, SF, "orders").select("o_totalprice").collect()
    )
    n = t(spark, SF, "orders").count()
    assert rows["lo"]["n"] == rows["hi"]["n"] == n
    assert rows["lo"]["amount_cents"] + rows["hi"]["amount_cents"] == tot
    assert rows["lo"]["amount_cents"] <= 10000000 * n


def test_msck_repair_discovers_partitions_and_cleans_up(spark):
    row = qlake.Q["lake_msck_repair"](spark, SF).collect()[0]
    ev = t(spark, SF, "events")
    assert row["n_before"] == 0  # external table knows nothing pre-repair
    assert row["n_after"] == ev.count()
    assert row["n_partitions"] == 4
    assert row["id_sum"] == ev.agg(F.sum("event_id")).collect()[0][0]
    leftover = [
        tb.name
        for tb in spark.catalog.listTables()
        if tb.name.startswith("msck_events_")
    ]
    assert leftover == []  # finally-drop held


def test_bartlett_matches_quantized_replay(spark):
    groups: dict[str, list[int]] = {}
    for r in (
        t(spark, SF, "events")
        .filter("value IS NOT NULL")
        .select("event_type", "value")
        .collect()
    ):
        x = _rnd_away(r["value"] * 100) // 100
        groups.setdefault(r["event_type"], []).append(x)
    k = n = T = W = H = 0
    for xs in groups.values():
        ng = len(xs)
        ss = ng * sum(x * x for x in xs) - sum(xs) ** 2
        if ng < 2 or ss <= 0:
            continue
        k += 1
        n += ng
        T += _rnd_away(1e6 * (ng - 1) * math.log(ss / (ng * (ng - 1.0))))
        W += _rnd_away(1e6 * float(ss) / ng)
        H += _rnd_away(1e12 / (ng - 1.0))
    chi2 = (
        (n - k) * math.log((W / 1e6) / (n - k)) - T / 1e6
    ) / (1.0 + (H / 1e12 - 1.0 / (n - k)) / (3.0 * (k - 1)))
    got = qml.Q["stat_bartlett"](spark, SF).collect()[0]
    assert (got["k"], got["n"]) == (k, n)
    assert (got["sum_w_us"], got["sum_t_us"]) == (W, T)
    assert abs(got["chi2"] - round(chi2, 6)) < 1e-9
    assert got["chi2"] >= 0 or abs(got["chi2"]) < 1.0  # near-0 floor noise


def test_minhash_merge_equals_full_replay(spark):
    mins_full = [None] * 4
    mins_half = {0: [None] * 4, 1: [None] * 4}
    for r in (
        t(spark, SF, "documents")
        .filter("text IS NOT NULL")
        .select("doc_id", "text")
        .collect()
    ):
        toks = r["text"].split(" ")
        for i in range(len(toks) - 2):
            h = hashlib.md5(
                " ".join(toks[i : i + 3]).encode()
            ).hexdigest()
            for p in range(4):
                s = h[p * 8 : (p + 1) * 8]
                if mins_full[p] is None or s < mins_full[p]:
                    mins_full[p] = s
                hp = mins_half[r["doc_id"] % 2]
                if hp[p] is None or s < hp[p]:
                    hp[p] = s
    got = qdata.Q["dedup_minhash_merge"](spark, SF).collect()[0]
    assert got["merge_ok"] is True
    for p in range(4):
        assert got[f"m{p}"] == mins_full[p]
        # merge really is the elementwise min of the halves
        halves = [
            v for v in (mins_half[0][p], mins_half[1][p]) if v is not None
        ]
        assert got[f"m{p}"] == min(halves)
