"""Wave-84 invariants: the two engine-native scale mechanisms
(parquet aggregate pushdown, Catalyst-injected runtime bloom filter)
fire AND restore session confs; Granger's F against a pure-Python
regression replay; RAKE's top-20 against a dict-based replay."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.functions.text import LINKING_STOPWORDS
from dbpedia_spotlight_db_spark.queries import qadv, qcorpus, qio, qlake
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _rnd_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_agg_pushdown_fires_and_restores_confs(spark):
    before = (
        spark.conf.get("spark.sql.parquet.aggregatePushdown"),
        spark.conf.get("spark.sql.sources.useV1SourceList"),
    )
    row = qlake.Q["scan_agg_pushdown"](spark, SF).collect()[0]
    assert row["pushed"] is True  # footer-stats path actually taken
    exact = (
        t(spark, SF, "orders")
        .agg(
            F.round(F.min("o_totalprice") * 100).cast("long"),
            F.round(F.max("o_totalprice") * 100).cast("long"),
            F.count(F.lit(1)).cast("long"),
        )
        .collect()[0]
    )
    assert (row["min_cents"], row["max_cents"], row["n_rows"]) == tuple(
        exact
    )
    after = (
        spark.conf.get("spark.sql.parquet.aggregatePushdown"),
        spark.conf.get("spark.sql.sources.useV1SourceList"),
    )
    assert after == before  # conf scoping restored


def test_runtime_bloom_fires_and_restores_confs(spark):
    key = (
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold"
    )
    before = spark.conf.get(key, None)
    row = qio.Q["join_runtime_bloom"](spark, SF).collect()[0]
    assert row["bloom_injected"] is True
    exact = (
        t(spark, SF, "lineitem")
        .join(
            t(spark, SF, "orders").filter(
                "o_orderpriority = '1-URGENT'"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .agg(
            F.count(F.lit(1)).cast("long"),
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
            ).cast("long"),
        )
        .collect()[0]
    )
    assert (row["n"], row["rev_cents"]) == tuple(exact)
    assert spark.conf.get(key, None) == before


def test_granger_matches_regression_replay(spark):
    yd: dict[int, int] = {}
    xd: dict[int, int] = {}
    for r in (
        t(spark, SF, "events")
        .filter("ts IS NOT NULL AND value IS NOT NULL")
        .select("ts", "value", "event_type")
        .collect()
    ):
        day = r["ts"].date().toordinal()
        yd.setdefault(day, 0)
        xd.setdefault(day, 0)
        if r["event_type"] == "purchase":
            yd[day] += _rnd_away(r["value"] * 100)
        if r["event_type"] == "click":
            xd[day] += 1
    ey = {d: v // 100 for d, v in yd.items()}
    days = sorted(ey)
    trip = [
        (ey[d], ey[dp], xd[dp])
        for dp, d in zip(days, days[1:])
    ]
    n = len(trip)
    assert n > 3  # the degenerate-empty-join failure mode is fatal here
    sy = sum(y for y, _, _ in trip)
    s1 = sum(a for _, a, _ in trip)
    s2 = sum(b for _, _, b in trip)
    cyy = n * sum(y * y for y, _, _ in trip) - sy * sy
    a1 = n * sum(y * a for y, a, _ in trip) - sy * s1
    a2 = n * sum(y * b for y, _, b in trip) - sy * s2
    b11 = n * sum(a * a for _, a, _ in trip) - s1 * s1
    b12 = n * sum(a * b for _, a, b in trip) - s1 * s2
    b22 = n * sum(b * b for _, _, b in trip) - s2 * s2
    rss_r = (float(cyy) - float(a1) * a1 / b11) / n
    det = float(b11) * b22 - float(b12) * b12
    rss_u = (
        float(cyy)
        - (
            float(a1) * a1 * b22
            - 2.0 * float(a1) * a2 * b12
            + float(a2) * a2 * b11
        )
        / det
    ) / n
    f_stat = (rss_r - rss_u) / (rss_u / (n - 3))
    got = qadv.Q["stat_granger"](spark, SF).collect()[0]
    assert got["n"] == n
    assert got["cyy_exact"] == cyy
    assert abs(got["rss_r"] - round(rss_r, 6)) < 1e-9
    assert abs(got["rss_u"] - round(rss_u, 6)) < 1e-9
    assert abs(got["f_stat"] - round(f_stat, 6)) < 1e-9
    # restricted RSS can never beat the unrestricted fit
    assert got["rss_r"] >= got["rss_u"] > 0


def test_rake_matches_phrase_replay(spark):
    stop = set(LINKING_STOPWORDS)
    freq: dict[str, int] = {}
    deg: dict[str, int] = {}
    phrases: list[list[str]] = []
    occur: dict[str, int] = {}
    for r in (
        t(spark, SF, "documents")
        .filter("text IS NOT NULL")
        .select("text")
        .collect()
    ):
        run: list[str] = []
        for tk in r["text"].lower().split(" ") + [""]:
            if tk == "" or tk in stop:
                if run:
                    phrases.append(run)
                    occur[" ".join(run)] = occur.get(" ".join(run), 0) + 1
                    for w in run:
                        freq[w] = freq.get(w, 0) + 1
                        deg[w] = deg.get(w, 0) + len(run)
                run = []
            else:
                run.append(tk)
    s_us = {
        w: (2000000 * deg[w] + freq[w]) // (2 * freq[w]) for w in freq
    }
    score = {}
    for run in phrases:
        score[" ".join(run)] = sum(s_us[w] for w in run)
    top = sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = qcorpus.Q["text_rake"](spark, SF).collect()
    assert [(r["phrase"], r["score_us"]) for r in got] == top
    for r in got:
        assert r["n_occur"] == occur[r["phrase"]]
        assert abs(r["score"] - round(r["score_us"] / 1e6, 6)) < 1e-9
    # multi-word phrases must actually surface (degree does its job)
    assert any(" " in p for p, _ in top)
