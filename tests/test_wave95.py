"""Wave-95 invariants: the EB prior actually shrinks small segments
more than large ones and matches a moment replay; split sizing
really produces more scan partitions and restores its confs."""

from __future__ import annotations

from dbpedia_spotlight_db_spark.queries import qlake, qml
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_eb_shrinkage_matches_moment_replay(spark):
    segs: dict[int, list[int]] = {}
    for r in (
        t(spark, SF, "events")
        .filter("user_id IS NOT NULL")
        .select("user_id", "event_type")
        .collect()
    ):
        a = segs.setdefault(r["user_id"] % 20, [0, 0])
        a[0] += 1
        a[1] += 1 if r["event_type"] == "purchase" else 0
    k = len(segs)
    rates = {s: x / n for s, (n, x) in segs.items()}
    mu = sum(rates.values()) / k
    m2 = sum(v * v for v in rates.values()) / k
    var = m2 - mu * mu
    scale = mu * (1.0 - mu) / var - 1.0
    alpha, beta = mu * scale, (1.0 - mu) * scale
    got = {r["seg"]: r for r in qml.Q["stat_eb_shrinkage"](spark, SF).collect()}
    assert set(got) == set(segs)
    for s, (n, x) in segs.items():
        r = got[s]
        assert (r["n"], r["x"]) == (n, x)
        assert abs(r["raw_rate"] - round(x / n, 6)) < 1e-9
        assert abs(r["alpha"] - round(alpha, 6)) < 1e-9
        assert abs(
            r["shrunk_rate"] - round((x + alpha) / (n + alpha + beta), 6)
        ) < 1e-9
        # shrinkage pulls TOWARD the prior mean, never past it
        lo, hi = sorted((x / n, mu))
        assert lo - 1e-6 <= r["shrunk_rate"] <= hi + 1e-6


def test_split_sizing_splits_more_and_restores(spark):
    key = "spark.sql.files.maxPartitionBytes"
    before = spark.conf.get(key)
    row = qlake.Q["scan_split_sizing"](spark, SF).collect()[0]
    ev = t(spark, SF, "events")
    assert row["n"] == ev.count()
    assert row["more_splits"] is True
    assert spark.conf.get(key) == before
