"""Wave-93 invariants: the AQE conversion face really flips SMJ ->
BHJ at runtime (booleans earned, confs restored); Mahalanobis top-20
matches a pure-Python quadratic-form replay."""

from __future__ import annotations

import math

from dbpedia_spotlight_db_spark.queries import qio, qml
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _rnd_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_aqe_convert_earns_both_booleans(spark):
    key = "spark.sql.autoBroadcastJoinThreshold"
    before = spark.conf.get(key, None)
    row = qio.Q["join_aqe_bhj_convert"](spark, SF).collect()[0]
    assert row["smj_initial"] is True  # static planner denied BHJ
    assert row["bhj_final"] is True  # AQE converted at runtime
    li = t(spark, SF, "lineitem")
    od = t(spark, SF, "orders").filter("o_orderpriority = '1-URGENT'")
    exp = li.join(od, li.l_orderkey == od.o_orderkey).count()
    assert row["n"] == exp
    assert spark.conf.get(key, None) == before  # conf restored


def test_mahalanobis_matches_quadratic_replay(spark):
    pts = []
    for r in (
        t(spark, SF, "events")
        .filter("value IS NOT NULL AND ts IS NOT NULL")
        .select("event_id", "value", "ts")
        .collect()
    ):
        pts.append(
            (
                r["event_id"],
                _rnd_away(r["value"] * 100) // 100,
                r["ts"].hour,
            )
        )
    n = len(pts)
    sx = sum(p[1] for p in pts)
    sy = sum(p[2] for p in pts)
    cxx = n * sum(p[1] * p[1] for p in pts) - sx * sx
    cyy = n * sum(p[2] * p[2] for p in pts) - sy * sy
    cxy = n * sum(p[1] * p[2] for p in pts) - sx * sy
    det = float(cxx) * cyy - float(cxy) * cxy
    assert det > 0
    scored = []
    for eid, x, y in pts:
        ex, ey = n * x - sx, n * y - sy
        d2 = (
            float(ex) * ex * cyy
            - 2.0 * float(ex) * ey * cxy
            + float(ey) * ey * cxx
        ) / det
        scored.append((eid, _rnd_away(1e6 * d2)))
    top = sorted(scored, key=lambda p: (-p[1], p[0]))[:20]
    got = [
        (r["event_id"], r["d2_us"])
        for r in qml.Q["stat_mahalanobis"](spark, SF).collect()
    ]
    assert got == top
    # chi^2_2 sanity: the worst point is a genuine outlier
    assert top[0][1] > 4_000_000  # d^2 > 4
