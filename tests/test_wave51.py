"""Wave-51 invariants: MCC against the closed-form replay of the
confusion cells, MRR against a per-user ranking replay, the DP count
release against the inverse-CDF noise replay (plus the non-negativity
clip), and EXECUTE IMMEDIATE against the statically-planned spelling."""

from __future__ import annotations

import hashlib
import math

from dbpedia_spotlight_db_spark.queries import qfeat, qml, qsql
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _rnd_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def _events(spark):
    return (
        t(spark, SF, "events")
        .select("event_id", "user_id", "event_type", "value")
        .collect()
    )


def test_mcc_matches_cell_replay(spark):
    tp = fp = fn = tn = 0
    for r in _events(spark):
        if r["value"] is None:
            continue
        cents = _rnd_away(r["value"] * 100)
        pos = r["event_type"] == "purchase"
        if cents >= 3500:
            tp, fp = tp + pos, fp + (not pos)
        else:
            fn, tn = fn + pos, tn + (not pos)
    got = qml.Q["ml_mcc"](spark, SF).collect()[0]
    assert got["n"] == tp + fp + fn + tn
    den = math.sqrt(float(tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    want = round((tp * tn - fp * fn) / den, 6)
    assert abs(got["mcc"] - want) < 1e-9


def test_mrr_matches_ranking_replay(spark):
    per_user: dict[int, list[tuple[int, int, bool]]] = {}
    for r in _events(spark):
        if r["value"] is None or r["user_id"] is None:
            continue
        per_user.setdefault(r["user_id"], []).append(
            (
                -_rnd_away(r["value"] * 100),
                r["event_id"],
                r["event_type"] == "purchase",
            )
        )
    rr_micros, n_hit = 0, 0
    for evs in per_user.values():
        evs.sort()
        for rank, (_, _, pos) in enumerate(evs, start=1):
            if pos:
                rr_micros += _rnd_away(1e6 / rank)
                n_hit += 1
                break
    got = qml.Q["ml_mrr"](spark, SF).collect()[0]
    assert got["n_users"] == len(per_user) and got["n_hit"] == n_hit
    assert abs(got["mrr"] - round(rr_micros / 1e6 / len(per_user), 6)) < 1e-9


def test_dp_count_matches_noise_replay(spark):
    truth: dict[str, int] = {}
    for r in _events(spark):
        truth[r["event_type"]] = truth.get(r["event_type"], 0) + 1
    got = {r["event_type"]: r for r in qfeat.Q["privacy_dp_count"](spark, SF).collect()}
    assert set(got) == set(truth)
    for et, n in truth.items():
        hx = int(hashlib.md5(et.encode()).hexdigest()[:8], 16)
        v = hx / 4294967296.0 - 0.5
        sgn = (v > 0) - (v < 0)
        noise = _rnd_away(
            -10.0 * sgn * math.log(max(1.0 - 2.0 * abs(v), 1e-12))
        )
        assert got[et]["n"] == n
        assert got[et]["noise"] == noise
        assert got[et]["noisy_n"] == max(n + noise, 0)
    # the mechanism is deterministic: a second run releases identically
    again = {
        r["event_type"]: r["noisy_n"]
        for r in qfeat.Q["privacy_dp_count"](spark, SF).collect()
    }
    assert again == {k: r["noisy_n"] for k, r in got.items()}


def test_exec_immediate_matches_static_plan(spark):
    df = qsql.Q["sql_exec_immediate"](spark, SF)
    # dynamic SQL must still plan JVM-side — no Python eval anywhere
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    static = spark.sql(
        f"""
        SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS total_cents
        FROM parquet.`{SF}/orders.parquet`
        WHERE o_orderpriority = '1-URGENT'
        GROUP BY o_orderstatus
        """
    )
    assert sorted(map(tuple, df.collect())) == sorted(
        map(tuple, static.collect())
    )
