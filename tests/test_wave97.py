"""Wave-97 invariants: the HLL certificate is earned against the
exact distinct replay; the G-test matches a log-likelihood replay and
stays nonnegative; linear attribution matches brute force and
conserves credit per purchase up to the quantization."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qml, qsketch, qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _rnd_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_approx_cd_cert_exact_and_bounded(spark):
    exact = {
        r["l_returnflag"]: r["n"]
        for r in t(spark, SF, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    got = {
        r["l_returnflag"]: r
        for r in qsketch.Q["agg_approx_cd_cert"](spark, SF).collect()
    }
    assert set(got) == set(exact)
    for k, n in exact.items():
        assert got[k]["exact_parts"] == n
        assert got[k]["within_bound"] is True


def test_gtest_matches_loglik_replay(spark):
    cells: dict[str, list[int]] = {}
    for r in t(spark, SF, "documents").select("doc_id", "lang").collect():
        a = cells.setdefault(r["lang"], [0, 0])
        h = hashlib.md5(str(r["doc_id"]).encode()).hexdigest()
        a[0 if h[0] < "8" else 1] += 1
    ta = sum(v[0] for v in cells.values())
    tb = sum(v[1] for v in cells.values())
    exp = {}
    for lang, (na, nb) in cells.items():
        term = 0.0
        if na:
            term += na * math.log(na / (float(na + nb) * ta / (ta + tb)))
        if nb:
            term += nb * math.log(nb / (float(na + nb) * tb / (ta + tb)))
        exp[lang] = (na, nb, _rnd_away(1e6 * 2.0 * term))
    total = round(sum(v[2] for v in exp.values()) / 1e6, 6)
    got = {r["lang"]: r for r in qml.Q["stat_gtest"](spark, SF).collect()}
    assert set(got) == set(exp)
    for lang, (na, nb, g_us) in exp.items():
        r = got[lang]
        assert (r["n_a"], r["n_b"], r["g_term_us"]) == (na, nb, g_us)
        assert abs(r["g_total"] - total) < 1e-9
    assert total >= 0  # G is a KL, never negative


def test_linear_attribution_matches_bruteforce(spark):
    ev = [
        (r["event_id"], r["user_id"], r["event_type"],
         int(r["ts"].timestamp() * 1e6))
        for r in t(spark, SF, "events")
        .filter("ts IS NOT NULL AND user_id IS NOT NULL")
        .select("event_id", "user_id", "event_type",
                F.expr("CAST(ts AS TIMESTAMP)").alias("ts"))
        .collect()
    ]
    credit: dict[int, list[int]] = {}
    n_attributed = 0
    for pid, u, et, pus in ev:
        if et != "purchase":
            continue
        touches = [
            cid
            for cid, cu, cet, cus in ev
            if cet == "click" and cu == u and pus - 3600000000 <= cus <= pus
        ]
        if not touches:
            continue
        n_attributed += 1
        cu_credit = (2000000 + len(touches)) // (2 * len(touches))
        for cid in touches:
            a = credit.setdefault(cid, [0, 0])
            a[0] += 1
            a[1] += cu_credit
    top = sorted(
        ((cid, a[0], a[1]) for cid, a in credit.items()),
        key=lambda x: (-x[2], x[0]),
    )[:20]
    got = [
        (r["click_id"], r["n_assists"], r["credit_us"])
        for r in qstats.Q["events_attribution_linear"](spark, SF).collect()
    ]
    assert got == top
    # credit conservation: each attributed purchase hands out ~1e6
    total = sum(a[1] for a in credit.values())
    assert abs(total - 1000000 * n_attributed) <= n_attributed * 32
    assert n_attributed > 0
