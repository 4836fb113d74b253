"""Wave-59 invariants: entropy rate against a transitions-dict replay
(plus H <= H0), Hurst R/S against a windows replay, the script census
against a codepoint-range replay, and the named-window face against a
per-user replay plus the single-Window-operator plan claim."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qcorpus, qml, qsql, qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _rnd_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_entropy_rate_matches_transition_replay(spark):
    rows = (
        t(spark, SF, "events")
        .select("user_id", "event_type", "ts", "event_id")
        .collect()
    )
    per_user: dict = {}
    for r in rows:
        per_user.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["event_type"])
        )
    cells: dict[tuple, int] = {}
    for evs in per_user.values():
        evs.sort(key=lambda x: (x[0], x[1]))
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            cells[(a, b)] = cells.get((a, b), 0) + 1
    tt = sum(cells.values())
    ci: dict[str, int] = {}
    cj: dict[str, int] = {}
    for (a, b), c in cells.items():
        ci[a] = ci.get(a, 0) + c
        cj[b] = cj.get(b, 0) + c
    h_millis = sum(
        _rnd_away(1000.0 * c * math.log(ci[a] / c))
        for (a, b), c in cells.items()
    )
    l_millis = sum(
        _rnd_away(1000.0 * c * math.log(c)) for c in cj.values()
    )
    h = h_millis / 1000.0 / tt
    h0 = math.log(tt) - l_millis / 1000.0 / tt
    got = qstats.Q["events_entropy_rate"](spark, SF).collect()[0]
    assert got["n_transitions"] == tt
    assert abs(got["h_rate"] - round(h, 6)) < 1e-9
    assert abs(got["h_marginal"] - round(h0, 6)) < 1e-9
    assert abs(got["predictability"] - round(1 - h / h0, 6)) < 1e-9
    # conditioning can only reduce entropy
    assert got["h_rate"] <= got["h_marginal"] + 1e-9


def test_hurst_matches_rs_replay(spark):
    rows = (
        t(spark, SF, "events")
        .filter("ts IS NOT NULL AND value IS NOT NULL")
        .select(
            F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("day"),
            "value",
        )
        .collect()
    )
    daily: dict[int, int] = {}
    for r in rows:
        daily[r["day"]] = daily.get(r["day"], 0) + _rnd_away(
            r["value"] * 100
        )
    series = [c // 100 for _, c in sorted(daily.items())]
    ybars, counts = {}, {}
    for size in (8, 16, 32):
        ys = []
        for w0 in range(0, len(series) - size + 1, size):
            win = series[w0 : w0 + size]
            s1, s2 = sum(win), sum(x * x for x in win)
            varn = size * s2 - s1 * s1
            if varn <= 0:
                continue
            cum = 0
            devs = []
            for pos, v in enumerate(win, start=1):
                cum += v
                devs.append(size * cum - pos * s1)
            rr = max(devs) - min(devs)
            ys.append(_rnd_away(1e6 * math.log(rr / math.sqrt(varn))))
        counts[size] = len(ys)
        if ys:
            ybars[size] = sum(ys) / len(ys)
    got = qml.Q["stat_hurst"](spark, SF).collect()[0]
    assert (got["n8"], got["n16"], got["n32"]) == (
        counts[8],
        counts[16],
        counts[32],
    )
    if 8 in ybars and 32 in ybars:
        want = round(
            (ybars[32] - ybars[8]) / 1e6 / (2 * math.log(2.0)), 6
        )
        assert abs(got["hurst"] - want) < 1e-9
    else:
        assert got["hurst"] is None


def test_script_mix_matches_range_replay(spark):
    def han(ch):
        o = ord(ch)
        return (
            0x4E00 <= o <= 0x9FFF
            or 0x3400 <= o <= 0x4DBF
            or 0xF900 <= o <= 0xFAD9
            or 0x20000 <= o <= 0x2EBEF
        )

    def cyr(ch):
        o = ord(ch)
        return 0x0400 <= o <= 0x052F or 0x1C80 <= o <= 0x1C8F or 0x2DE0 <= o <= 0x2DFF or 0xA640 <= o <= 0xA69F

    agg: dict[str, list] = {}
    for r in (
        t(spark, SF, "documents")
        .filter("text IS NOT NULL")
        .select("lang", "text")
        .collect()
    ):
        v = agg.setdefault(r["lang"], [0, 0, 0, 0, 0, 0])
        txt = r["text"]
        v[0] += 1
        v[1] += len(txt)
        v[2] += sum(1 for c in txt if "A" <= c <= "Z" or "a" <= c <= "z")
        v[3] += sum(1 for c in txt if han(c))
        v[4] += sum(1 for c in txt if cyr(c))
        v[5] += sum(1 for c in txt if "0" <= c <= "9")
    got = {
        r["lang"]: (
            r["n_docs"],
            r["chars"],
            r["latin"],
            r["han"],
            r["cyr"],
            r["digits"],
            r["non_latin_share"],
        )
        for r in qcorpus.Q["text_script_mix"](spark, SF).collect()
    }
    assert set(got) == set(agg)
    for lang, v in agg.items():
        g = got[lang]
        assert g[:6] == tuple(v), (lang, g, v)
        share = None if v[1] == 0 else round((v[3] + v[4]) / v[1], 6)
        assert (g[6] is None and share is None) or abs(g[6] - share) < 1e-9
    # the synthetic zh shard is Latin-script text — exactly the
    # tag/script mismatch this census exists to flag
    assert "zh" in got and got["zh"][3] == 0 and got["zh"][2] > 0


def test_named_window_single_operator_and_replay(spark):
    df = qsql.Q["sql_named_window"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    assert len(re.findall(r"\bWindow\b", plan)) == 1
    rows = (
        t(spark, SF, "events")
        .filter("user_id IS NOT NULL")
        .select("event_id", "user_id", "ts", "value")
        .collect()
    )
    per_user: dict = {}
    for r in rows:
        per_user.setdefault(r["user_id"], []).append(r)
    want = {}
    for evs in per_user.values():
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        run = None  # SUM over an all-NULL frame is NULL, not 0
        prev = None
        for i, r in enumerate(evs):
            c = None if r["value"] is None else _rnd_away(r["value"] * 100)
            if c is not None:
                run = (run or 0) + c
            want[r["event_id"]] = (i + 1, prev, run)
            prev = c
    got = {
        r["event_id"]: (r["rnk"], r["prev_cents"], r["run_cents"])
        for r in df.collect()
    }
    assert got == want
