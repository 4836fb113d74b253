"""Wave-68 invariants: Burrows' Delta against a z-score replay,
Ljung-Box against a global-mean autocorrelation replay, the group
split against a per-user partition replay (straddlers must be zero),
and uptime against a bucket-presence replay."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qadv, qcorpus, qml
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"
B6H = 21600000000


def _rnd_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_burrows_delta_matches_zscore_replay(spark):
    tf: dict[tuple, int] = {}
    for r in (
        t(spark, SF, "documents")
        .filter("text IS NOT NULL")
        .select("source", "text")
        .collect()
    ):
        for w in r["text"].split(" "):
            if w:
                tf[(r["source"], w)] = tf.get((r["source"], w), 0) + 1
    tot: dict[str, int] = {}
    wtot: dict[str, int] = {}
    for (s, w), c in tf.items():
        tot[s] = tot.get(s, 0) + c
        wtot[w] = wtot.get(w, 0) + c
    topw = sorted(wtot, key=lambda w: (-wtot[w], w))[:30]
    sources = sorted(tot)
    z: dict[tuple, float] = {}
    for w in topw:
        fs = {s: tf.get((s, w), 0) * 1e6 / tot[s] for s in sources}
        mu = sum(fs.values()) / len(sources)
        var = sum((x - mu) ** 2 for x in fs.values()) / (len(sources) - 1)
        sd = math.sqrt(var)
        if sd == 0:
            continue
        for s in sources:
            z[(s, w)] = (fs[s] - mu) / sd
    want = {}
    for i, a in enumerate(sources):
        for b in sources[i + 1 :]:
            terms = [
                _rnd_away(1e6 * abs(z[(a, w)] - z[(b, w)]))
                for w in topw
                if (a, w) in z
            ]
            if terms:
                want[(a, b)] = round(sum(terms) / 1e6 / len(terms), 6)
    top20 = dict(
        sorted(want.items(), key=lambda kv: (kv[1], kv[0]))[:20]
    )
    got = {
        (r["src_a"], r["src_b"]): r["delta"]
        for r in qcorpus.Q["text_burrows_delta"](spark, SF).collect()
    }
    assert set(got) == set(top20)
    for k, v in top20.items():
        assert abs(got[k] - v) < 2e-6, (k, got[k], v)


def test_ljung_box_matches_global_mean_acf(spark):
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
    d = {day: c // 100 for day, c in daily.items()}
    n = len(d)
    sv = sum(d.values())
    svv = sum(v * v for v in d.values())
    den = svv - sv * sv / n
    q = 0.0
    k_lags = 0
    for lag in range(1, 8):
        pairs = [
            (d[x], d[x + lag]) for x in d if x + lag in d
        ]
        if not pairs or den <= 0:
            continue
        sxy = sum(a * b for a, b in pairs)
        sx = sum(a for a, _ in pairs)
        sy = sum(b for _, b in pairs)
        r_n = _rnd_away(1e9 * (sxy - sx * sy / len(pairs)) / den)
        rr = r_n / 1e9
        q += rr * rr / (n - lag)
        k_lags += 1
    q *= n * (n + 2.0)
    got = qml.Q["stat_ljung_box"](spark, SF).collect()[0]
    assert (got["n_days"], got["n_lags"]) == (n, k_lags)
    assert abs(got["q_lb"] - round(q, 6)) < 1e-6


def test_group_split_has_zero_straddlers(spark):
    rows = (
        t(spark, SF, "events")
        .filter("user_id IS NOT NULL")
        .select("user_id")
        .collect()
    )
    want: dict[str, list] = {}
    users: dict[str, set] = {}
    for r in rows:
        side = (
            "train"
            if hashlib.md5(f"split:{r['user_id']}".encode()).hexdigest()[0]
            < "c"
            else "test"
        )
        v = want.setdefault(side, [0])
        v[0] += 1
        users.setdefault(side, set()).add(r["user_id"])
    got = {
        r["split"]: (r["n_events"], r["n_users"], r["n_straddlers"], r["frac"])
        for r in qml.Q["ml_group_split"](spark, SF).collect()
    }
    total = len(rows)
    for side, v in want.items():
        g = got[side]
        assert g[0] == v[0] and g[1] == len(users[side])
        assert g[2] == 0  # the leakage certificate
        assert abs(g[3] - round(v[0] / total, 6)) < 1e-9
    assert not (users.get("train", set()) & users.get("test", set()))


def test_uptime_matches_bucket_presence(spark):
    rows = (
        t(spark, SF, "events")
        .filter("ts IS NOT NULL")
        .select(
            "event_type",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        )
        .collect()
    )
    per_type: dict[str, set] = {}
    for r in rows:
        per_type.setdefault(r["event_type"], set()).add(r["us"] // B6H)
    got = {
        r["event_type"]: (
            r["up_buckets"],
            r["span_buckets"],
            r["gap_buckets"],
            r["availability"],
        )
        for r in qadv.Q["events_uptime"](spark, SF).collect()
    }
    assert set(got) == set(per_type)
    for et, buckets in per_type.items():
        span = max(buckets) - min(buckets) + 1
        up = len(buckets)
        g = got[et]
        assert g[:3] == (up, span, span - up)
        assert abs(g[3] - round(up / span, 6)) < 1e-9
        assert 0 < g[3] <= 1.0
