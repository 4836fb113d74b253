"""Wave-43 invariants: scan_binaryfile against a relational digest
replay (and bytes_ok actually asserted), events_markov against a
pure-Python two-round power iteration with per-term micros
quantization, feat_robust_scale against numpy type-7 quantiles and a
direct Tukey-fence census."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np

from dbpedia_spotlight_db_spark.queries import qfeat, qio, qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _rnd_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_binaryfile_matches_digest_replay(spark):
    docs = t(spark, SF, "documents").select("lang", "n_chars").collect()
    agg: dict[str, list[int]] = {}
    for r in docs:
        v = agg.setdefault(r["lang"], [0, 0])
        v[0] += 1
        v[1] += r["n_chars"]
    got = {r["lang"]: r for r in qio.Q["scan_binaryfile"](spark, SF).collect()}
    assert set(got) == set(agg)
    import hashlib

    for lang, (n, sc) in agg.items():
        g = got[lang]
        assert g["n_docs"] == n and g["sum_chars"] == sc
        payload = f"{lang}|{n}|{sc}"
        assert g["payload_md5"] == hashlib.md5(payload.encode()).hexdigest()
        assert g["bytes_ok"] is True


def test_markov_matches_power_replay(spark):
    rows = (
        t(spark, SF, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    per_user: dict[int, list] = {}
    for r in rows:
        per_user.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["event_type"])
        )
    cells: Counter = Counter()
    for evs in per_user.values():
        evs.sort()
        for a, b in zip(evs, evs[1:]):
            cells[(a[2], b[2])] += 1
    states = sorted(
        {i for i, _ in cells} | {j for _, j in cells}
    )
    m = len(states)
    ci = Counter()
    for (i, _), c in cells.items():
        ci[i] += c
    v1: Counter = Counter()
    for (i, j), c in cells.items():
        v1[j] += _rnd_away(1_000_000.0 * c / (ci[i] * m))
    v2: Counter = Counter()
    for (i, j), c in cells.items():
        v2[j] += _rnd_away(1.0 * v1[i] * c / ci[i])
    got = {r["state"]: r for r in qstats.Q["events_markov"](spark, SF).collect()}
    assert set(got) == set(states)
    for s in states:
        assert got[s]["p2_micros"] == v2.get(s, 0)
        assert abs(got[s]["p2"] - v2.get(s, 0) / 1e6) < 1e-6
    # two rounds of a (near-)stochastic chain keep total mass ~1
    assert abs(sum(r["p2"] for r in got.values()) - 1.0) < 0.01


def test_robust_scale_matches_numpy_type7(spark):
    rows = (
        t(spark, SF, "events")
        .filter("value IS NOT NULL")
        .select("event_type", "value")
        .collect()
    )
    per: dict[str, list[int]] = {}
    for r in rows:
        per.setdefault(r["event_type"], []).append(
            _rnd_away(r["value"] * 100)
        )
    got = {
        r["event_type"]: r
        for r in qfeat.Q["feat_robust_scale"](spark, SF).collect()
    }
    assert set(got) == set(per)
    for et, cents in per.items():
        a = np.array(sorted(cents), dtype=np.float64)
        # numpy 'linear' interpolation IS type-7
        q1, med, q3 = (float(np.percentile(a, p)) for p in (25, 50, 75))
        q14, med4, q34 = (
            _rnd_away(4 * q1),
            _rnd_away(4 * med),
            _rnd_away(4 * q3),
        )
        iqr4 = q34 - q14
        outl = sum(
            1
            for c in cents
            if 8 * c < 2 * q14 - 3 * iqr4 or 8 * c > 2 * q34 + 3 * iqr4
        )
        g = got[et]
        assert g["n"] == len(cents)
        assert abs(g["median_val"] - med4 / 400.0) < 1e-6
        assert abs(g["q1"] - q14 / 400.0) < 1e-6
        assert abs(g["q3"] - q34 / 400.0) < 1e-6
        assert abs(g["iqr"] - iqr4 / 400.0) < 1e-6
        assert g["n_outliers"] == outl
