"""Wave-47 invariants: json_permissive against the coin replay (and
the syntax-corruption-is-always-detected distinction vs CSV's
pruning trap), events_concurrency against a pure-Python sweep with
the same tie protocol, and agg_approx_quantile's certificate against
a direct rank recount."""

from __future__ import annotations

import hashlib
import math

import numpy as np

from dbpedia_spotlight_db_spark.queries import qio, qsketch, qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _rnd_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_json_permissive_matches_coin_replay(spark):
    rows = t(spark, SF, "events").select("event_id", "user_id").collect()
    n_bad = n_clean = usum = 0
    for r in rows:
        if hashlib.md5(str(r["event_id"]).encode()).hexdigest()[0] < "2":
            n_bad += 1
        else:
            n_clean += 1
            usum += r["user_id"]
    got = qio.Q["json_permissive"](spark, SF).collect()[0]
    assert got["n_corrupt"] == n_bad and n_bad > 0
    assert got["n_clean"] == n_clean
    assert got["clean_user_sum"] == usum


def test_concurrency_matches_sweep_replay(spark):
    rows = t(spark, SF, "events").select("event_type", "ts").collect()
    per: dict[str, list] = {}
    W = qstats._CONC_WIN_US
    for r in rows:
        us = int(r["ts"].timestamp() * 1_000_000)
        per.setdefault(r["event_type"], []).append(us)
    got = {
        r["event_type"]: r
        for r in qstats.Q["events_concurrency"](spark, SF).collect()
    }
    assert set(got) == set(per)
    for et, starts in per.items():
        pts = [(s, 1) for s in starts] + [(s + W, -1) for s in starts]
        pts.sort()  # (t, d): -1 before +1 at equal t
        peak = cur = 0
        for _, d in pts:
            cur += d
            peak = max(peak, cur)
        assert got[et]["n_intervals"] == len(starts)
        assert got[et]["peak"] == peak


def test_approx_quantile_certificate(spark):
    rows = t(spark, SF, "lineitem").select("l_extendedprice").collect()
    cents = np.array(
        [_rnd_away(r["l_extendedprice"] * 100) for r in rows], float
    )
    got = {
        r["p"]: r
        for r in qsketch.Q["agg_approx_quantile"](spark, SF).collect()
    }
    assert set(got) == {0.25, 0.50, 0.75}
    for p, r in got.items():
        want4 = _rnd_away(4 * float(np.percentile(cents, 100 * p)))
        assert r["exact4"] == want4
        assert r["rank_ok"] is True
