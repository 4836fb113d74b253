"""Wave-50 invariants: PSI against a pure-Python decile replay
(including the Laplace clip and reference-fit binning),
sql_group_by_all against the DataFrame recount, and map_fns against
a direct dict replay of the map construction + filter."""

from __future__ import annotations

import hashlib
import math

import numpy as np

from dbpedia_spotlight_db_spark.queries import qml, qsql
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _rnd_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_psi_matches_decile_replay(spark):
    rows = (
        t(spark, SF, "events")
        .filter("value IS NOT NULL")
        .select("event_id", "value")
        .collect()
    )
    ref, cur = [], []
    for r in rows:
        cents = _rnd_away(r["value"] * 100)
        if hashlib.md5(str(r["event_id"]).encode()).hexdigest()[0] < "8":
            ref.append(cents)
        else:
            cur.append(cents)
    arr = np.array(sorted(ref), float)
    cuts = [
        _rnd_away(10 * float(np.percentile(arr, 10 * k)))
        for k in range(1, 10)
    ]

    def binof(c):
        return sum(1 for cv in cuts if 10 * c > cv)

    ca = [0] * 10
    cb = [0] * 10
    for c in ref:
        ca[binof(c)] += 1
    for c in cur:
        cb[binof(c)] += 1
    na, nb = len(ref), len(cur)
    psi_micros = 0
    for b in range(10):
        if ca[b] == 0 and cb[b] == 0:
            continue  # bin absent from the grouped cell relation
        a1, b1 = max(ca[b], 1), max(cb[b], 1)
        psi_micros += _rnd_away(
            1e6 * ((a1 / na - b1 / nb) * math.log(a1 * nb / (b1 * na)))
        )
    got = qml.Q["ml_psi"](spark, SF).collect()[0]
    assert got["n_ref"] == na and got["n_cur"] == nb
    assert abs(got["psi"] - psi_micros / 1e6) < 1e-6


def test_group_by_all_matches_recount(spark):
    rows = (
        t(spark, SF, "orders")
        .select("o_orderpriority", "o_orderstatus", "o_totalprice")
        .collect()
    )
    want: dict[tuple, list[int]] = {}
    for r in rows:
        v = want.setdefault((r["o_orderpriority"], r["o_orderstatus"]), [0, 0])
        v[0] += 1
        v[1] += _rnd_away(r["o_totalprice"] * 100)
    got = {
        (r["o_orderpriority"], r["o_orderstatus"]): (r["n"], r["total_cents"])
        for r in qsql.Q["sql_group_by_all"](spark, SF).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}


def test_map_fns_matches_dict_replay(spark):
    rows = (
        t(spark, SF, "events")
        .filter("value IS NOT NULL")
        .select("event_type", "user_id", "value")
        .collect()
    )
    want: dict[tuple, list[int]] = {}
    for r in rows:
        m = {
            "user": r["user_id"],
            "cents": _rnd_away(r["value"] * 100),
        }
        for k, x in m.items():
            if x > 0:
                v = want.setdefault((r["event_type"], k), [0, 0])
                v[0] += 1
                v[1] += x
    got = {
        (r["event_type"], r["mkey"]): (r["n"], r["total"])
        for r in qsql.Q["map_fns"](spark, SF).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}
