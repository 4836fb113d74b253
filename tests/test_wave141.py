"""Wave-141 invariants: Cliff's delta equals the brute-force pair
count (grid machinery vs quadratic definition), ties count for
neither side, and Fleiss' kappa matches a pure-Python replay of the
first-3-events rating panel with its exact-integer identity."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

from dbpedia_spotlight_db_spark.queries import qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _half(event_id: int) -> bool:
    return hashlib.md5(str(event_id).encode()).hexdigest()[0] < "8"


def test_cliff_delta_matches_brute_force(spark):
    a, b = [], []
    for r in t(spark, SF, "events").collect():
        if r["value"] is None:
            continue
        v = round(r["value"] * 100)
        (a if _half(r["event_id"]) else b).append(v)
    ca, cb = Counter(a), Counter(b)
    gt = sum(
        na * nb for x, na in ca.items() for y, nb in cb.items() if x > y
    )
    lt = sum(
        na * nb for x, na in ca.items() for y, nb in cb.items() if x < y
    )
    got = qstats.Q["stat_cliff_delta"](spark, SF).collect()[0]
    assert (got["n_a"], got["n_b"]) == (len(a), len(b))
    assert (got["n_gt"], got["n_lt"]) == (gt, lt)
    assert abs(
        got["delta"] - round((gt - lt) / (len(a) * len(b)), 6)
    ) <= 1e-9
    # md5 halves share one distribution: |delta| must sit in the null bulk
    assert abs(got["delta"]) < 0.1
    # ties contribute to neither count
    assert gt + lt < len(a) * len(b)


def test_fleiss_kappa_matches_replay(spark):
    by_user = defaultdict(list)
    for r in t(spark, SF, "events").collect():
        by_user[r["user_id"]].append(
            (r["ts"], r["event_id"], r["event_type"])
        )
    panel = {}
    for u, evs in by_user.items():
        if len(evs) < 3:
            continue
        evs.sort(key=lambda x: (x[0], x[1]))
        panel[u] = Counter(e[2] for e in evs[:3])
    nn = len(panel)
    ssq = sum(c * c for cnt in panel.values() for c in cnt.values())
    cj = Counter()
    for cnt in panel.values():
        cj.update(cnt)
    s2 = sum(c * c for c in cj.values())
    a_exc = ssq - 3 * nn
    got = qstats.Q["stat_fleiss_kappa"](spark, SF).collect()[0]
    assert (got["n_items"], got["a_excess"], got["s2"]) == (
        nn, a_exc, s2,
    )
    assert nn > 0 and sum(cj.values()) == 3 * nn
    kappa = (3 * nn * a_exc - 2 * s2) / (2 * (9 * nn * nn - s2))
    assert abs(got["kappa"] - round(kappa, 6)) <= 1e-9
    # agreement bounds: p_o, p_e are probabilities; kappa <= 1
    assert 0.0 <= got["p_o"] <= 1.0 and 0.0 < got["p_e"] <= 1.0
    assert got["kappa"] <= 1.0
