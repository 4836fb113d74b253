"""Wave-133 invariants: Games-Howell matches the pairwise Welch
replay over all 10 pairs (and every |t| is small on the null-true
fixture); the multi-path load lists both roots and reconstructs the
corpus exactly."""

from __future__ import annotations

import math
import statistics
from collections import defaultdict

from dbpedia_spotlight_db_spark.queries import qio, qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_games_howell_matches_pairwise_replay(spark):
    vals = defaultdict(list)
    for r in t(spark, SF, "events").collect():
        if r["value"] is not None:
            vals[r["event_type"]].append(round(r["value"] * 100))
    mom = {
        et: (len(v), statistics.fmean(v), statistics.variance(v))
        for et, v in vals.items()
        if len(v) >= 2
    }
    types = sorted(mom)
    expect = {}
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            na, ma, sa = mom[ta]
            nb, mb, sb = mom[tb]
            se2 = sa / na + sb / nb
            df = se2 * se2 / (
                sa * sa / (na * na * (na - 1))
                + sb * sb / (nb * nb * (nb - 1))
            )
            expect[(ta, tb)] = (
                na, nb,
                round((ma - mb) / math.sqrt(se2), 6), round(df, 6),
            )
    got = {
        (r["type_a"], r["type_b"]): (
            r["na"], r["nb"], r["t_stat"], r["df"],
        )
        for r in qstats.Q["stat_games_howell"](spark, SF).collect()
    }
    assert set(got) == set(expect) and len(got) == 10
    for k in expect:
        assert got[k][:2] == expect[k][:2]
        assert abs(got[k][2] - expect[k][2]) <= 1e-6
        assert abs(got[k][3] - expect[k][3]) <= 1e-4
        assert abs(got[k][2]) < 5  # null-true fixture


def test_multipath_reconstructs_corpus(spark):
    rows = qio.Q["scan_multipath"](spark, SF).collect()
    assert rows and all(r["both_roots_listed"] for r in rows)
    exp = defaultdict(lambda: [0, 0])
    for r in t(spark, SF, "events").collect():
        exp[r["event_type"]][0] += 1
        exp[r["event_type"]][1] += r["event_id"]
    assert {r["event_type"]: [r["n"], r["id_sum"]] for r in rows} == dict(
        exp
    )
