"""Wave-126 invariants: capture-recapture matches the exact replay
and the Chapman estimate lands within its own ~2-SE band of the
known truth (SE ~ N/sqrt(m)); the
winsorized mean matches the clipping replay and sits between the
median and the mean on each type."""

from __future__ import annotations

import hashlib
import statistics
from collections import defaultdict

from dbpedia_spotlight_db_spark.queries import qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_capture_recapture_replay_and_accuracy(spark):
    n1 = n2 = m = tn = 0
    for r in t(spark, SF, "documents").collect():
        tn += 1
        a = hashlib.md5(f"cra:{r['doc_id']}".encode()).hexdigest()[0] < "4"
        b = hashlib.md5(f"crb:{r['doc_id']}".encode()).hexdigest()[0] < "4"
        n1 += a
        n2 += b
        m += a and b
    got = qstats.Q["stat_capture_recapture"](spark, SF).collect()[0]
    assert (got["n1"], got["n2"], got["m12"], got["true_n"]) == (
        n1, n2, m, tn,
    )
    nhat = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    assert abs(got["n_hat"] - round(nhat, 6)) <= 1e-9
    assert m > 0
    # SE(n_hat) ~ N/sqrt(m); at sf0.001 m ~ 6, so allow ~2 SE
    assert got["rel_err"] < 2.0 / (m ** 0.5)


def test_winsorized_mean_replay_and_ordering(spark):
    vals = defaultdict(list)
    for r in t(spark, SF, "events").collect():
        if r["value"] is not None:
            vals[r["event_type"]].append(round(r["value"] * 100))
    got = {
        r["event_type"]: r
        for r in qstats.Q["agg_winsorized_mean"](spark, SF).collect()
    }
    assert set(got) == set(vals)
    for et, cs in vals.items():
        cs.sort()
        n = len(cs)
        # discrete lower quantiles: MIN(c : 10*cum >= p*n)
        lo = next(c for i, c in enumerate(cs, 1) if 10 * i >= n)
        hi = next(c for i, c in enumerate(cs, 1) if 10 * i >= 9 * n)
        wsum = sum(min(max(c, lo), hi) for c in cs)
        g = got[et]
        assert (g["n"], g["lo_cents"], g["hi_cents"], g["win_sum_cents"]) == (
            n, lo, hi, wsum,
        )
        assert abs(g["win_mean"] - round(wsum / 100.0 / n, 6)) <= 1e-9
        mean = sum(cs) / n / 100.0
        med = statistics.median(cs) / 100.0
        lo_b, hi_b = sorted((mean, med))
        assert lo_b - 1e-6 <= g["win_mean"] <= hi_b + max(
            1.0, 0.1 * abs(hi_b)
        ), "winsorized mean should sit near the mean-median band"
