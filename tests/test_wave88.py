"""Wave-88 invariants: Wasserstein's exact integer transport and
CvM's quantized L2 both match scipy-free pure-Python replays over the
same md5 split; the output-sizing face honors maxRecordsPerFile and
the closed-form file count."""

from __future__ import annotations

import hashlib
import math

from dbpedia_spotlight_db_spark.queries import qlake, qml
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _rnd_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def _halves(spark):
    a, b = [], []
    for r in (
        t(spark, SF, "events")
        .filter("value IS NOT NULL")
        .select("event_id", "value")
        .collect()
    ):
        v = _rnd_away(r["value"] * 100)
        h = hashlib.md5(str(r["event_id"]).encode()).hexdigest()
        (a if h[0] < "8" else b).append(v)
    return a, b


def test_wasserstein_matches_transport_replay(spark):
    a, b = _halves(spark)
    support = sorted(set(a) | set(b))
    na, nb = len(a), len(b)
    ca = cb = 0
    w1 = 0
    from collections import Counter

    cnta, cntb = Counter(a), Counter(b)
    for v, nxt in zip(support, support[1:]):
        ca += cnta[v]
        cb += cntb[v]
        w1 += abs(ca * nb - cb * na) * (nxt - v)
    got = qml.Q["stat_wasserstein"](spark, SF).collect()[0]
    assert (got["n_a"], got["n_b"]) == (na, nb)
    assert got["w1_scaled"] == w1
    assert abs(got["w1_dollars"] - round(w1 / na / nb / 100.0, 6)) < 1e-9
    # A/A split: mass moved should be far below the mean value
    assert got["w1_dollars"] < 10.0


def test_cvm_matches_quantized_replay(spark):
    a, b = _halves(spark)
    from collections import Counter

    cnta, cntb = Counter(a), Counter(b)
    support = sorted(set(a) | set(b))
    na, nb = len(a), len(b)
    ca = cb = 0
    tsum = 0
    for v in support:
        ca += cnta[v]
        cb += cntb[v]
        d = float(ca * nb - cb * na) / (float(na) * nb)
        tsum += _rnd_away(1e6 * (cnta[v] + cntb[v]) * d * d)
    t_stat = float(na) * nb / ((na + nb) * (na + nb) * 1.0) * (
        tsum / 1e6
    )
    got = qml.Q["stat_cvm"](spark, SF).collect()[0]
    assert (got["n_a"], got["n_b"]) == (na, nb)
    assert got["sum_t_us"] == tsum
    assert abs(got["t_stat"] - round(t_stat, 6)) < 1e-9


def test_output_sizing_bounds_files(spark):
    row = qlake.Q["lake_output_sizing"](spark, SF).collect()[0]
    ev = t(spark, SF, "events")
    n = ev.count()
    assert row["n_rows"] == n
    assert row["n_files"] == (n + qlake._MAXREC - 1) // qlake._MAXREC
    assert row["size_ok"] is True
    assert row["id_sum"] == sum(
        r["event_id"] for r in ev.select("event_id").collect()
    )
