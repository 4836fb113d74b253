"""Wave-114 invariants: the DP top-k release equals the md5-Gumbel
replay bit-for-bit (and, at this epsilon and these count gaps, the
mechanism's selection equals the true top-3 — the utility check);
TOST declares equivalence on the A/A split with both one-sided
statistics far from the critical value, and the replay agrees."""

from __future__ import annotations

import hashlib
import math
import statistics
from collections import Counter

from dbpedia_spotlight_db_spark.queries import qfeat, qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_dp_topk_matches_gumbel_replay(spark):
    cnt = Counter(
        r["event_type"] for r in t(spark, SF, "events").collect()
    )
    noisy = {}
    for et, n in cnt.items():
        h = int(hashlib.md5(f"dptopk:{et}".encode()).hexdigest()[:8], 16)
        u = (h + 1) / 4294967298.0
        x = 1e6 * (n + 2.0 * (-math.log(-math.log(u))))
        noisy[et] = math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5)
    expect = sorted(noisy.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    got = sorted(
        qfeat.Q["privacy_dp_topk"](spark, SF).collect(),
        key=lambda r: r["rnk"],
    )
    assert [(r["event_type"], r["noisy_mic"]) for r in got] == expect
    assert [r["rnk"] for r in got] == [1, 2, 3]
    # utility at eps=1 with these gaps: the release IS the true top-3
    true_top = {et for et, _ in cnt.most_common(3)}
    assert {r["event_type"] for r in got} == true_top


def test_tost_equivalent_on_aa_split(spark):
    xs = {"a": [], "b": []}
    for r in t(spark, SF, "orders").collect():
        h = hashlib.md5(str(r["o_orderkey"]).encode()).hexdigest()[0]
        xs["a" if h < "8" else "b"].append(r["o_totalprice"])
    na, nb = len(xs["a"]), len(xs["b"])
    ma, mb = statistics.fmean(xs["a"]), statistics.fmean(xs["b"])
    va, vb = statistics.variance(xs["a"]), statistics.variance(xs["b"])
    se = math.sqrt(va / na + vb / nb)
    delta = 0.10 * abs((ma + mb) / 2)
    got = qstats.Q["stat_tost"](spark, SF).collect()[0]
    assert (got["n_a"], got["n_b"]) == (na, nb)
    assert abs(got["diff"] - (ma - mb)) <= 1e-4
    assert abs(got["t_lower"] - (ma - mb + delta) / se) <= 1e-3
    assert abs(got["t_upper"] - (ma - mb - delta) / se) <= 1e-3
    # non-degenerate: both statistics clear the gate by a wide margin
    assert got["t_lower"] > 2 and got["t_upper"] < -2
    assert got["equivalent"] is True
