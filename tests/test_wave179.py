"""Wave-179 invariants: Cochran's C replays from exact per-type
moments with the homogeneity pin; the bigram conditional entropy
replays through the micros quantization and respects its
information-theoretic bounds."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from dbpedia_spotlight_db_spark.queries import qadv, qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_cochrans_c_matches_replay(spark):
    g = defaultdict(lambda: [0, 0, 0])
    for r in t(spark, SF, "events").collect():
        if r["value"] is None:
            continue
        c = round(r["value"] * 100)
        a = g[r["event_type"]]
        a[0] += 1
        a[1] += c
        a[2] += c * c
    var = {}
    for ty, (n, s1, s2) in g.items():
        if n >= 2:
            var[ty] = (n * s2 - s1 * s1) / (n * (n - 1))
    k = len(var)
    sv = sum(var.values())
    mx_ty = min(
        (ty for ty in var), key=lambda ty: (-var[ty], ty)
    )
    c_stat = var[mx_ty] / sv
    got = qstats.Q["stat_cochrans_c"](spark, SF).collect()[0]
    assert (got["n_groups"], got["max_var_type"]) == (k, mx_ty)
    assert abs(got["c_stat"] - round(c_stat, 6)) <= 1e-9
    # shared distribution: near 1/k, inside the 3/k band
    assert abs(c_stat - 1.0 / k) < 0.1
    assert got["homogeneous"] is True


def test_bigram_entropy_matches_replay(spark):
    cb = Counter()
    for r in t(spark, SF, "documents").collect():
        arr = [w for w in (r["text"] or "").split(" ")]
        for i in range(len(arr) - 1):
            if arr[i] != "" and arr[i + 1] != "":
                cb[(arr[i], arr[i + 1])] += 1
    cx = Counter()
    for (w1, _), c in cb.items():
        cx[w1] += c
    n = sum(cb.values())
    h_mic = sum(
        round(1e6 * c * math.log(cx[w1] / c))
        for (w1, _), c in cb.items()
    )
    got = qadv.Q["text_bigram_entropy"](spark, SF).collect()[0]
    assert (got["n_bigrams"], got["h_mic"]) == (n, h_mic)
    h_bits = h_mic / 1e6 / n / math.log(2.0)
    assert abs(got["h_bits"] - round(h_bits, 6)) <= 1e-9
    # bounds: 0 <= H(Y|X) <= log2 |vocab of successors|
    vocab2 = len({w2 for _, w2 in cb})
    assert 0.0 <= got["h_bits"] <= math.log2(vocab2) + 1e-6
    # context buys information: H(Y|X) < H(Y) (unigram entropy)
    cy = Counter()
    for (_, w2), c in cb.items():
        cy[w2] += c
    h_y = sum(
        -c / n * math.log2(c / n) for c in cy.values()
    )
    assert got["h_bits"] < h_y
