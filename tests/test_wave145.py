"""Wave-145 invariants: the Bloom certificate's set-semantics counts
match a pure-Python bitmap replay (bitmap == distinct-position-set
equivalence), disjointness of insert/probe keys holds, the realized
fill ratio stays below saturation, and the DP mean replays exactly
through the seeded Laplace inverse CDF while staying in a bounded
neighborhood of the true clamped mean."""

from __future__ import annotations

import hashlib
import math

from dbpedia_spotlight_db_spark.queries import qfeat, qsketch
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _pos(i: int, k: int) -> int:
    return int(
        hashlib.md5(f"b{i}:{k}".encode()).hexdigest()[:8], 16
    ) % 65536


def test_bloom_cert_matches_bitmap_replay(spark):
    docs = [r["doc_id"] for r in t(spark, SF, "documents").collect()]
    ins = sorted({d for d in docs if d % 4 == 0})
    bitmap = set()
    for k in ins:
        for i in (1, 2, 3):
            bitmap.add(_pos(i, k))
    probes = [d + 1_000_000_000_000 for d in docs]
    assert not set(probes) & set(ins)  # guaranteed-absent probes
    n_fp = sum(
        1
        for k in probes
        if all(_pos(i, k) in bitmap for i in (1, 2, 3))
    )
    got = qsketch.Q["agg_bloom_fpp_cert"](spark, SF).collect()[0]
    assert (got["n_keys"], got["bits_set"], got["n_probes"]) == (
        len(ins), len(bitmap), len(probes),
    )
    assert got["n_fp"] == n_fp
    rho = len(bitmap) / 65536.0
    assert rho < 0.5  # below saturation at the test regime
    assert abs(got["fpp_theory"] - round(rho * rho * rho, 6)) <= 1e-9
    assert got["calibrated"] is True


def _u(seed: str) -> float:
    h = int(hashlib.md5(seed.encode()).hexdigest()[:8], 16)
    return (h + 1) / 4294967298.0


def _lap(u: float) -> float:
    sgn = 1.0 if u >= 0.5 else -1.0
    return -sgn * math.log(1.0 - 2.0 * abs(u - 0.5))


def test_dp_mean_matches_replay(spark):
    n = 0
    s_c = 0
    for r in t(spark, SF, "events").collect():
        if r["value"] is None:
            continue
        n += 1
        s_c += min(max(round(r["value"] * 100), 0), 10000)
    noisy_sum = round(1e6 * (s_c / 100.0 + 200.0 * _lap(_u("dpmean:sum"))))
    noisy_cnt = round(1e6 * (n + 2.0 * _lap(_u("dpmean:cnt"))))
    got = qfeat.Q["privacy_dp_mean"](spark, SF).collect()[0]
    assert (got["noisy_sum_mic"], got["noisy_cnt_mic"]) == (
        noisy_sum, noisy_cnt,
    )
    assert abs(got["dp_mean"] - round(noisy_sum / noisy_cnt, 6)) <= 1e-9
    # the release sits near the true clamped mean (b_sum/n ~ 0.2$)
    true_mean = s_c / 100.0 / n
    assert abs(got["dp_mean"] - true_mean) < 2.0
    # the raw aggregates are NOT in the output schema
    assert set(got.asDict()) == {
        "noisy_sum_mic", "noisy_cnt_mic", "dp_mean",
    }
