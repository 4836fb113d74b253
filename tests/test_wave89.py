"""Wave-89 invariants: the widened read reproduces float32
truncation exactly; the in-row moment fold equals an explode replay;
the permutation test's 64 md5 sign patterns match hashlib."""

from __future__ import annotations

import hashlib
import math
import struct

from dbpedia_spotlight_db_spark.queries import qcorpus, qio, qml
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _rnd_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def _f32(x: float) -> float:
    return struct.unpack("f", struct.pack("f", x))[0]


def test_type_widening_matches_f32_truncation(spark):
    rows = (
        t(spark, SF, "events")
        .filter("event_id <= 2147483647 AND value IS NOT NULL")
        .select("event_id", "value")
        .collect()
    )
    got = qio.Q["scan_type_widening"](spark, SF).collect()[0]
    assert got["widened"] is True
    assert got["n"] == len(rows)
    assert got["id_sum"] == sum(r["event_id"] for r in rows)
    assert got["cents_sum"] == sum(
        _rnd_away(_f32(r["value"]) * 100) for r in rows
    )
    # the narrowed write really loses float64 precision (the cents
    # themselves survive at these magnitudes — <= ~$490 with 2
    # decimals sits inside float32's ~7 significant digits — but
    # the raw representation must differ for most values)
    assert any(_f32(r["value"]) != r["value"] for r in rows)


def test_inrow_moments_equal_explode_replay(spark):
    agg: dict[str, list[int]] = {}
    for r in (
        t(spark, SF, "documents")
        .filter("text IS NOT NULL")
        .select("lang", "text")
        .collect()
    ):
        a = agg.setdefault(r["lang"], [0, 0, 0])
        for tk in r["text"].split(" "):
            if tk == "":
                continue
            a[0] += 1
            a[1] += len(tk)
            a[2] += len(tk) * len(tk)
    got = {
        r["lang"]: r
        for r in qcorpus.Q["text_inrow_moments"](spark, SF).collect()
    }
    assert set(got) == set(agg)
    for lang, (n, s, q) in agg.items():
        r = got[lang]
        assert (r["n_tokens"], r["len_sum"], r["len_sumsq"]) == (n, s, q)
        assert abs(
            r["len_var"] - round((n * q - s * s) / (float(n) * n), 6)
        ) < 1e-9


def test_perm_test_matches_hashlib_replay(spark):
    daily: dict[int, int] = {}
    for r in (
        t(spark, SF, "events")
        .filter("ts IS NOT NULL AND value IS NOT NULL")
        .select("event_id", "ts", "value")
        .collect()
    ):
        day = (r["ts"].date() - __import__("datetime").date(2024, 1, 1)).days
        c = _rnd_away(r["value"] * 100)
        sgn = (
            1
            if hashlib.md5(str(r["event_id"]).encode()).hexdigest()[0] < "8"
            else -1
        )
        daily[day] = daily.get(day, 0) + sgn * c
    d = {k: v // 100 if v >= 0 else -((-v) // 100) for k, v in daily.items()}
    # Spark/DuckDB integer div truncates toward zero; python // floors
    t_obs = sum(d.values())
    n_extreme = 0
    for k in range(qml._PERM_K):
        t_k = 0
        for day, dv in d.items():
            coin = hashlib.md5(f"{day}:{k}".encode()).hexdigest()[0] < "8"
            t_k += dv if coin else -dv
        if abs(t_k) >= abs(t_obs):
            n_extreme += 1
    got = qml.Q["stat_perm_test"](spark, SF).collect()[0]
    assert got["n_days"] == len(d)
    assert got["t_obs"] == t_obs
    assert got["n_extreme"] == n_extreme
    assert abs(
        got["p_value"] - round((1.0 + n_extreme) / (1.0 + qml._PERM_K), 6)
    ) < 1e-9
