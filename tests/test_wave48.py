"""Wave-48 invariants: embed_norms against a numpy norm replay (with
the per-element micros quantization), stat_runs against a pure-Python
runs-test replay, and hive_dynamic_overwrite against both the
expected final state AND the on-disk partition layout (the static
mode would have deleted the sibling partitions)."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np

from dbpedia_spotlight_db_spark.queries import qembed, qio, qml
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _rnd_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_embed_norms_matches_numpy_replay(spark):
    rows = (
        t(spark, SF, "embeddings")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    per: dict[int, list[int]] = {}
    for r in rows:
        n2 = sum(
            _rnd_away(1e6 * (float(x) * float(x))) for x in r["embedding"]
        )
        per.setdefault(r["label"], []).append(n2)
    got = {r["label"]: r for r in qembed.Q["embed_norms"](spark, SF).collect()}
    assert set(got) == set(per)
    for lab, n2s in per.items():
        a = np.array(sorted(n2s), float)
        q14 = _rnd_away(4 * float(np.percentile(a, 25)))
        q34 = _rnd_away(4 * float(np.percentile(a, 75)))
        iqr4 = q34 - q14
        outl = sum(
            1
            for v in n2s
            if 8 * v < 2 * q14 - 3 * iqr4 or 8 * v > 2 * q34 + 3 * iqr4
        )
        g = got[lab]
        assert g["n"] == len(n2s)
        assert abs(g["mean_norm2"] - sum(n2s) / (1e6 * len(n2s))) < 1e-6
        assert g["n_outliers"] == outl


def test_runs_matches_replay(spark):
    rows = (
        t(spark, SF, "events")
        .filter("value IS NOT NULL")
        .select("ts", "value")
        .collect()
    )
    daily: Counter = Counter()
    for r in rows:
        day = int(r["ts"].timestamp() * 1e6) // 86_400_000_000
        daily[day] += _rnd_away(r["value"] * 100)
    vals = np.array(sorted(daily.values()), float)
    med4 = _rnd_away(4 * float(np.percentile(vals, 50)))
    seq = [
        1 if 4 * daily[d] > med4 else 0
        for d in sorted(daily)
        if 4 * daily[d] != med4
    ]
    n1, n2 = sum(seq), len(seq) - sum(seq)
    r_runs = sum(
        1 for i, v in enumerate(seq) if i == 0 or seq[i - 1] != v
    )
    nt = n1 + n2
    mu = 2.0 * n1 * n2 / nt + 1
    var = (
        2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
        / (nt * nt * (nt - 1.0))
    )
    want_z = (r_runs - mu) / math.sqrt(var)
    got = qml.Q["stat_runs"](spark, SF).collect()[0]
    assert (got["n1"], got["n2"], got["n_runs"]) == (n1, n2, r_runs)
    assert abs(got["z"] - want_z) < 1e-6


def test_dynamic_overwrite_preserves_siblings(spark):
    import hashlib

    docs = t(spark, SF, "documents").select("doc_id", "lang").collect()
    want: dict[str, list[int]] = {}
    for r in docs:
        keep = r["lang"] != "en" or hashlib.md5(
            str(r["doc_id"]).encode()
        ).hexdigest()[0] < "8"
        if keep:
            v = want.setdefault(r["lang"], [0, 0])
            v[0] += 1
            v[1] += r["doc_id"]
    got = {
        r["lang"]: (r["n_docs"], r["id_sum"])
        for r in qio.Q["hive_dynamic_overwrite"](spark, SF).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}
    # the en partition genuinely shrank; the others genuinely survived
    full = Counter(r["lang"] for r in docs)
    assert got["en"][0] < full["en"]
    for lang in full:
        if lang != "en":
            assert got[lang][0] == full[lang]
