"""Wave-65 invariants: nested pruning must keep text out of
ReadSchema and push the struct-leaf filter, burstiness must replay
from second-floored gaps, vocabulary Jaccard must replay from token
sets, and the numeric RANGE frame must match a brute band count."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qadv, qcorpus, qio, qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _rnd_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_nested_prune_reads_only_needed_leaves(spark):
    df = qio.Q["scan_nested_prune"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan, plan
    rs = scan[0]
    assert "text" not in rs  # payload never read
    assert "lang" in rs and "n_chars" in rs
    want = {
        r["lang"]: (r["n"], r["chars"])
        for r in t(spark, SF, "documents")
        .filter("source = 'src7'")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("chars")
        )
        .collect()
    }
    got = {
        r["lang"]: (r["n_docs"], r["sum_chars"]) for r in df.collect()
    }
    assert got == want and got


def test_burstiness_matches_gap_replay(spark):
    rows = (
        t(spark, SF, "events")
        .filter("ts IS NOT NULL")
        .select(
            "event_type",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
            "event_id",
        )
        .collect()
    )
    per_type: dict[str, list] = {}
    for r in rows:
        per_type.setdefault(r["event_type"], []).append(
            (r["us"], r["event_id"])
        )
    got = {
        r["event_type"]: (r["n_gaps"], r["mean_gap_s"], r["burstiness"])
        for r in qadv.Q["events_burstiness"](spark, SF).collect()
    }
    assert set(got) == set(per_type)
    for et, evs in per_type.items():
        evs.sort()
        gaps = [
            (b[0] - a[0]) // 1000000 for a, b in zip(evs, evs[1:])
        ]
        n = len(gaps)
        g = got[et]
        assert g[0] == n
        if n == 0:
            assert g[1] is None
            continue
        s1 = sum(gaps)
        assert g[1] == s1 // n
        if n < 2 or s1 == 0:
            assert g[2] is None
            continue
        s2 = sum(x * x for x in gaps)
        sd = math.sqrt((n * s2 - s1 * s1) / (n * (n - 1.0)))
        mu = s1 / n
        assert abs(g[2] - round((sd - mu) / (sd + mu), 6)) < 1e-9
        assert -1.0 <= g[2] <= 1.0


def test_vocab_overlap_matches_set_replay(spark):
    vocab: dict[str, set] = {}
    for r in (
        t(spark, SF, "documents")
        .filter("text IS NOT NULL")
        .select("lang", "text")
        .collect()
    ):
        vocab.setdefault(r["lang"], set()).update(
            w for w in r["text"].split(" ") if w
        )
    langs = sorted(vocab)
    want = {}
    for i, a in enumerate(langs):
        for b in langs[i + 1 :]:
            inter = len(vocab[a] & vocab[b])
            if inter:
                want[(a, b)] = (
                    inter,
                    len(vocab[a]),
                    len(vocab[b]),
                    round(inter / len(vocab[a] | vocab[b]), 6),
                )
    got = {
        (r["lang_a"], r["lang_b"]): (
            r["n_common"],
            r["nv_a"],
            r["nv_b"],
            r["jaccard"],
        )
        for r in qcorpus.Q["text_vocab_overlap"](spark, SF).collect()
    }
    assert set(got) == set(want)
    for k, w in want.items():
        g = got[k]
        assert g[:3] == w[:3]
        assert abs(g[3] - w[3]) < 1e-9


def test_value_range_matches_brute_band(spark):
    rows = (
        t(spark, SF, "events")
        .filter("value IS NOT NULL")
        .select("event_id", "event_type", "value")
        .collect()
    )
    per_type: dict[str, list] = {}
    for r in rows:
        per_type.setdefault(r["event_type"], []).append(
            (r["event_id"], _rnd_away(r["value"] * 100))
        )
    want = {}
    for et, evs in per_type.items():
        cents = sorted(c for _, c in evs)
        import bisect

        for eid, c in evs:
            lo = bisect.bisect_left(cents, c - 500)
            hi = bisect.bisect_right(cents, c + 500)
            band = cents[lo:hi]
            want[eid] = (c, len(band) - 1, sum(band) - c)
    got = {
        r["event_id"]: (r["cents"], r["n_near"], r["near_cents"])
        for r in qstats.Q["win_value_range"](spark, SF).collect()
    }
    assert got == want
