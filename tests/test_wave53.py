"""Wave-53 invariants: 2-hop betweenness against a wedge replay
(including the distance-2 anti-join and the 1/sigma credit split),
Cohen's d against a moment replay, the try_* faces against a
Spark-semantics parse replay, and the streaming sliding window
against a batch fan-out replay of the watermark emission rule."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qml, qpipe, qrel, qsql
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"
DAY_US = 86400000000


def _rnd_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_betweenness_matches_wedge_replay(spark):
    edges = {
        (r["src"], r["dst"])
        for r in qpipe._undirected_edges(spark, SF).collect()
    }
    adj: dict[str, set[str]] = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    # sigma(u,w) = common neighbours for pairs at distance exactly 2
    middles: dict[tuple, list[str]] = {}
    for u in adj:
        for m in adj[u]:
            for w in adj.get(m, ()):
                if u < w and w not in adj[u]:
                    middles.setdefault((u, w), []).append(m)
    want_paths: dict[str, int] = {}
    want_micros: dict[str, int] = {}
    for pair, ms in middles.items():
        cr = _rnd_away(1e6 / len(ms))
        for m in ms:
            want_paths[m] = want_paths.get(m, 0) + 1
            want_micros[m] = want_micros.get(m, 0) + cr
    got = {
        r["uri"]: (r["n_paths"], r["bc_micros"])
        for r in qpipe.Q["kg_betweenness"](spark, SF).collect()
    }
    assert got == {
        m: (want_paths[m], want_micros[m]) for m in want_paths
    }


def test_cohens_d_matches_moment_replay(spark):
    a, b = [], []
    for r in (
        t(spark, SF, "events")
        .filter("value IS NOT NULL")
        .select("event_id", "value")
        .collect()
    ):
        cents = _rnd_away(r["value"] * 100)
        half = hashlib.md5(str(r["event_id"]).encode()).hexdigest()[0] < "8"
        (a if half else b).append(cents)

    def var_samp(xs):
        n, s1, s2 = len(xs), sum(xs), sum(x * x for x in xs)
        return (n * s2 - s1 * s1) * 1.0 / (n * (n - 1.0))

    na, nb = len(a), len(b)
    pooled_num = var_samp(a) * (na - 1) + var_samp(b) * (nb - 1)
    d = (
        ((sum(a) / na - sum(b) / nb) / 100.0)
        / math.sqrt(pooled_num / (na + nb - 2.0))
        * 100.0
    )
    got = qml.Q["stat_cohens_d"](spark, SF).collect()[0]
    assert (got["n_a"], got["n_b"]) == (na, nb)
    assert abs(got["cohens_d"] - round(d, 6)) < 1e-9


def test_try_cast_matches_spark_grammar_replay(spark):
    rows = (
        t(spark, SF, "orders")
        .select("o_orderkey", "o_totalprice")
        .collect()
    )
    n_parsed = parsed_sum = n_div_null = n_mul_ok = 0
    div_micros = 0
    for r in rows:
        k = r["o_orderkey"]
        cents = _rnd_away(r["o_totalprice"] * 100)
        coin = hashlib.md5(str(k).encode()).hexdigest()[0]
        if coin < "3" or coin < "6":  # both classes parse to k
            n_parsed += 1
            parsed_sum += k
        if k % 5 == 0:
            n_div_null += 1
        else:
            div_micros += _rnd_away(1e6 * cents / (k % 5))
        if abs(k) <= 1:
            n_mul_ok += 1
    got = qsql.Q["sql_try_cast"](spark, SF).collect()[0]
    assert got["n_rows"] == len(rows)
    assert got["n_parsed"] == n_parsed
    assert got["parsed_sum"] == parsed_sum
    assert got["n_div_null"] == n_div_null
    assert abs(got["div_sum"] - round(div_micros / 1e6, 6)) < 1e-9
    assert got["n_mul_ok"] == n_mul_ok


def test_stream_window_matches_batch_fanout(spark):
    rows = (
        t(spark, SF, "events")
        .select(
            F.expr(
                "CAST(unix_micros(CAST(ts AS TIMESTAMP)) AS BIGINT)"
            ).alias("us"),
            "event_type",
            "value",
        )
        .collect()
    )
    wm = (max(r["us"] for r in rows) // 1000) * 1000 - DAY_US
    want: dict[tuple, list] = {}
    for r in rows:
        s0 = (r["us"] // DAY_US) * DAY_US
        cents = (
            None if r["value"] is None else _rnd_away(r["value"] * 100)
        )
        for s in (s0 - DAY_US, s0):
            if s + 2 * DAY_US <= wm:
                v = want.setdefault((s, r["event_type"]), [0, 0])
                v[0] += 1
                if cents is not None:
                    v[1] += cents
    got = {
        (r["win_start_us"], r["event_type"]): (r["n"], r["cents"])
        for r in qrel.Q["stream_window"](spark, SF).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}
