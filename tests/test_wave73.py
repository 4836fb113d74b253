"""Wave-73 invariants: Gumbel moments against a block-maxima replay
(return level must exceed the observed mean maximum), vocabulary
coverage against a sorted-frequency replay (monotone in k, ending at
1.0 when k exceeds the vocab), the limb-split digest against a
hashlib replay (and sensitivity: one cent flips it), and SHOW
PARTITIONS against the data inventory."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qcorpus, qlake, qml, qsql
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _rnd_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_gumbel_matches_block_maxima_replay(spark):
    rows = (
        t(spark, SF, "events")
        .filter("ts IS NOT NULL AND value IS NOT NULL")
        .select(
            F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("day"),
            "value",
        )
        .collect()
    )
    daily: dict[int, int] = {}
    for r in rows:
        daily[r["day"]] = daily.get(r["day"], 0) + _rnd_away(
            r["value"] * 100
        )
    blocks: dict[int, list] = {}
    for d, c in daily.items():
        blocks.setdefault(d // 7, []).append(c // 100)
    mx = [max(v) for v in blocks.values() if len(v) == 7]
    n = len(mx)
    s1, s2 = sum(mx), sum(x * x for x in mx)
    var = (n * s2 - s1 * 1.0 * s1) / (n * (n - 1.0))
    pi, gamma = 3.14159265358979312, 0.57721566490153287
    beta = math.sqrt(6.0 * var) / pi
    mu = s1 / n - gamma * beta
    lvl = mu - beta * math.log(-math.log(1.0 - 1.0 / 52.0))
    got = qml.Q["stat_gumbel"](spark, SF).collect()[0]
    assert got["n"] == n
    assert abs(got["beta"] - round(beta, 6)) < 1e-6
    assert abs(got["mu"] - round(mu, 6)) < 1e-6
    assert abs(got["level_52wk"] - round(lvl, 6)) < 1e-6
    # a once-a-year level must clear the typical weekly max
    assert got["level_52wk"] > s1 / n


def test_vocab_coverage_matches_sorted_replay(spark):
    tf: dict[str, int] = {}
    for r in (
        t(spark, SF, "documents")
        .filter("text IS NOT NULL")
        .select("text")
        .collect()
    ):
        for w in r["text"].split(" "):
            if w:
                tf[w] = tf.get(w, 0) + 1
    ordered = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))
    tot = sum(tf.values())
    got = {
        r["k"]: (r["n_types"], r["covered"], r["total_tokens"], r["coverage"])
        for r in qcorpus.Q["text_vocab_coverage"](spark, SF).collect()
    }
    assert set(got) == {10, 100, 1000, 10000}
    prev = 0.0
    for k in (10, 100, 1000, 10000):
        cum = sum(c for _, c in ordered[:k])
        g = got[k]
        assert g[0] == len(tf) and g[2] == tot
        # python slice caps at the vocab size, matching MAX(CASE)
        assert g[1] == cum
        assert abs(g[3] - round(cum * 1.0 / tot, 6)) < 1e-9
        assert g[3] >= prev  # monotone in k
        prev = g[3]
    if len(tf) < 10000:
        assert got[10000][3] == 1.0


def test_content_digest_matches_hashlib_and_is_sensitive(spark):
    hi = lo = 0
    xor = 0
    rows = (
        t(spark, SF, "orders")
        .select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
        )
        .collect()
    )
    for r in rows:
        cents = _rnd_away(r["o_totalprice"] * 100)
        s = (
            f"{r['o_orderkey']}|{r['o_custkey']}|"
            f"{r['o_orderstatus']}|{cents}"
        )
        rh = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
        hi += rh // 268435456
        lo += rh % 268435456
        xor ^= rh
    got = qlake.Q["lake_content_digest"](spark, SF).collect()[0]
    assert got["n_rows"] == len(rows)
    assert got["digest_hi"] == hi
    assert got["digest_lo"] == lo
    assert got["digest_xor"] == xor
    # sensitivity: one cent on one row changes the digest
    r0 = rows[0]
    s2 = (
        f"{r0['o_orderkey']}|{r0['o_custkey']}|"
        f"{r0['o_orderstatus']}|{_rnd_away(r0['o_totalprice'] * 100) + 1}"
    )
    rh_old = int(
        hashlib.md5(
            f"{r0['o_orderkey']}|{r0['o_custkey']}|"
            f"{r0['o_orderstatus']}|{_rnd_away(r0['o_totalprice'] * 100)}"
            .encode()
        ).hexdigest()[:15],
        16,
    )
    rh_new = int(hashlib.md5(s2.encode()).hexdigest()[:15], 16)
    assert (xor ^ rh_old ^ rh_new) != xor


def test_show_partitions_matches_inventory(spark):
    want: dict[str, int] = {}
    for r in t(spark, SF, "documents").select("lang").collect():
        want[f"lang={r['lang']}"] = want.get(f"lang={r['lang']}", 0) + 1
    got = {
        r["partition"]: r["n_docs"]
        for r in qsql.Q["sql_show_partitions"](spark, SF).collect()
    }
    assert got == want
