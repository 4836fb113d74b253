"""Invariant tests for the wave-21 faces (qadv.py + the recursive-CTE
graph face). Spark-vs-DuckDB value equality is the oracle gate's job
(tools/check_oracle.py); these pin the semantics the hash compare
can't articulate: skyline non-dominance, KS bounds and hand-computed
agreement, exact dyadic EWMA weights, cumulative-distinct
conservation, bitmap-vs-exact distinct equality, lateral top-k
cardinality, PMI arithmetic, hashing-trick conservation, and
recursive-CTE == unrolled-BFS equivalence.
"""

from __future__ import annotations

import datetime
import math

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qadv, qpipe
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"

_EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def test_pareto_front_is_exactly_the_nondominated_set(spark):
    got = {
        (r.p_partkey, r.p_size, r.price_cents)
        for r in qadv.Q["pareto_front"](spark, SF).collect()
    }
    pts = [
        (r.p_partkey, r.p_size, int(round(r.p_retailprice * 100)))
        for r in t(spark, SF, "part").collect()
    ]
    # brute-force strict-dominance oracle over the full catalog
    frontier = {
        (k, s, p)
        for (k, s, p) in pts
        if not any(
            s2 >= s and p2 <= p and (s2 > s or p2 < p)
            for (_, s2, p2) in pts
        )
    }
    assert got == frontier and got


def test_stat_ks_matches_hand_computed_ecdf_distance(spark):
    import hashlib

    rows = qadv.Q["stat_ks"](spark, SF).collect()
    assert rows
    by_type = {r.event_type: r for r in rows}
    ev = t(spark, SF, "events").collect()
    some_type = rows[0].event_type
    a, b = [], []
    for r in ev:
        if r.event_type != some_type or r.value is None:
            continue
        h = hashlib.md5(str(r.event_id).encode()).hexdigest()[0]
        (a if h < "8" else b).append(r.value)
    support = sorted(set(a) | set(b))
    d_num = max(
        abs(
            sum(1 for v in a if v <= x) * len(b)
            - sum(1 for v in b if v <= x) * len(a)
        )
        for x in support
    )
    r = by_type[some_type]
    assert (r.n_a, r.n_b, r.d_num) == (len(a), len(b), d_num)
    assert 0.0 <= r.ks_d <= 1.0
    assert r.ks_d == round(d_num / (len(a) * len(b)), 6)


def test_events_ewma_weights_are_exact_powers_of_two(spark, tmp_path):
    rows = [
        (1, datetime.datetime(2024, 1, 1, 12), 1, "click", 1.00, "{}"),
        (2, datetime.datetime(2024, 1, 2, 12), 1, "click", 2.00, "{}"),
        # a gap day, then a third observation
        (3, datetime.datetime(2024, 1, 4, 12), 1, "click", 4.00, "{}"),
    ]
    spark.createDataFrame(rows, _EVENTS_SCHEMA).write.parquet(
        f"{tmp_path}/events.parquet"
    )
    got = {
        r.day_num: r.ewma_w
        for r in qadv.Q["events_ewma"](spark, str(tmp_path)).collect()
    }
    # cents: 100, 200, 400 on day_nums 0, 1, 3; weight = 2^(13-lag)
    assert got[0] == 100 * 2**13
    assert got[1] == 200 * 2**13 + 100 * 2**12
    assert got[3] == 400 * 2**13 + 200 * 2**11 + 100 * 2**10


def test_win_distinct_count_terminal_value_is_exact_distinct(spark):
    got = qadv.Q["win_distinct_count"](spark, SF).toPandas()
    e = t(spark, SF, "events").filter(F.col("user_id").isNotNull())
    exact = {
        r.event_type: r.n
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for et, grp in got.groupby("event_type"):
        grp = grp.sort_values("day_num")
        # running sum is monotone, conserves arrivals, ends at the truth
        assert (grp["cum_users"].diff().dropna() >= 0).all()
        assert int(grp["n_new"].sum()) == exact[et]
        assert int(grp["cum_users"].iloc[-1]) == exact[et]


def test_agg_bitmap_distinct_equals_exact_count_distinct(spark):
    got = {
        r.event_type: r.n_users
        for r in qadv.Q["agg_bitmap_distinct"](spark, SF).collect()
    }
    e = t(spark, SF, "events").filter(F.col("user_id").isNotNull())
    exact = {
        r.event_type: r.n
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == exact and got


def test_join_lateral_is_the_window_top2(spark):
    from pyspark.sql import Window

    got = qadv.Q["join_lateral"](spark, SF)
    c = t(spark, SF, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, SF, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    twin = (
        o.join(c, o.o_custkey == c.c_custkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select(
            "c_custkey",
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100)
            .cast("long")
            .alias("price_cents"),
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, twin.collect())
    )
    per_cust = got.groupBy("c_custkey").count().agg(F.max("count")).first()[0]
    assert per_cust <= 2


def test_text_collocations_pmi_arithmetic(spark, tmp_path):
    # 'x y' always adjacent (4 times); filler tokens are all distinct
    docs = [
        (1, "x y a b", "en", "s", 7),
        (2, "x y c d", "en", "s", 7),
        (3, "x y e f", "en", "s", 7),
        (4, "x y g h", "en", "s", 7),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    got = qadv.Q["text_collocations"](spark, str(tmp_path)).collect()
    # only (x, y) reaches the count floor of 3
    assert [(r.w1, r.w2, r.c_xy) for r in got] == [("x", "y", 4)]
    # PMI = ln(c_xy * N / (cx * cy)) with N = 12 bigrams, cx = cy = 4
    expect = round(
        int(round(1e6 * math.log((4.0 * 12) / (4.0 * 4)))) / 1e6, 6
    )
    assert got[0].pmi == expect


def test_feat_hashing_conserves_tokens_and_bounds_buckets(spark):
    got = qadv.Q["feat_hashing"](spark, SF).toPandas()
    d = t(spark, SF, "documents").filter(F.col("doc_id") % 101 == 0)
    n_tokens = (
        d.select(F.explode(F.split("text", " ")).alias("tk"))
        .filter(F.col("tk") != "")
        .count()
    )
    assert int(got["n"].sum()) == n_tokens
    assert got["bucket"].between(0, 63).all()
    # the sample is non-trivial and features actually spread
    assert got["doc_id"].nunique() >= 2
    assert got["bucket"].nunique() >= 16


def test_recursive_cte_equals_unrolled_bfs(spark):
    rec = sorted(
        map(tuple, qpipe.Q["kg_reach_recursive"](spark, SF).collect())
    )
    unrolled = sorted(
        map(tuple, qpipe.Q["kg_shortest_path"](spark, SF).collect())
    )
    assert rec == unrolled and rec


def test_stat_mannwhitney_matches_hand_computed_ranksum(spark):
    import hashlib

    rows = qadv.Q["stat_mannwhitney"](spark, SF).collect()
    assert rows
    r = rows[0]
    ev = t(spark, SF, "events").collect()
    a, b = [], []
    for e in ev:
        if e.event_type != r.event_type or e.value is None:
            continue
        h = hashlib.md5(str(e.event_id).encode()).hexdigest()[0]
        (a if h < "8" else b).append(e.value)
    # tie-averaged rank sum of sample A over the pooled values
    pooled = sorted(a + b)
    first = {}
    for i, v in enumerate(pooled):
        first.setdefault(v, i)
    r2 = {v: 2 * first[v] + pooled.count(v) + 1 for v in set(pooled)}
    r2a = sum(r2[v] for v in a)
    u2 = r2a - 2 * len(a) * (len(a) + 1) // 2
    assert (r.n_a, r.n_b, r.u2) == (len(a), len(b), u2)
    # AUC identity and bounds
    assert 0.0 <= r.auc <= 1.0
    assert r.auc == round(u2 / (2.0 * len(a) * len(b)), 6)


def test_stat_benford_shares_and_constants(spark):
    got = qadv.Q["stat_benford"](spark, SF).toPandas()
    assert set(got["digit"]).issubset(set(range(1, 10)))
    assert abs(got["share"].sum() - 1.0) < 1e-5
    for _, row in got.iterrows():
        expect = round(
            int(round(1e6 * math.log10(1 + 1 / row["digit"]))) / 1e6, 6
        )
        assert row["benford_share"] == expect
    e = t(spark, SF, "events")
    n_pos = e.filter(F.col("value") > 0).count()
    assert int(got["n"].sum()) == n_pos


def test_text_bigram_lm_deterministic_transitions_score_zero(spark, tmp_path):
    # doc 0 (sampled: 0 % 101 == 0): every bigram has P(w2|w1) = 1
    docs = [
        (0, "a b c", "en", "s", 5),
        (101, "a b c", "en", "s", 5),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    got = qadv.Q["text_bigram_lm"](spark, str(tmp_path)).collect()
    assert {(r.doc_id, r.n_bigrams, r.ll_us, r.avg_ll) for r in got} == {
        (0, 2, 0, 0.0),
        (101, 2, 0, 0.0),
    }


def test_privacy_kanon_flags_exactly_the_small_classes(spark):
    got = qadv.Q["privacy_kanon"](spark, SF).toPandas()
    assert (got["at_risk"] == (got["n"] < 10)).all()
    n_docs = t(spark, SF, "documents").count()
    assert int(got["n"].sum()) == n_docs


def test_events_mad_known_median_and_outlier(spark, tmp_path):
    base = datetime.datetime(2024, 1, 1, 12)
    vals = [10.0, 10.0, 11.0, 12.0, 13.0, 1000.0]
    rows = [
        (i, base + datetime.timedelta(hours=i), 1, "click", v, "{}")
        for i, v in enumerate(vals)
    ]
    spark.createDataFrame(rows, _EVENTS_SCHEMA).write.parquet(
        f"{tmp_path}/events.parquet"
    )
    got = qadv.Q["events_mad"](spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    # type-7 median of the 6 values is 11.5; MAD = median(|v - 11.5|)
    devs = sorted(abs(v - 11.5) for v in vals)
    mad = (devs[2] + devs[3]) / 2
    assert r.med == 11.5 and r.mad == round(mad, 6)
    # only the fat-finger value exceeds 3 * MAD
    assert r.n_outliers == sum(
        1 for v in vals if round(abs(v - 11.5) / mad, 6) > 3.0
    ) == 1


def test_embed_dim_stats_matches_numpy_moments(spark):
    import numpy as np

    got = (
        qadv.Q["embed_dim_stats"](spark, SF)
        .toPandas()
        .set_index("dim_idx")
        .sort_index()
    )
    mat = np.array(
        [r.embedding for r in t(spark, SF, "embeddings").collect()],
        dtype=np.float64,
    )
    q = np.round(mat * 1e6)
    assert (got["n"] == mat.shape[0]).all()
    for j in (0, 7, 63):
        mean = q[:, j].sum() / len(q) / 1e6
        var = (q[:, j] ** 2).sum() / len(q) / 1e12 - mean * mean
        assert got.loc[j, "mean"] == round(mean, 6) + 0
        assert got.loc[j, "var"] == round(var, 6) + 0
        assert got.loc[j, "minv"] == round(mat[:, j].min(), 6) + 0
        assert got.loc[j, "maxv"] == round(mat[:, j].max(), 6) + 0


def test_embed_pca_top_is_a_rayleigh_improving_unit_direction(spark):
    import numpy as np

    got = (
        qadv.Q["embed_pca_top"](spark, SF)
        .toPandas()
        .set_index("dim_idx")
        .sort_index()
    )
    v = got["v"].to_numpy()
    # infinity-normalized with the convention sign: max |component| is
    # exactly +1.0 (lowest index on ties made positive)
    assert np.max(np.abs(v)) == 1.0
    assert v[int(np.argmax(np.abs(v)))] == 1.0
    mat = np.array(
        [r.embedding for r in t(spark, SF, "embeddings").collect()],
        dtype=np.float64,
    )
    q = np.round(mat * 1e6)
    cm = np.round(q.T @ q / len(q))
    ones = np.ones(cm.shape[0])

    def rayleigh(x):
        return (x @ cm @ x) / (x @ x)

    # exact replication of the quantized two-round algorithm: the
    # face is deterministic integer math end to end, so numpy can
    # reproduce it bit-for-bit
    y1 = cm @ ones
    v1 = np.round(1000.0 * y1 / np.max(np.abs(y1)))
    y2 = cm @ v1
    ma = np.max(np.abs(y2))
    sgn = 1.0 if y2[int(np.argmax(np.abs(y2)))] >= 0 else -1.0
    expect = np.round(sgn * y2 / ma, 6) + 0.0
    assert np.array_equal(v, expect)
    # each round improves the Rayleigh quotient toward the top
    # eigenvalue (monotone for a PSD second-moment matrix)
    assert rayleigh(v1) >= rayleigh(ones) - 1e-6
    assert rayleigh(v) >= rayleigh(v1) - 1e-6
    assert rayleigh(v) <= np.linalg.eigvalsh(cm)[-1] + 1e-6


def test_agg_incremental_merge_equals_full_recompute(spark):
    got = qadv.Q["agg_incremental"](spark, SF)
    e = t(spark, SF, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    full = e.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01")).cast("int").alias(
            "day_num"
        ),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("v_cents"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_text_zipf_fit_matches_hand_ols_and_is_decreasing(spark):
    r = qadv.Q["text_zipf_fit"](spark, SF).collect()[0]
    cnt = {}
    for row in t(spark, SF, "documents").collect():
        if row.text:
            for tk in row.text.split(" "):
                if tk:
                    cnt[tk] = cnt.get(tk, 0) + 1
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    pts = [
        (
            int(round(1000 * math.log(i + 1))),
            int(round(1000 * math.log(c))),
        )
        for i, (_, c) in enumerate(top)
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    # the sf0.001 fixture vocabulary is smaller than the top-100 cap
    assert r.n == n == min(100, len(cnt))
    assert r.slope == round(slope, 6) + 0
    assert r.slope < 0  # frequency falls with rank
    intercept = (sy - slope * sx) / n / 1000.0
    assert r.intercept == round(intercept, 6) + 0


def test_events_heatmap_epoch_dow_and_conservation(spark, tmp_path):
    rows = [
        # 2024-01-01 is a Monday -> dow 0; 2024-01-07 a Sunday -> dow 6
        (1, datetime.datetime(2024, 1, 1, 5), 1, "click", 1.0, "{}"),
        (2, datetime.datetime(2024, 1, 7, 23), 1, "click", 1.0, "{}"),
        (3, datetime.datetime(2023, 12, 31, 9), 1, "click", 1.0, "{}"),
    ]
    spark.createDataFrame(rows, _EVENTS_SCHEMA).write.parquet(
        f"{tmp_path}/events.parquet"
    )
    got = {
        (r.dow, r.hod): r.n
        for r in qadv.Q["events_heatmap"](spark, str(tmp_path)).collect()
    }
    # pre-epoch dates still land on the right weekday (Sunday = 6)
    assert got == {(0, 5): 1, (6, 23): 1, (6, 9): 1}
    full = qadv.Q["events_heatmap"](spark, SF).toPandas()
    n_ts = t(spark, SF, "events").filter(F.col("ts").isNotNull()).count()
    assert int(full["n"].sum()) == n_ts


def test_events_changepoint_finds_the_level_shift_boundary(spark, tmp_path):
    rows = []
    eid = 0
    for day in range(10):
        eid += 1
        rows.append(
            (
                eid,
                datetime.datetime(2024, 1, 1 + day, 12),
                1,
                "click",
                1.0 if day < 5 else 100.0,
                "{}",
            )
        )
    spark.createDataFrame(rows, _EVENTS_SCHEMA).write.parquet(
        f"{tmp_path}/events.parquet"
    )
    [r] = qadv.Q["events_changepoint"](spark, str(tmp_path)).collect()
    # low regime days 0-4 (100 cents), high 5-9 (10000): the CUSUM
    # |D*P_d - rnk*T| peaks on the LAST day of the old regime
    assert r.event_type == "click" and r.cp_day == 4
    total = 5 * 100 + 5 * 10000
    assert r.score == abs(10 * 500 - 5 * total)
    assert r.n_days == 10
    assert r.rel == round(r.score / 10 / total, 6)
    assert 0.0 <= r.rel <= 1.0


def test_stat_anova_matches_hand_computed_f(spark):
    got = qadv.Q["stat_anova"](spark, SF).collect()[0]
    groups = {}
    for row in t(spark, SF, "events").collect():
        if row.value is not None:
            groups.setdefault(row.event_type, []).append(
                int(round(row.value * 100))
            )
    k = len(groups)
    n = sum(len(v) for v in groups.values())
    s = sum(sum(v) for v in groups.values())
    ssb = sum(
        int(
            round(
                len(v) * (sum(v) / len(v) - s / n) * (sum(v) / len(v) - s / n)
            )
        )
        for v in groups.values()
    )
    ssw = sum(
        int(
            round(
                float(sum(x * x for x in v)) - float(sum(v)) * sum(v) / len(v)
            )
        )
        for v in groups.values()
    )
    assert (got.k, got.n, got.ssb, got.ssw) == (k, n, ssb, ssw)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert got.f_stat == round(f, 6) + 0
    assert got.f_stat >= 0


def test_stat_gini_equals_bruteforce_rank_sum(spark):
    got = qadv.Q["stat_gini"](spark, SF).collect()[0]
    cnt = {}
    for row in t(spark, SF, "documents").collect():
        if row.text:
            for tk in row.text.split(" "):
                if tk:
                    cnt[tk] = cnt.get(tk, 0) + 1
    cs = sorted(cnt.values())  # ascending; ties in any order
    n, s = len(cs), sum(cs)
    sic = sum((i + 1) * c for i, c in enumerate(cs))
    assert (got.n_vocab, got.total_tokens) == (n, s)
    assert got.gini == round((2 * sic - (n + 1) * s) / (n * s), 6) + 0
    assert 0.0 <= got.gini < 1.0


def test_events_autocorr_matches_exact_moment_pearson(spark):
    got = {
        r.lag: (r.n, r.r)
        for r in qadv.Q["events_autocorr"](spark, SF).collect()
    }
    daily = {}
    for row in t(spark, SF, "events").collect():
        if row.ts is not None and row.value is not None:
            d = (row.ts.date() - datetime.date(2024, 1, 1)).days
            daily[d] = daily.get(d, 0) + int(round(row.value * 100))
    # SQL div truncates toward zero
    dollars = {
        d: (v // 100 if v >= 0 else -((-v) // 100)) for d, v in daily.items()
    }
    assert set(got) == set(range(1, 8))
    for lag in (1, 7):
        pairs = [
            (dollars[d], dollars[d + lag])
            for d in dollars
            if d + lag in dollars
        ]
        n = len(pairs)
        sx = sum(x for x, _ in pairs)
        sy = sum(y for _, y in pairs)
        sxy = sum(x * y for x, y in pairs)
        sxx = sum(x * x for x, _ in pairs)
        syy = sum(y * y for _, y in pairs)
        r = (n * sxy - sx * sy) / math.sqrt(
            float((n * sxx - sx * sx)) * (n * syy - sy * sy)
        )
        assert got[lag] == (n, round(r, 6) + 0)


def test_text_readability_known_doc_and_null_guards(spark, tmp_path):
    docs = [
        (1, "Hello world. This is a test!", "en", "w", 28),
        (2, None, "en", "w", 0),
        (3, "no sentence enders here", "en", "w", 23),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    got = {
        r.doc_id: r
        for r in qadv.Q["text_readability"](spark, str(tmp_path)).collect()
    }
    r1 = got[1]
    assert (r1.words, r1.sentences, r1.syllables) == (6, 2, 7)
    assert r1.flesch == round(206.835 - 1.015 * (6 / 2) - 84.6 * (7 / 6), 6)
    # NULL text coalesces to '' -> zero counts -> NULL score (not -1/crash)
    assert (got[2].words, got[2].sentences, got[2].flesch) == (0, 0, None)
    # words but no sentence enders -> NULL score
    assert got[3].words == 4 and got[3].sentences == 0
    assert got[3].flesch is None


def test_stream_outer_join_equals_batch_left_join(spark):
    from dbpedia_spotlight_db_spark.queries import qrel

    got = sorted(
        map(tuple, qrel.Q["stream_outer_join"](spark, SF).collect())
    )
    ev = (
        t(spark, SF, "events")
        .filter(F.col("ts").isNotNull())
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("cts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("puser"),
        F.col("ts").alias("pts"),
    )
    batch = c.join(
        p,
        (F.col("puser") == F.col("user_id"))
        & (F.col("pts") >= F.col("cts"))
        & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 3 DAYS")),
        "leftOuter",
    ).select("click_id", "purchase_id", "user_id")
    want = sorted(map(tuple, batch.collect()))
    assert got == want
    # the outer rows are the point of the face — assert they exist
    assert any(r[1] is None for r in got)


def test_text_boilerplate_spans_are_real_and_top_ranked(spark):
    rows = qadv.Q["text_boilerplate"](spark, SF).collect()
    assert 0 < len(rows) <= 20
    docs = [
        (r.doc_id, (r.text or "").split())
        for r in t(spark, SF, "documents").collect()
    ]
    df_by_shingle = {}
    for doc_id, ts in docs:
        seen = set()
        for i in range(len(ts) - 7):
            seen.add(" ".join(ts[i : i + 8]))
        for s in seen:
            df_by_shingle[s] = df_by_shingle.get(s, 0) + 1
    for r in rows:
        assert len(r.shingle.split(" ")) == 8
        assert df_by_shingle[r.shingle] == r.df >= 2
        assert r.occurrences >= r.df
    # descending (df, occurrences) and the top df is the global max
    ranks = [(r.df, r.occurrences) for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    assert rows[0].df == max(df_by_shingle.values())


def test_feat_target_encode_loo_identity_and_singleton_null(
    spark, tmp_path
):
    got = {
        r.event_id: r
        for r in qadv.Q["feat_target_encode"](spark, SF).collect()
    }
    groups = {}
    for row in t(spark, SF, "events").collect():
        if row.value is not None:
            groups.setdefault(row.event_type, []).append(
                (row.event_id, int(round(row.value * 100)))
            )
    for et, rows in groups.items():
        s = sum(q for _, q in rows)
        n = len(rows)
        eid, q0 = rows[0]
        if n < 2:
            assert got[eid].loo_mean is None
        else:
            assert got[eid].loo_mean == round((s - q0) / (n - 1) / 100.0, 6) + 0
    # singleton category -> NULL, two-row category -> each other's value
    ev = [
        (1, datetime.datetime(2024, 1, 1), 1, "solo", 5.0, "{}"),
        (2, datetime.datetime(2024, 1, 2), 1, "pair", 2.0, "{}"),
        (3, datetime.datetime(2024, 1, 3), 1, "pair", 4.0, "{}"),
    ]
    spark.createDataFrame(ev, _EVENTS_SCHEMA).write.parquet(
        f"{tmp_path}/events.parquet"
    )
    g2 = {
        r.event_id: r.loo_mean
        for r in qadv.Q["feat_target_encode"](spark, str(tmp_path)).collect()
    }
    assert g2 == {1: None, 2: 4.0, 3: 2.0}


def test_hive_partition_prune_matches_direct_filter(spark):
    from dbpedia_spotlight_db_spark.queries import qio

    got = sorted(
        map(tuple, qio.Q["hive_partition_prune"](spark, SF).collect())
    )
    want = sorted(
        map(
            tuple,
            t(spark, SF, "documents")
            .filter(F.col("lang") == "en")
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("n_chars").cast("long").alias("sum_chars"),
            )
            .collect(),
        )
    )
    assert got == want and len(got) > 0


def test_parquet_merge_schema_null_fill_counts(spark):
    from dbpedia_spotlight_db_spark.queries import qio

    [r] = qio.Q["parquet_merge_schema"](spark, SF).collect()
    c = t(spark, SF, "documents").count()
    s = (
        t(spark, SF, "documents")
        .agg(F.sum("n_chars"))
        .collect()[0][0]
    )
    assert (
        r.n_rows,
        r.n_text,
        r.n_lang,
        r.n_source,
        r.n_nchars,
        r.sum_nchars,
    ) == (2 * c, c, c, c, c, s)


def test_events_forecast_zero_error_on_perfect_weekly_pattern(
    spark, tmp_path
):
    rows = []
    eid = 0
    # 4 identical weeks -> seasonal-naive is perfect; then day 28
    # breaks the pattern by +10.00
    for day in range(28):
        eid += 1
        rows.append(
            (
                eid,
                datetime.datetime(2024, 1, 1) + datetime.timedelta(days=day),
                1,
                "click",
                float(1 + day % 7),
                "{}",
            )
        )
    rows.append(
        (99, datetime.datetime(2024, 1, 29), 1, "click", 11.0, "{}")
    )
    spark.createDataFrame(rows, _EVENTS_SCHEMA).write.parquet(
        f"{tmp_path}/events.parquet"
    )
    from dbpedia_spotlight_db_spark.queries import qadv as _qadv

    [r] = _qadv.Q["events_forecast"](spark, str(tmp_path)).collect()
    # 22 scored days (days 7..28 present): 21 perfect + day 28 off by
    # 11.00 - 1.00 = 10.00
    assert r.n == 22
    assert r.abs_err_cents == 1000
    assert r.mae_dollars == round(1000 / 22 / 100.0, 6)
    total_abs = sum(100 * (1 + d % 7) for d in range(7, 28)) + 1100
    assert r.wape == round(1000 / total_abs, 6)


def test_text_novelty_first_occurrence_attribution(spark, tmp_path):
    rows = [
        (1, "a b c d", "en", "s", 7),   # shingles {a b c, b c d} both new
        (2, "a b c x", "en", "s", 7),   # {a b c} seen in doc 1, {b c x} new
        (3, "a b", "en", "s", 3),       # < 3 tokens -> absent
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    got = {
        r.doc_id: (r.n_shingles, r.n_novel, r.novelty)
        for r in qadv.Q["text_novelty"](spark, str(tmp_path)).collect()
    }
    assert got == {1: (2, 2, 1.0), 2: (2, 1, 0.5)}


def test_abc_classification_thresholds_and_prefix_sum(spark, tmp_path):
    # revenues 80 / 15 / 5 across 3 parts: cum shares 80% / 95% / 100%
    rows = [
        (1, 1, 1, 1, 1.0, 80.0, 0.0, 0.0, "N", "O",
         datetime.datetime(2024, 1, 1)),
        (2, 2, 1, 1, 1.0, 15.0, 0.0, 0.0, "N", "O",
         datetime.datetime(2024, 1, 1)),
        (3, 3, 1, 1, 1.0, 5.0, 0.0, 0.0, "N", "O",
         datetime.datetime(2024, 1, 1)),
    ]
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    ).write.parquet(f"{tmp_path}/lineitem.parquet")
    got = {
        r.cls: (r.n_parts, r.revenue_cents, r.share)
        for r in qadv.Q["abc_classification"](spark, str(tmp_path)).collect()
    }
    assert got == {
        "A": (1, 8000, 0.8),
        "B": (1, 1500, 0.15),
        "C": (1, 500, 0.05),
    }


def test_abc_classification_matches_single_window_oracle(spark):
    from pyspark.sql import Window
    from dbpedia_spotlight_db_spark.queries.common import cents

    got = {
        r.cls: (r.n_parts, r.revenue_cents)
        for r in qadv.Q["abc_classification"](spark, SF).collect()
    }
    rev = (
        t(spark, SF, "lineitem")
        .groupBy("l_partkey")
        .agg(F.sum(cents(F.col("l_extendedprice"))).alias("rev"))
    )
    tot = rev.agg(F.sum("rev")).collect()[0][0]
    w = Window.orderBy(F.desc("rev"), F.asc("l_partkey")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = rev.select("rev", F.sum("rev").over(w).alias("cum"))
    want = {
        r.cls: (r.n_parts, r.revenue_cents)
        for r in cum.select(
            "rev",
            F.when(F.col("cum") * 100 <= tot * 80, "A")
            .when(F.col("cum") * 100 <= tot * 95, "B")
            .otherwise("C")
            .alias("cls"),
        )
        .groupBy("cls")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("rev").cast("long").alias("revenue_cents"),
        )
        .collect()
    }
    assert got == want


def test_scan_row_index_contiguity_certificate(spark):
    from dbpedia_spotlight_db_spark.queries import qio

    [r] = qio.Q["scan_row_index"](spark, SF).collect()
    docs = t(spark, SF, "documents")
    assert r.n_files == 4
    assert r.contiguous == 1
    assert r.n_rows == docs.count()
    assert r.sum_chars == docs.agg(F.sum("n_chars")).collect()[0][0]
