"""Property-based harness: run REAL faces against RANDOM synthetic
events tables (written as temp sf-dirs, exactly the layout
`t(spark, sf, "events")` reads) and check them against the
pure-Python replays — the fixture-independent correctness evidence
the single-corpus tests can't give. Ties are generated on purpose
(small value grids), group sizes are skewed, and the doubled-rank /
micros machinery must agree exactly on every draw.

Kept to a handful of drawn examples per face: each example is a
full Spark round trip; hypothesis explores the tie/skew space, not
the row count."""

from __future__ import annotations

import math
import os
from collections import Counter, defaultdict

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis unavailable", allow_module_level=True)

from dbpedia_spotlight_db_spark.queries import qstats

TYPES = ["click", "view", "purchase"]

# (event_type_index, value_cents) rows; tiny value grid forces ties
ROWS = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 12)),
    min_size=8,
    max_size=40,
)


def _write_events(spark, tmp_path, rows, tag):
    import datetime

    d = os.path.join(str(tmp_path), f"sf_{tag}")
    os.makedirs(d, exist_ok=True)
    data = [
        (
            i + 1,
            datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=i),
            (i % 7) + 1,
            TYPES[ti],
            cents / 100.0,
            "{}",
        )
        for i, (ti, cents) in enumerate(rows)
    ]
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "events.parquet")
    )
    return d


def _doubled_ranks(vals):
    cnt = Counter(vals)
    start, first = {}, 1
    for u in sorted(cnt):
        start[u] = first
        first += cnt[u]
    return {u: 2 * start[u] + cnt[u] - 1 for u in cnt}


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(rows=ROWS)
def test_brunner_munzel_on_random_tables(spark, tmp_path, rows):
    sf = _write_events(spark, tmp_path, rows, "bm")
    groups = defaultdict(list)
    allv = []
    for ti, cents in rows:
        g = 1 if TYPES[ti] == "purchase" else 0
        groups[g].append(cents)
        allv.append(cents)
    drc = _doubled_ranks(allv)
    got = qstats.Q["stat_brunner_munzel"](spark, sf).collect()[0]
    for g in (0, 1):
        vs = groups.get(g, [])
        dri = _doubled_ranks(vs)
        n = len(vs)
        sdr = sum(drc[v] for v in vs)
        sq = sum((drc[v] - dri[v]) ** 2 for v in vs)
        assert got[f"n{g}"] == n
        assert got[f"sdr{g}"] == sdr
        assert got[f"sq{g}"] == sq
    n0, n1 = got["n0"], got["n1"]
    if n0 >= 2 and n1 >= 2 and got["w"] is not None:
        c0 = got["sdr0"] - n0 * (n0 + 1)
        c1 = got["sdr1"] - n1 * (n1 + 1)
        ds0 = (got["sq0"] * n0 - c0 * c0) / (n0 * (n0 - 1))
        ds1 = (got["sq1"] * n1 - c1 * c1) / (n1 * (n1 - 1))
        w = (
            n0 * n1 * (got["sdr1"] / n1 - got["sdr0"] / n0)
            / ((n0 + n1) * math.sqrt(n0 * ds0 + n1 * ds1))
        )
        assert abs(got["w"] - round(w, 6)) <= 1e-9


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(rows=ROWS)
def test_winsorized_mean_on_random_tables(spark, tmp_path, rows):
    sf = _write_events(spark, tmp_path, rows, "wm")
    vals = defaultdict(list)
    for ti, cents in rows:
        vals[TYPES[ti]].append(cents)
    got = {
        r["event_type"]: r
        for r in qstats.Q["agg_winsorized_mean"](spark, sf).collect()
    }
    assert set(got) == {et for et in vals}
    for et, cs in vals.items():
        cs.sort()
        n = len(cs)
        lo = next(c for i, c in enumerate(cs, 1) if 10 * i >= n)
        hi = next(c for i, c in enumerate(cs, 1) if 10 * i >= 9 * n)
        wsum = sum(min(max(c, lo), hi) for c in cs)
        g = got[et]
        assert (g["n"], g["lo_cents"], g["hi_cents"], g["win_sum_cents"]) \
            == (n, lo, hi, wsum)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(rows=ROWS)
def test_dunn_on_random_tables(spark, tmp_path, rows):
    sf = _write_events(spark, tmp_path, rows, "dunn")
    vals = defaultdict(list)
    allv = []
    for ti, cents in rows:
        vals[TYPES[ti]].append(cents)
        allv.append(cents)
    n = len(allv)
    dr = _doubled_ranks(allv)
    tsum = sum(tc**3 - tc for tc in Counter(allv).values())
    got = {
        (r["type_a"], r["type_b"]): r
        for r in qstats.Q["stat_dunn"](spark, sf).collect()
    }
    types = sorted(vals)
    pairs = [
        (a, b)
        for i, a in enumerate(types)
        for b in types[i + 1 :]
    ]
    assert set(got) == set(pairs)
    for ta, tb in pairs:
        na, nb = len(vals[ta]), len(vals[tb])
        var = (n * (n + 1) / 12.0 - tsum / (12.0 * (n - 1))) * (
            1.0 / na + 1.0 / nb
        )
        g = got[(ta, tb)]
        assert (g["na"], g["nb"]) == (na, nb)
        if var > 0 and g["z"] is not None:
            ma = sum(dr[c] for c in vals[ta]) / na / 2.0
            mb = sum(dr[c] for c in vals[tb]) / nb / 2.0
            assert abs(
                g["z"] - round((ma - mb) / math.sqrt(var), 6)
            ) <= 1e-9


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(rows=ROWS)
def test_mann_kendall_on_random_tables(spark, tmp_path, rows):
    import datetime

    # spread rows over distinct days so the daily series is nontrivial
    sf = _write_events(spark, tmp_path, rows, "mk")
    # rewrite with 6-hourly spacing (multiple days)
    data = [
        (
            i + 1,
            datetime.datetime(2024, 1, 1)
            + datetime.timedelta(hours=6 * i),
            (i % 7) + 1,
            TYPES[ti],
            cents / 100.0,
            "{}",
        )
        for i, (ti, cents) in enumerate(rows)
    ]
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf, "events.parquet")
    )
    daily = defaultdict(int)
    base = datetime.datetime(2024, 1, 1)
    for i, (_, cents) in enumerate(rows):
        ts = base + datetime.timedelta(hours=6 * i)
        day = int(ts.timestamp() * 1_000_000) // 86_400_000_000
        daily[day] += cents
    days = sorted(daily)
    n = len(days)
    s = sum(
        (daily[dj] > daily[di]) - (daily[dj] < daily[di])
        for i, di in enumerate(days)
        for dj in days[i + 1 :]
    )
    tcor = sum(
        tc * (tc - 1) * (2 * tc + 5)
        for tc in Counter(daily.values()).values()
    )
    var18 = n * (n - 1) * (2 * n + 5) - tcor
    got = qstats.Q["stat_mann_kendall"](spark, sf).collect()[0]
    assert (got["n"], got["s"], got["var18"]) == (n, s, var18)
    if n >= 2 and var18 > 0:
        z = (s - (s > 0) + (s < 0)) / math.sqrt(var18 / 18.0)
        assert abs(got["z"] - round(z, 6)) <= 1e-9
    else:
        assert got["z"] is None


ORDER_ROWS = st.lists(
    # (key, status_is_F, price_cents in a small tie-heavy grid)
    st.tuples(st.booleans(), st.integers(0, 15)),
    min_size=10,
    max_size=40,
)


def _write_orders(spark, tmp_path, rows, tag):
    import datetime

    d = os.path.join(str(tmp_path), f"sfo_{tag}")
    os.makedirs(d, exist_ok=True)
    data = [
        (
            i + 1,
            (i % 5) + 1,
            "F" if is_f else "O",
            cents / 100.0,
            datetime.date(1995, 1, 1) + datetime.timedelta(days=i),
            f"{(i % 5) + 1}-X",
        )
        for i, (is_f, cents) in enumerate(rows)
    ]
    spark.createDataFrame(
        data,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate date, "
        "o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "orders.parquet")
    )
    return d


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(rows=ORDER_ROWS)
def test_lepage_on_random_tables(spark, tmp_path, rows):
    sf = _write_orders(spark, tmp_path, rows, "lp")
    groups = defaultdict(list)
    allv = []
    for i, (_, cents) in enumerate(rows):
        groups[(i + 1) % 2].append(cents)
        allv.append(cents)
    drc = _doubled_ranks(allv)
    N = len(allv)
    da = lambda v: min(drc[v], 2 * (N + 1) - drc[v])
    got = qstats.Q["stat_lepage"](spark, sf).collect()[0]
    assert got["n1"] == len(groups[1])
    assert got["n0"] == len(groups[0])
    assert got["w_d"] == sum(drc[v] for v in groups[1])
    assert got["ab_d"] == sum(da(v) for v in groups[1])


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(rows=ORDER_ROWS)
def test_cmh_on_random_tables(spark, tmp_path, rows):
    sf = _write_orders(spark, tmp_path, rows, "cmh")
    cells = defaultdict(lambda: [0, 0, 0, 0])
    for i, (is_f, _) in enumerate(rows):
        stratum = str((i % 5) + 1)
        e = ((i % 5) + 1) % 2  # o_custkey % 2
        y = 1 if is_f else 0
        cells[stratum][(1 - e) * 2 + (1 - y)] += 1
    o = e_mic = v_mic = 0
    for a, b, c, d in cells.values():
        T = a + b + c + d
        if T == 0:
            continue
        o += a

        def _r(x):
            return math.floor(x + 0.5)

        e_mic += _r(1e6 * (a + b) * (a + c) / T)
        if T > 1:
            v_mic += _r(
                1e6 * (a + b) * (c + d) * (a + c) * (b + d)
                / (T * T * (T - 1))
            )
    got = qstats.Q["stat_cmh"](spark, sf).collect()[0]
    assert (got["k"], got["o_sum"], got["e_mic"], got["v_mic"]) == (
        len(cells), o, e_mic, v_mic,
    )
