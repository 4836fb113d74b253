"""Wave-125 invariants: every emitted week start is a Monday and the
rollup matches the replay; the frontier head interleaves — the first
|sources| positions contain every source exactly once — and matches
the two-window replay."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from dbpedia_spotlight_db_spark.queries import qcorpus, qrel
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_iso_week_mondays_and_replay(spark):
    weekly = defaultdict(lambda: [0, 0])
    for r in t(spark, SF, "events").collect():
        if r["ts"] is None or r["value"] is None:
            continue
        day = int(r["ts"].timestamp() * 1_000_000) // 86_400_000_000
        ws = day - ((day + 3) % 7)
        weekly[ws][0] += 1
        weekly[ws][1] += round(r["value"] * 100)
    got = {
        r["week_start_day"]: [r["n"], r["cents"]]
        for r in qrel.Q["date_iso_week"](spark, SF).collect()
    }
    assert got == dict(weekly) and len(got) >= 4
    # epoch day 0 = Thursday, so Monday satisfies (day + 3) % 7 == 0
    assert all((ws + 3) % 7 == 0 for ws in got)


def test_frontier_interleaves_sources(spark):
    docs = [
        (r["doc_id"], r["source"])
        for r in t(spark, SF, "documents").collect()
    ]
    key = lambda d: (hashlib.md5(f"fr:{d}".encode()).hexdigest(), d)
    by_src = defaultdict(list)
    for did, src in docs:
        by_src[src].append(did)
    ranked = []
    for src, ids in by_src.items():
        for i, did in enumerate(sorted(ids, key=key), 1):
            ranked.append((i, key(did)[0], did, src))
    ranked.sort()
    expect = [
        (i + 1, did, src, hr)
        for i, (hr, _, did, src) in enumerate(ranked[:40])
    ]
    got = sorted(
        (r["fetch_order"], r["doc_id"], r["source"], r["host_rank"])
        for r in qcorpus.Q["crawl_frontier"](spark, SF).collect()
    )
    assert got == expect
    n_src = len(by_src)
    assert n_src >= 3
    head_sources = [src for _, _, src, _ in got[:n_src]]
    assert sorted(head_sources) == sorted(by_src), (
        "head must cycle through every source once"
    )
