"""Wave-156 invariants: the CDC census replays from a pure-Python
chunker, boundaries are content-attached (insertion shifts positions
but not other chunks), and the distribution-window rollup replays
including ntile's ceil/floor bucket sizing."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

from dbpedia_spotlight_db_spark.queries import qdata, qrel
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _chunks(text: str) -> list[str]:
    words = [w for w in text.split(" ") if w != ""]
    out = []
    cur = []
    for w in words:
        bnd = (
            int(hashlib.md5(w.encode()).hexdigest()[:4], 16) % 8 == 0
        )
        if bnd and cur:
            out.append(" ".join(cur))
            cur = []
        cur.append(w)
    if cur:
        out.append(" ".join(cur))
    return out


def test_cdc_census_matches_replay(spark):
    census = Counter()
    for r in t(spark, SF, "documents").collect():
        for ch in _chunks(r["text"] or ""):
            census[ch] += 1
    n_chunks = sum(census.values())
    n_distinct = len(census)
    dup = n_chunks - n_distinct
    chars_total = sum(c * len(ch) for ch, c in census.items())
    chars_dedup = sum((c - 1) * len(ch) for ch, c in census.items())
    got = qdata.Q["dedup_cdc"](spark, SF).collect()[0]
    assert (
        got["n_chunks"],
        got["n_distinct"],
        got["dup_chunks"],
        got["chars_total"],
        got["chars_dedupable"],
    ) == (n_chunks, n_distinct, dup, chars_total, chars_dedup)
    assert n_chunks > n_distinct  # shared chunks exist in the fixture


def test_cdc_boundaries_survive_insertion():
    base = "alpha beta gamma delta epsilon zeta eta theta"
    ins = "alpha beta NEWWORD gamma delta epsilon zeta eta theta"
    cb, ci = _chunks(base), _chunks(ins)
    # every base chunk not containing the insertion point's chunk
    # reappears identically in the edited doc (content-defined)
    shared = set(cb) & set(ci)
    assert len(shared) >= len(cb) - 2


def test_win_dist_fns_matches_replay(spark):
    groups = defaultdict(list)
    for r in t(spark, SF, "events").collect():
        if r["value"] is None:
            continue
        groups[r["event_type"]].append(
            (round(r["value"] * 100), r["event_id"])
        )
    want = {}
    for typ, rows in groups.items():
        rows.sort()
        n = len(rows)
        # ntile: first (n % 4) buckets get ceil(n/4)
        big = n % 4
        size_big, size_small = -(-n // 4), n // 4
        idx = 0
        for q in range(1, 5):
            size = size_big if q <= big else size_small
            if size == 0:
                continue
            bucket = rows[idx : idx + size]
            prs = [
                (i) / (n - 1) if n > 1 else 0.0
                for i in range(idx, idx + size)
            ]
            cds = [(i + 1) / n for i in range(idx, idx + size)]
            want[(typ, q)] = (
                size,
                sum(c for c, _ in bucket),
                round(min(prs), 6),
                round(max(prs), 6),
                round(max(cds), 6),
            )
            idx += size
    got = {
        (r["event_type"], r["quartile"]): (
            r["n"],
            r["sum_cents"],
            r["min_pr"],
            r["max_pr"],
            r["max_cd"],
        )
        for r in qrel.Q["win_dist_fns"](spark, SF).collect()
    }
    assert set(got) == set(want)
    for k in want:
        gn, gs, gpmin, gpmax, gcd = got[k]
        wn, ws, wpmin, wpmax, wcd = want[k]
        assert (gn, gs) == (wn, ws), k
        assert abs(gpmin - wpmin) <= 1e-9 and abs(gpmax - wpmax) <= 1e-9
        assert abs(gcd - wcd) <= 1e-9
    # the last quartile closes at cume_dist == 1
    for (typ, q), (_, _, _, _, cd) in got.items():
        if q == 4:
            assert cd == 1.0
