"""Wave-174 invariants: the byte-shingle phash recovers every exact
CAS duplicate at hamming 0, the banded join's pigeonhole recall is
exact vs a brute-force fingerprint comparison, and the IGNORE NULLS
lag replays with the skip semantics (including the cross-engine
syntax-position quirk)."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from dbpedia_spotlight_db_spark.queries import qdata, qrel
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _phash(text: str) -> str:
    hx = text.encode("utf-8").hex()
    votes = [0] * 16
    for g in range(len(hx) // 8):
        tok = hx[g * 8 : g * 8 + 8]
        h = hashlib.md5(tok.encode()).hexdigest()
        for j in range(16):
            votes[j] += 1 if h[j] in "13579bdf" else -1
    return "".join("1" if v > 0 else "0" for v in votes)


def test_phash_recovers_cas_dups_and_exact_recall(spark):
    docs = {
        r["doc_id"]: r["text"]
        for r in t(spark, SF, "documents").collect()
    }
    fp = {d: _phash(tx) for d, tx in docs.items()}
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in qdata.Q["multimodal_phash"](spark, SF).collect()
    }
    # brute force: banding at 4 bands over 16 bits is pigeonhole-
    # exact for hamming <= 3, so got must equal ALL close pairs
    ids = sorted(fp)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = sum(x != y for x, y in zip(fp[a], fp[b]))
            if h <= 3:
                want[(a, b)] = h
    assert got == want
    # every byte-identical pair appears at hamming 0
    by_text = defaultdict(list)
    for d, tx in docs.items():
        by_text[tx].append(d)
    for ds in by_text.values():
        ds.sort()
        for i, a in enumerate(ds):
            for b in ds[i + 1 :]:
                assert got.get((a, b)) == 0


def test_lag_ignore_nulls_matches_walk(spark):
    per = defaultdict(list)
    for r in t(spark, SF, "events").collect():
        if r["user_id"] is None:
            continue
        us = int(r["ts"].timestamp() * 1_000_000)
        v = r["value"]
        big = (
            None
            if v is None or v < 50.0
            else round(v * 100)
        )
        per[r["user_id"]].append((us, r["event_id"], big))
    want = {}
    for u, rows in per.items():
        rows.sort()
        last = None
        n_prev = 0
        s = 0
        for _, _, big in rows:
            if last is not None:
                n_prev += 1
            if big is not None:
                s += last or 0
                last = big
        want[u] = (len(rows), n_prev, s)
    got = {
        r["user_id"]: (
            r["n_events"], r["n_with_prev"], r["sum_prev_at_big"],
        )
        for r in qrel.Q["win_lag_ignore_nulls"](spark, SF).collect()
    }
    assert got == want
    # the skip semantics did something: some user has nulls between
    # big values yet n_with_prev > 0
    assert any(n_prev > 0 for _, n_prev, _ in got.values())
