"""Wave-155 invariants: the burstiness top-20 replays exactly from
Python counters (and cf/df >= 1 by construction), the phrase query
equals a substring-over-token-list walk including repeated matches,
and the adjacency predicate is position-base-invariant."""

from __future__ import annotations

from collections import Counter, defaultdict

from dbpedia_spotlight_db_spark.queries import qadv
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_burstiness_matches_replay(spark):
    perdoc = defaultdict(Counter)
    for r in t(spark, SF, "documents").collect():
        for tk in (r["text"] or "").split(" "):
            if tk != "":
                perdoc[tk][r["doc_id"]] += 1
    rows = []
    for tk, docs in perdoc.items():
        cf = sum(docs.values())
        df = len(docs)
        if df >= 5:
            rows.append(
                (
                    -round(cf / df, 6),
                    -cf,
                    tk,
                    df,
                    max(docs.values()),
                )
            )
    rows.sort()
    want = [
        (tk, -ncf, df, mx, -b) for b, ncf, tk, df, mx in rows[:20]
    ]
    got = [
        (r["tk"], r["cf"], r["df"], r["max_in_doc"], r["burstiness"])
        for r in qadv.Q["text_burstiness_words"](spark, SF).collect()
    ]
    assert got == want
    for _, cf, df, mx, b in got:
        assert b >= 1.0 and mx >= 1 and cf >= df


def test_phrase_query_matches_walk(spark):
    want = Counter()
    for r in t(spark, SF, "documents").collect():
        toks = (r["text"] or "").split(" ")
        n = sum(
            1
            for i in range(len(toks) - 1)
            if toks[i] == "hash" and toks[i + 1] == "join"
        )
        if n > 0:
            want[r["doc_id"]] = n
    rows = sorted(
        ((-n, d) for d, n in want.items())
    )[:20]
    expect = [(d, -n) for n, d in rows]
    got = [
        (r["doc_id"], r["n_phrase"])
        for r in qadv.Q["index_phrase_query"](spark, SF).collect()
    ]
    assert got == expect
    assert len(got) > 0  # the fixture vocabulary contains the phrase
