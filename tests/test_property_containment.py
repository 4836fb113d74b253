"""Property test: ngram_containment_pairs agrees with a trivially
correct pure-Python shingle-set computation on random corpora —
including the df-cap semantics (hot shingles removed from the
universe on BOTH sides before any ratio).
"""

from __future__ import annotations

import collections

from hypothesis import HealthCheck, given, settings, strategies as st

from dbpedia_spotlight_db_spark.operators import dedup as dd

WORDS = ["aa", "bb", "cc", "dd", "ee"]

doc_strategy = st.lists(
    st.sampled_from(WORDS), min_size=3, max_size=12
).map(" ".join)


def reference_containment(texts, n=3, threshold=0.4, max_df=1000):
    sets = {}
    for i, txt in enumerate(texts):
        ws = txt.lower().split()
        sh = {" ".join(ws[j : j + n]) for j in range(len(ws) - n + 1)}
        if sh:
            sets[i] = sh
    df = collections.Counter(s for sh in sets.values() for s in sh)
    hot = {s for s, c in df.items() if c > max_df}
    sets = {i: sh - hot for i, sh in sets.items()}
    out = {}
    for a in sets:
        for b in sets:
            if a == b or not sets[a]:
                continue
            c = round(len(sets[a] & sets[b]) / len(sets[a]), 6)
            if c >= threshold:
                out[(a, b)] = c
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(doc_strategy, min_size=2, max_size=8),
    # small max_df values exercise the hot-shingle exclusion path
    st.sampled_from([1, 2, 3, 1000]),
)
def test_containment_matches_reference(spark, texts, max_df):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r.src_id, r.dst_id): r.containment
        for r in dd.ngram_containment_pairs(
            df, "doc_id", "text", shingle_n=3, threshold=0.4, max_df=max_df
        ).collect()
    }
    want = reference_containment(texts, 3, 0.4, max_df)
    # the operator skips docs whose CAPPED shingle set is empty (no
    # denominator); the reference does the same via `not sets[a]`
    assert got == want
