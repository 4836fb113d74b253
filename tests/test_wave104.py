"""Wave-104 invariants: the PQ code table is a total single-valued
assignment (marginals = per-half Lloyd assignments, totals conserve
the corpus) and deterministic across runs; Mood's median test equals
an exact Python replay including the integer lower-median split."""

from __future__ import annotations

from collections import Counter, defaultdict

from dbpedia_spotlight_db_spark.queries import qadv, qembed
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_pq_codebook_total_and_deterministic(spark):
    rows = qembed.Q["embed_pq_codebook"](spark, SF).collect()
    n_vec = t(spark, SF, "embeddings").count()
    id_sum = sum(
        r["vec_id"] for r in t(spark, SF, "embeddings").collect()
    )
    assert sum(r["n_vectors"] for r in rows) == n_vec
    assert sum(r["id_sum"] for r in rows) == id_sum
    assert len({(r["c0"], r["c1"]) for r in rows}) == len(rows)
    assert len(rows) > 1  # the codebook actually separates vectors
    again = {
        (r["c0"], r["c1"]): (r["n_vectors"], r["id_sum"])
        for r in qembed.Q["embed_pq_codebook"](spark, SF).collect()
    }
    assert again == {
        (r["c0"], r["c1"]): (r["n_vectors"], r["id_sum"]) for r in rows
    }


def test_mood_median_matches_replay(spark):
    vals = [
        (r["event_type"], round(r["value"] * 100))
        for r in t(spark, SF, "events").collect()
        if r["value"] is not None
    ]
    allc = sorted(c for _, c in vals)
    n = len(allc)
    # exact lower median: smallest c with 2*cum >= n
    cum = 0
    med = 0
    seen = Counter(allc)
    for c in sorted(seen):
        cum += seen[c]
        if 2 * cum >= n:
            med = c
            break
    above = defaultdict(int)
    below = defaultdict(int)
    for et, c in vals:
        (above if c > med else below)[et] += 1
    types = sorted(set(above) | set(below))
    ta = sum(above.values())
    tb = sum(below.values())
    rows = {
        r["event_type"]: (r["above"], r["below"], r["chi2_mic"])
        for r in qadv.Q["stat_mood_median"](spark, SF).collect()
    }
    assert set(rows) == set(types)
    for et in types:
        a, b = above[et], below[et]
        rr = a + b
        ea = rr * ta / n
        eb = rr * tb / n
        chi = round(1000000.0 * ((a - ea) ** 2 / ea)) + round(
            1000000.0 * ((b - eb) ** 2 / eb)
        )
        assert rows[et] == (a, b, chi)
