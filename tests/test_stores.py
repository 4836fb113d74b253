"""P0 store builder invariants (SURVEY.md §1.3)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F


def test_uri_counts_match_python(wiki_pdf, stores):
    expect = Counter()
    for links in wiki_pdf["links"]:
        for l in links:
            expect[l["uri"]] += 1
    got = {r.uri: r.support for r in stores["entities"].collect()}
    assert got == dict(expect)


def test_pair_counts_and_p_e_given_s(wiki_pdf, stores):
    pair = Counter()
    for links in wiki_pdf["links"]:
        for l in links:
            pair[(l["surface_form"], l["uri"])] += 1
    sf_tot = Counter()
    for (sf, _), n in pair.items():
        sf_tot[sf] += n
    sf_names = {
        r.sf_id: r.surface_form for r in stores["surface_forms"].collect()
    }
    uri_names = {r.entity_id: r.uri for r in stores["entities"].collect()}
    for r in stores["candidate_map"].collect():
        key = (sf_names[r.sf_id], uri_names[r.entity_id])
        assert pair[key] == r.pair_count
        assert abs(r.p_e_given_s - pair[key] / sf_tot[key[0]]) < 1e-12


def test_annotation_prob_bounds(stores):
    bad = stores["surface_forms"].filter(
        (F.col("annotation_prob") <= 0) | (F.col("annotation_prob") > 1.0)
    )
    assert bad.count() == 0
    # total >= annotated always (spotting finds at least the linked occs)
    assert (
        stores["surface_forms"]
        .filter(F.col("total_count") < F.col("annotated_count"))
        .count()
        == 0
    )


def test_entity_vectors_sorted_and_normed(stores):
    rows = stores["entity_vectors"].limit(50).collect()
    assert rows
    import math

    for r in rows:
        assert list(r.token_ids) == sorted(r.token_ids)
        n = math.sqrt(sum(w * w for w in r.weights))
        assert abs(n - r.norm) < 1e-3 * max(n, 1.0)
