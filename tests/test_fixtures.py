"""Fixture generator invariants (FIXTURES.md)."""

from __future__ import annotations

from dbpedia_spotlight_db_spark import fixtures


def test_deterministic():
    a = fixtures.gen_pages(50)
    b = fixtures.gen_pages(50)
    assert a.equals(b)
    wa = fixtures.gen_wiki_corpus(50)
    wb = fixtures.gen_wiki_corpus(50)
    assert list(wa["text"]) == list(wb["text"])
    assert list(wa["links"].map(len)) == list(wb["links"].map(len))


def test_link_offsets_exact():
    w = fixtures.gen_wiki_corpus(100)
    for _, row in w.iterrows():
        for link in row["links"]:
            assert (
                row["text"][link["start"] : link["end"]] == link["surface_form"]
            )


def test_html_roundtrip_bytes():
    p = fixtures.gen_pages(50)
    for _, row in p.iterrows():
        html = row["html"]
        assert html.startswith(fixtures.HTML_PRE)
        assert html.endswith(fixtures.HTML_POST)


def test_zipf_skew_present():
    """Top surface form should be clearly dominant (skew driver)."""
    w = fixtures.gen_wiki_corpus(300)
    from collections import Counter

    c = Counter()
    for links in w["links"]:
        for l in links:
            c[l["surface_form"]] += 1
    top = c.most_common(2)
    assert top[0][1] > 3 * top[1][1] or top[0][1] > 50
