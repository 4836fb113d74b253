"""Property-based tests (hypothesis): the distributed operators agree
with trivially-correct pure-Python references on random inputs.

- redirect_closure == visited-set chain resolution (cycles -> self)
- Aho-Corasick spotting == brute-force n-gram dictionary matching
- extract_text(html-wrap(text)) == text byte-identically, incl. unicode
"""

from __future__ import annotations

from hypothesis import HealthCheck, example, given, settings, strategies as st

from dbpedia_spotlight_db_spark.functions.text import _extract_one
from dbpedia_spotlight_db_spark.operators.spotting import TokenAhoCorasick

# ---------------------------------------------------------------------------
# closure vs visited-set reference (pure-Python model, Spark checked on
# a sampled subset in test_closure.py — here the MODEL itself is fuzzed
# against the distributed implementation once per session below)
# ---------------------------------------------------------------------------

NODES = ["a", "b", "c", "d", "e", "f", "g", "h"]


def resolve_reference(edges: dict[str, str]) -> dict[str, str]:
    """Visited-set chain following; any loop -> no redirect."""
    out = {}
    for src in edges:
        seen = {src}
        cur = src
        while cur in edges:
            cur = edges[cur]
            if cur in seen:
                cur = src  # cycle -> stays itself
                break
            seen.add(cur)
        if cur != src:
            out[src] = cur
    return out


@st.composite
def edge_maps(draw):
    srcs = draw(
        st.lists(st.sampled_from(NODES), unique=True, min_size=1, max_size=8)
    )
    return {s: draw(st.sampled_from(NODES)) for s in srcs if True}


@given(edge_maps())
@settings(max_examples=200, deadline=None)
def test_reference_resolver_sane(edges):
    """The reference resolver terminates and never maps to a redirect
    source that itself resolves elsewhere (canonical targets only)."""
    res = resolve_reference({s: d for s, d in edges.items() if s != d})
    for src, dst in res.items():
        assert src != dst
        # target must not resolve further
        assert dst not in res


def test_closure_matches_reference_fuzz(spark):
    """Distributed closure == visited-set reference on 25 random
    graphs (one Spark job per graph keeps runtime sane)."""
    import random

    rng = random.Random(42)
    for trial in range(25):
        n_edges = rng.randint(1, 8)
        srcs = rng.sample(NODES, n_edges)
        edges = {s: rng.choice(NODES) for s in srcs}
        edges = {s: d for s, d in edges.items() if s != d}
        if not edges:
            continue
        from dbpedia_spotlight_db_spark.operators.closure import redirect_closure

        df = spark.createDataFrame(
            list(edges.items()), ["src_uri", "dst_uri"]
        )
        got = {(r.src_uri, r.dst_uri) for r in redirect_closure(df).collect()}
        want = set(resolve_reference(edges).items())
        assert got == want, (trial, edges, got, want)


@given(edge_maps())
@example({"a": "b", "b": "c", "c": "d", "d": "c"})  # chain feeds even cycle
@example({"a": "b", "b": "c", "c": "a", "x": "a"})  # chain feeds odd cycle
@example({"a": "b", "b": "a", "x": "a", "y": "x"})  # 2-chain into 2-cycle
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_closure_matches_reference_hypothesis(spark, edges):
    """Hypothesis-driven closure fuzz (shrinking + directed @example
    seeds for the chain-into-cycle class the fixed-seed fuzz missed):
    distributed closure == visited-set reference on arbitrary
    functional graphs over 8 nodes."""
    from dbpedia_spotlight_db_spark.operators.closure import redirect_closure

    edges = {s: d for s, d in edges.items() if s != d}
    if not edges:
        return
    df = spark.createDataFrame(list(edges.items()), ["src_uri", "dst_uri"])
    got = {(r.src_uri, r.dst_uri) for r in redirect_closure(df).collect()}
    want = set(resolve_reference(edges).items())
    assert got == want, (edges, got, want)


@given(edge_maps())
@example({"a": "b", "b": "c", "c": "d", "d": "c"})
@example({"a": "b", "b": "c", "c": "a", "x": "a"})
@example({"a": "a", "b": "a"})  # self-loop + edge into it
@settings(max_examples=200, deadline=None)
def test_closure_dict_matches_reference(edges):
    """closure_dict (the driver-side literal-world twin used by
    world_model_bc) == the visited-set reference on arbitrary
    functional graphs — so swapping the flagship's 3-row Spark
    closure for the dict build cannot change semantics."""
    from dbpedia_spotlight_db_spark.operators.closure import closure_dict

    got = closure_dict(list(edges.items()))
    assert got == resolve_reference(edges), edges


# ---------------------------------------------------------------------------
# AC spotting vs brute-force n-gram matching (pure Python, no Spark)
# ---------------------------------------------------------------------------

TOKS = ["aa", "bb", "cc", "dd"]


@given(
    st.lists(
        st.lists(st.sampled_from(TOKS), min_size=1, max_size=3),
        min_size=1,
        max_size=6,
    ),
    st.lists(st.sampled_from(TOKS), min_size=0, max_size=20),
)
@settings(max_examples=300, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_ac_equals_bruteforce(patterns, doc):
    pats = {tuple(p) for p in patterns}
    ac = TokenAhoCorasick(sorted(pats))
    got = {(i, ln) for i, ln in ac.scan(doc)}
    want = {
        (i, ln)
        for ln in range(1, 4)
        for i in range(len(doc) - ln + 1)
        if tuple(doc[i : i + ln]) in pats
    }
    assert got == want


# ---------------------------------------------------------------------------
# extract byte-identity round trip incl. unicode / entity-looking text
# ---------------------------------------------------------------------------


def wrap(text: str) -> bytes:
    esc = text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    return f"<html><head><title>t</title></head><body>{esc}</body></html>".encode()


@given(
    st.text(
        alphabet=st.characters(
            blacklist_categories=("Cs",),  # no lone surrogates
        ),
        max_size=300,
    )
)
@settings(max_examples=300, deadline=None)
def test_extract_byte_identity(text):
    assert _extract_one(wrap(text)) == text


@given(st.text(min_size=0, max_size=24))
@settings(max_examples=300, deadline=None)
def test_porter_stemmer_total_and_deterministic(word):
    """The stemmer is a total, deterministic function on arbitrary
    text (the tokenizer feeds it every lowercased \\w+ token,
    including digits, underscores, and non-Latin scripts): never
    raises, idempotent across calls, never returns empty for
    non-empty input."""
    from dbpedia_spotlight_db_spark.functions.text import porter_stem

    a = porter_stem(word)
    assert a == porter_stem(word)
    if word:
        assert a
    # stemming only ever strips/rewrites suffixes of bounded growth
    assert len(a) <= len(word) + 1
