"""Hot-shingle df-cap in ngram_jaccard_pairs (the quadratic-blow-up
guard): pairs untouched by hot shingles are bit-identical to the
uncapped result; pairs containing a hot shingle use the df-capped
universe (hot shingles removed from intersection AND union)."""

from __future__ import annotations

from itertools import combinations

from dbpedia_spotlight_db_spark.operators.dedup import ngram_jaccard_pairs


def _ref_jaccard(docs: dict[int, str], n: int, max_df: int | None):
    """Pure-python reference: distinct word-3-gram sets, optional
    df-cap exclusion, exact jaccard."""
    sets = {}
    for i, text in docs.items():
        ws = text.lower().split()
        sets[i] = {" ".join(ws[j : j + n]) for j in range(len(ws) - n + 1)}
    if max_df is not None:
        df: dict[str, int] = {}
        for s in sets.values():
            for sh in s:
                df[sh] = df.get(sh, 0) + 1
        hot = {sh for sh, d in df.items() if d > max_df}
        sets = {i: s - hot for i, s in sets.items()}
    out = {}
    for a, b in combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if inter and union:
            out[(a, b)] = round(inter / union, 6)
    return out


DOCS = {
    # "zz yy xx" is the hot shingle: present in docs 0-4 (df=5)
    0: "zz yy xx alpha beta gamma delta",
    1: "zz yy xx alpha beta gamma epsilon",
    2: "zz yy xx totally different words here",
    3: "zz yy xx more unrelated filler tokens",
    4: "zz yy xx qq rr ss tt",
    # 5/6 share no hot shingle: their pair must be identical capped
    # vs uncapped
    5: "one two three four five six seven",
    6: "one two three four five six eight",
}


def _run(spark, max_df):
    df = spark.createDataFrame(
        [(i, t) for i, t in DOCS.items()], ["doc_id", "text"]
    )
    got = ngram_jaccard_pairs(
        df, "doc_id", "text", shingle_n=3, threshold=0.01, max_df=max_df
    ).collect()
    return {(r.id_a, r.id_b): r.jaccard for r in got}


def test_capped_matches_reference(spark):
    got = _run(spark, max_df=4)  # df=5 shingle is hot
    want = _ref_jaccard(DOCS, 3, max_df=4)
    assert got == want


def test_cap_noop_when_nothing_hot(spark):
    got = _run(spark, max_df=1000)
    want = _ref_jaccard(DOCS, 3, max_df=None)
    assert got == want


def test_non_hot_pairs_unchanged_by_cap(spark):
    capped = _run(spark, max_df=4)
    uncapped = _run(spark, max_df=1000)
    # the (5,6) pair shares no hot shingle -> identical either way
    assert capped[(5, 6)] == uncapped[(5, 6)]
    # hot-shingle pairs lose the hot shingle from inter AND union
    assert capped[(0, 1)] != uncapped[(0, 1)]


def test_connected_components_directed(spark):
    """Chains, a star, and singletons-by-absence: component = min id,
    long chain converges via the pointer-jump step (O(log d) rounds)."""
    from dbpedia_spotlight_db_spark.operators.dedup import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        # chain 1-2-3-4-5-6-7-8, star 20-(21,22,23), pair 30-31
        [(i, i + 1) for i in range(1, 8)]
        + [(20, 21), (20, 22), (20, 23), (30, 31)],
        ["id_a", "id_b"],
    )
    got = {
        r.id: r.component for r in connected_components(pairs).collect()
    }
    assert got == {
        **{i: 1 for i in range(1, 9)},
        **{i: 20 for i in (20, 21, 22, 23)},
        30: 30, 31: 30,
    }


def test_connected_components_two_phase_equals_propagate(spark):
    """Both CC algorithms (large-star/small-star vs min-label
    propagation) reach the identical fixpoint on a random sparse
    graph — the semantics the DuckDB recursive-CTE oracle pins."""
    import random

    from dbpedia_spotlight_db_spark.operators.dedup import (
        connected_components,
    )

    rng = random.Random(7)
    pairs = spark.createDataFrame(
        [(rng.randrange(200), rng.randrange(200)) for _ in range(150)],
        ["id_a", "id_b"],
    ).filter("id_a != id_b")
    two = {
        r.id: r.component
        for r in connected_components(pairs, algorithm="two_phase").collect()
    }
    prop = {
        r.id: r.component
        for r in connected_components(pairs, algorithm="propagate").collect()
    }
    assert two == prop and two


def test_connected_components_giant_component(spark):
    """Web-crawl skew fixture: one boilerplate cluster spans >50% of
    all nodes (a 600-node hub-and-chain mix) next to small clusters.
    The two-phase default must label it correctly — this is the shape
    where label propagation concentrates the whole membership behind
    one reduce key."""
    from dbpedia_spotlight_db_spark.operators.dedup import (
        connected_components,
    )

    giant = (
        # hub 0 with 300 spokes
        [(0, i) for i in range(1, 301)]
        # plus a 300-node chain hanging off spoke 300
        + [(i, i + 1) for i in range(300, 600)]
    )
    small = [(1000 + 2 * k, 1001 + 2 * k) for k in range(50)]
    pairs = spark.createDataFrame(giant + small, ["id_a", "id_b"])
    got = {
        r.id: r.component for r in connected_components(pairs).collect()
    }
    assert all(got[i] == 0 for i in range(0, 601))
    assert all(
        got[1000 + 2 * k] == got[1001 + 2 * k] == 1000 + 2 * k
        for k in range(50)
    )
    assert len(got) == 601 + 100


def test_simhash_pairs_pigeonhole_exact(spark):
    """Banded candidate generation has EXACT recall for
    hamming <= bands-1 (pigeonhole): banded pairs == brute-force
    all-pairs Hamming on random 16-bit fingerprints."""
    import random

    from pyspark.sql import functions as F

    from dbpedia_spotlight_db_spark.operators.dedup import simhash_pairs

    rng = random.Random(7)
    fps = [(i, "".join(rng.choice("01") for _ in range(16))) for i in range(60)]
    # seed some near-dups so the <=3 band actually fires
    for i in range(0, 20, 2):
        base = list(fps[i][1])
        flip = rng.randrange(16)
        base[flip] = "1" if base[flip] == "0" else "0"
        fps[i + 1] = (fps[i + 1][0], "".join(base))
    df = spark.createDataFrame(fps, ["id", "simhash"])
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_pairs(df, bits=16, bands=4, max_hamming=3).collect()
    }
    want = set()
    for i in range(len(fps)):
        for j in range(i + 1, len(fps)):
            h = sum(a != b for a, b in zip(fps[i][1], fps[j][1]))
            if h <= 3:
                want.add((fps[i][0], fps[j][0], h))
    assert got == want and got


def test_simhash_pairs_default_geometry_64bit(spark):
    """The job-facing default is now 64-bit fingerprints (16-bit
    chunks): exact recall still holds at the wide default, checked
    against brute-force all-pairs Hamming."""
    import random

    from dbpedia_spotlight_db_spark.operators.dedup import simhash_pairs

    rng = random.Random(11)
    fps = [
        (i, "".join(rng.choice("01") for _ in range(64))) for i in range(40)
    ]
    for i in range(0, 16, 2):  # seed near-dups (1-3 bit flips)
        base = list(fps[i][1])
        for flip in rng.sample(range(64), rng.randint(1, 3)):
            base[flip] = "1" if base[flip] == "0" else "0"
        fps[i + 1] = (fps[i + 1][0], "".join(base))
    df = spark.createDataFrame(fps, ["id", "simhash"])
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_pairs(df, expected_docs=10**6).collect()
    }
    want = set()
    for i in range(len(fps)):
        for j in range(i + 1, len(fps)):
            h = sum(a != b for a, b in zip(fps[i][1], fps[j][1]))
            if h <= 3:
                want.add((fps[i][0], fps[j][0], h))
    assert got == want and got


def test_simhash_geometry_guard_refuses_narrow_buckets(spark):
    """The 16-bit fixture geometry is fine for hundreds of docs but a
    corpus-scale footgun: with expected_docs set, the operator must
    refuse an average bucket above the threshold instead of silently
    degenerating toward an all-pairs join."""
    import pytest

    from dbpedia_spotlight_db_spark.operators.dedup import simhash_pairs

    df = spark.createDataFrame([(0, "0" * 16)], ["id", "simhash"])
    with pytest.raises(AssertionError, match="geometry too narrow"):
        simhash_pairs(df, bits=16, bands=4, expected_docs=10**9)
    # wide default comfortably passes the same corpus size
    simhash_pairs(df.withColumn("simhash", df.simhash.substr(1, 16)),
                  bits=16, bands=4, expected_docs=500)


def test_lsh_hot_bucket_cap_parity_with_oracle(spark, tmp_path):
    """1100 identical docs put every signature in one (band, bucket)
    — over the max_bucket=1000 cap, so BOTH the operator and the
    rewritten DuckDB twin must emit ZERO pairs (before the twin
    mirrored the cap, it would have emitted ~600k). A smaller cap-off
    control proves the bucket genuinely collides."""
    import duckdb

    from dbpedia_spotlight_db_spark.operators import dedup as dd
    from dbpedia_spotlight_db_spark.queries import qdata

    text = "alpha beta gamma delta epsilon"
    rows = [(i, text, "en", "s", len(text)) for i in range(1100)]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{tmp_path}/documents.parquet")

    # operator path: capped -> no pairs
    assert qdata.Q["dedup_lsh_pairs"](spark, str(tmp_path)).count() == 0

    # oracle path: the rewritten twin must agree
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    assert len(con.execute(qdata.O["dedup_lsh_pairs"]).fetchall()) == 0

    # control: with the cap lifted the bucket really does collide
    docs = spark.read.parquet(f"{tmp_path}/documents.parquet").limit(60)
    sigs = dd.minhash_signatures(docs, "doc_id", "text", n_hashes=4)
    n = dd.lsh_pairs(sigs, n_hashes=4, bands=4, max_bucket=10**6).count()
    assert n == 60 * 59 // 2
