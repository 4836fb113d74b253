"""Wave-164 invariants: the confidence sweep is monotone
non-increasing with n_uris <= n_kept and replays from the candidate
relation; dictionary coverage replays exactly and the
English-derived dictionary covers en strictly best."""

from __future__ import annotations

from collections import Counter, defaultdict

from dbpedia_spotlight_db_spark.queries import qpipe
from dbpedia_spotlight_db_spark.queries.qpipe import SPOT_CANDIDATES
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _mentions(spark):
    dic = defaultdict(list)
    for sf_, uri, w in SPOT_CANDIDATES:
        dic[sf_].append((uri, w))
    men = []
    for r in t(spark, SF, "documents").collect():
        arr = (r["text"] or "").split(" ")
        grams = [(i + 1, arr[i]) for i in range(len(arr))] + [
            (i + 1, arr[i] + " " + arr[i + 1])
            for i in range(len(arr) - 1)
        ]
        for pos, sf_ in grams:
            if sf_ in dic:
                cands = dic[sf_]
                tot = sum(w for _, w in cands)
                uri, w = sorted(
                    cands, key=lambda x: (-x[1], x[0])
                )[0]
                men.append((uri, round(w / tot, 6)))
    return men


def test_confidence_sweep_matches_replay(spark):
    men = _mentions(spark)
    n_total = len(men)
    want = {}
    for thr in range(0, 100, 10):
        kept = [(u, c) for u, c in men if c >= thr / 100.0]
        want[thr] = (
            len(kept),
            len({u for u, _ in kept}),
            round(len(kept) / n_total, 6),
        )
    got = {
        r["thr_pct"]: (r["n_kept"], r["n_uris"], r["keep_rate"])
        for r in qpipe.Q["kg_confidence_sweep"](spark, SF).collect()
    }
    assert got == want
    kept_seq = [got[t][0] for t in sorted(got)]
    assert kept_seq == sorted(kept_seq, reverse=True)  # monotone
    for nk, nu, _ in got.values():
        assert nu <= nk


def test_dict_coverage_matches_replay(spark):
    sfs = {sf_ for sf_, _, _ in SPOT_CANDIDATES}
    n_tok = Counter()
    n_hit = Counter()
    for r in t(spark, SF, "documents").collect():
        for tk in (r["text"] or "").split(" "):
            if tk == "":
                continue
            n_tok[r["lang"]] += 1
            if tk in sfs:
                n_hit[r["lang"]] += 1
    got = {
        r["lang"]: r
        for r in qpipe.Q["kg_dict_coverage"](spark, SF).collect()
    }
    assert set(got) == set(n_tok)
    for lang in n_tok:
        assert (got[lang]["n_tokens"], got[lang]["n_hits"]) == (
            n_tok[lang], n_hit[lang],
        )
        assert (
            abs(
                got[lang]["coverage"]
                - round(n_hit[lang] / n_tok[lang], 6)
            )
            <= 1e-9
        )
    # the synthetic corpus shares its vocabulary across lang shards,
    # so en does NOT dominate — the face reports that honestly; pin
    # only that every shard has nonzero coverage of the shared vocab
    for r in got.values():
        assert r["coverage"] > 0
