"""Wave-123 invariants: the learning curve's three AUCs equal the
exact rank-sum replay on each NESTED md5 subset, the subsets really
nest (n strictly increases), and every AUC agrees with a brute-force
pairwise count on the smallest fraction."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from dbpedia_spotlight_db_spark.queries import qml
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_learning_curve_matches_replay(spark):
    rows = []
    for r in t(spark, SF, "events").collect():
        if r["value"] is None:
            continue
        h = hashlib.md5(f"lc:{r['event_id']}".encode()).hexdigest()[0]
        tier = 25 if h < "4" else 50 if h < "8" else 100
        rows.append(
            (tier, round(r["value"] * 100),
             1 if r["event_type"] == "purchase" else 0)
        )
    got = {
        r["frac"]: (r["n"], r["n_pos"], r["n_neg"], r["auc"])
        for r in qml.Q["ml_learning_curve"](spark, SF).collect()
    }
    ns = []
    for frac in (25, 50, 100):
        sub = [(c, p) for tier, c, p in rows if tier <= frac]
        support = defaultdict(lambda: [0, 0])
        for c, p in sub:
            support[c][0] += 1
            support[c][1] += p
        cum = 0
        s2 = 0
        for c in sorted(support):
            cnt, p = support[c]
            cum += cnt
            s2 += p * (2 * cum - cnt + 1)
        n = len(sub)
        np_ = sum(p for _, p in sub)
        nn = n - np_
        auc = round((s2 - np_ * (np_ + 1)) / (2.0 * np_ * nn), 6)
        assert got[frac][:3] == (n, np_, nn)
        assert abs(got[frac][3] - auc) <= 1e-9
        ns.append(n)
        if frac == 25:
            # brute-force cross-check on the smallest subset
            wins = ties = 0
            pos = [c for c, p in sub if p]
            neg = [c for c, p in sub if not p]
            for cp in pos:
                for cn in neg:
                    wins += cp > cn
                    ties += cp == cn
            brute = round((wins + 0.5 * ties) / (len(pos) * len(neg)), 6)
            assert abs(got[25][3] - brute) <= 1e-9
    assert ns[0] < ns[1] < ns[2], "fractions must nest strictly"
