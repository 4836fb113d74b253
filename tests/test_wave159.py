"""Wave-159 invariants: sentence stats replay from a Python splitter
(including the exact lower median over the length support), and the
Fano factor replays from daily counts with the chi-square acceptance
band honored on the fixture."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

from dbpedia_spotlight_db_spark.queries import qadv, qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_sentence_stats_matches_replay(spark):
    per = defaultdict(list)
    for r in t(spark, SF, "documents").collect():
        for s in re.split(r"[.!?]+", r["text"] or ""):
            if s.strip() == "":
                continue
            nw = len([x for x in s.strip().split(" ") if x != ""])
            per[r["source"]].append(nw)
    got = {
        r["source"]: r
        for r in qadv.Q["text_sentence_stats"](spark, SF).collect()
    }
    assert set(got) == set(per)
    for src, lens in per.items():
        n = len(lens)
        tot = sum(lens)
        cnt = Counter(lens)
        cum = 0
        med = None
        for v in sorted(cnt):
            cum += cnt[v]
            if med is None and 2 * cum >= n:
                med = v
        assert (
            got[src]["n_sentences"],
            got[src]["n_words"],
            got[src]["median_len"],
            got[src]["max_len"],
        ) == (n, tot, med, max(lens))
        assert abs(got[src]["mean_len"] - round(tot / n, 6)) <= 1e-9


def test_fano_matches_replay(spark):
    daily = Counter()
    for r in t(spark, SF, "events").collect():
        if r["ts"] is None:
            continue
        us = int(r["ts"].timestamp() * 1_000_000)
        daily[us // 86_400_000_000] += 1
    n = len(daily)
    s1 = sum(daily.values())
    s2 = sum(c * c for c in daily.values())
    got = qstats.Q["events_fano"](spark, SF).collect()[0]
    assert (got["n"], got["s1"], got["s2"]) == (n, s1, s2)
    fano = (n * s2 - s1 * s1) / (n - 1.0) / s1
    assert abs(got["fano"] - round(fano, 6)) <= 1e-9
    # fixture sits inside the 3-sigma Poisson band
    assert abs(fano - 1.0) < 3.0 * math.sqrt(2.0 / (n - 1))
    assert got["poisson_ok"] is True
