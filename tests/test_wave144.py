"""Wave-144 invariants: weighted kappa matches a pure-Python grid
replay and orders correctly on a fabricated near-diagonal battery;
the C-index grid machinery equals a brute-force quadratic pair
census under the pinned comparability convention."""

from __future__ import annotations

from collections import Counter

from dbpedia_spotlight_db_spark.queries import qml
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _band(p: float) -> int:
    if p < 50000:
        return 1
    if p < 100000:
        return 2
    if p < 200000:
        return 3
    if p < 300000:
        return 4
    return 5


def _wkappa(cells: Counter, weight) -> tuple[int, int, int]:
    n = sum(cells.values())
    rx = Counter()
    cy = Counter()
    for (x, y), c in cells.items():
        rx[x] += c
        cy[y] += c
    obs = sum(weight(x, y) * c for (x, y), c in cells.items())
    exp = sum(
        weight(x, y) * r * s
        for x, r in rx.items()
        for y, s in cy.items()
    )
    return n, obs, exp


def test_weighted_kappa_matches_replay(spark):
    cells = Counter()
    for r in t(spark, SF, "orders").collect():
        cells[
            (int(r["o_orderpriority"][0]), _band(r["o_totalprice"]))
        ] += 1
    n, ol, el = _wkappa(cells, lambda x, y: abs(x - y))
    _, oq, eq = _wkappa(cells, lambda x, y: (x - y) ** 2)
    got = qml.Q["ml_weighted_kappa"](spark, SF).collect()[0]
    assert (got["n"], got["ol"], got["oq"], got["el"], got["eq"]) == (
        n, ol, oq, el, eq,
    )
    assert abs(got["kappa_linear"] - round(1 - n * ol / el, 6)) <= 1e-9
    assert (
        abs(got["kappa_quadratic"] - round(1 - n * oq / eq, 6)) <= 1e-9
    )
    # independent raters: null bulk
    assert abs(got["kappa_linear"]) < 0.1
    assert abs(got["kappa_quadratic"]) < 0.15


def test_weighted_kappa_near_diagonal_battery():
    # strong near-diagonal agreement: off-by-one dominates off-by-four,
    # so quadratic weights forgive more than linear ones
    cells = Counter()
    for k in range(1, 6):
        cells[(k, k)] += 20
        if k < 5:
            cells[(k, k + 1)] += 5
    n, ol, el = _wkappa(cells, lambda x, y: abs(x - y))
    _, oq, eq = _wkappa(cells, lambda x, y: (x - y) ** 2)
    kl = 1 - n * ol / el
    kq = 1 - n * oq / eq
    assert 0.5 < kl < kq < 1.0


def test_c_index_matches_brute_force(spark):
    rows = t(spark, SF, "events").filter("user_id IS NOT NULL").collect()
    by_user = {}
    for r in rows:
        us = int(r["ts"].timestamp() * 1_000_000)
        u = r["user_id"]
        cnt, lo, hi = by_user.get(u, (0, us, us))
        by_user[u] = (cnt + 1, min(lo, us), max(hi, us))
    gmax = max(hi for _, _, hi in by_user.values())
    counts = sorted(c for c, _, _ in by_user.values())
    nu = len(counts)

    def cut(p, q):
        cum = 0
        cc = Counter(counts)
        for v in sorted(cc):
            cum += cc[v]
            if q * cum >= p * nu:
                return v
        return counts[-1]

    q1, q2, q3 = cut(1, 4), cut(1, 2), cut(3, 4)
    panel = []
    for cnt, lo, hi in by_user.values():
        dur = (hi - lo) // 3_600_000_000
        ev = 0 if gmax - hi < 43_200_000_000 else 1
        b = 1 + (cnt > q1) + (cnt > q2) + (cnt > q3)
        panel.append((dur, ev, b))
    conc = disc = tie = 0
    for di, evi, bi in panel:
        if evi != 1:
            continue
        for dj, _, bj in panel:
            if dj > di:  # strict comparability, any j status
                if bj > bi:
                    conc += 1
                elif bj < bi:
                    disc += 1
                else:
                    tie += 1
    got = qml.Q["ml_concordance_index"](spark, SF).collect()[0]
    assert (got["n_conc"], got["n_disc"], got["n_tie"]) == (
        conc, disc, tie,
    )
    tot = conc + disc + tie
    assert tot > 0  # non-degenerate: deaths exist with later survivors
    assert (
        abs(got["c_index"] - round((2 * conc + tie) / (2 * tot), 6))
        <= 1e-9
    )
    assert 0.0 <= got["c_index"] <= 1.0
