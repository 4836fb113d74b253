"""Wave-46 invariants: the streaming Python-DataSource sink against
the batch NT export (manifest accounting included), Wilcoxon
signed-rank against a pure-Python replay of the pairing + doubled
ranks, and log loss against a clipped replay."""

from __future__ import annotations

import math
import os
from collections import Counter

from dbpedia_spotlight_db_spark.queries import qml, qpipe
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _rnd_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_stream_sink_matches_batch_export(spark, tmp_path):
    from dbpedia_spotlight_db_spark.sources import nt_datasource

    nt_datasource.register(spark)
    src = str(tmp_path / "src")
    qpipe.Q["kg_export_nt"](spark, SF).write.mode("overwrite").text(src)
    batch = {
        tuple(r)
        for r in spark.read.format("ntriples").load(src).collect()
    }
    out = str(tmp_path / "out")
    q_ = (
        spark.readStream.format("ntriples")
        .load(src)
        .writeStream.format("ntriples")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q_.awaitTermination()
    streamed = {
        tuple(r)
        for r in spark.read.format("ntriples").load(out).collect()
    }
    assert streamed == batch and len(batch) > 0
    # the per-batch commit manifest accounts for every triple
    manifest = os.path.join(out, "_SUCCESS_STREAM")
    assert os.path.exists(manifest)
    total = sum(
        int(line.split("\t")[1])
        for line in open(manifest)
        if line.strip()
    )
    assert total == len(batch)


def test_wilcoxon_matches_replay(spark):
    rows = (
        t(spark, SF, "events")
        .filter("value IS NOT NULL")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    per: dict[int, list] = {}
    for r in rows:
        key = int(r["ts"].timestamp()) * 10**9 + r["event_id"]
        per.setdefault(r["user_id"], []).append(
            (key, _rnd_away(r["value"] * 100))
        )
    ds = []
    for evs in per.values():
        evs.sort()
        d = evs[-1][1] - evs[0][1]
        if d != 0:
            ds.append(d)
    sup = Counter(abs(d) for d in ds)
    w2p = 0
    cum = 0
    for ad in sorted(sup):
        rx2 = 2 * cum + sup[ad] + 1
        cp = sum(1 for d in ds if d > 0 and abs(d) == ad)
        w2p += cp * rx2
        cum += sup[ad]
    got = qml.Q["stat_wilcoxon"](spark, SF).collect()[0]
    assert got["n"] == len(ds)
    assert got["w2_plus"] == w2p
    assert abs(got["r_plus"] - w2p / (len(ds) * (len(ds) + 1))) < 1e-6


def test_log_loss_matches_replay(spark):
    rows = (
        t(spark, SF, "events")
        .filter("value IS NOT NULL")
        .select("value", "event_type")
        .collect()
    )
    cents = [_rnd_away(r["value"] * 100) for r in rows]
    pos = [1 if r["event_type"] == "purchase" else 0 for r in rows]
    mn, mx = min(cents), max(cents)
    ll = 0
    for c, y in zip(cents, pos):
        ph = 500 if mx == mn else _rnd_away(1000.0 * (c - mn) / (mx - mn))
        ph = min(max(ph, 1), 999)
        lp = _rnd_away(1e6 * math.log(ph / 1000.0))
        ln = _rnd_away(1e6 * math.log((1000 - ph) / 1000.0))
        ll += y * lp + (1 - y) * ln
    got = qml.Q["ml_log_loss"](spark, SF).collect()[0]
    assert got["n"] == len(cents)
    assert abs(got["log_loss"] - (-(ll / 1e6) / len(cents))) < 1e-6
    assert got["log_loss"] > 0
