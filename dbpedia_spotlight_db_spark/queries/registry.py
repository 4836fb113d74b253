from __future__ import annotations

from . import qdata, qpipe, qrel

QUERIES = {}
ORACLES = {}
for mod in (qrel, qpipe, qdata):
    QUERIES.update(mod.Q)
    ORACLES.update(mod.O)
