"""Pipeline phases: P0 build_stores, P1 annotate, P2 canonicalize,
P3 materialize, plus checkpoint/resume lineage.
"""
