"""Scalar/column function library (Arrow-batched pandas UDFs + pure
column expressions). Hot paths stay JVM-side; Python appears only as
vectorized pandas UDFs over Arrow batches (BASELINE.json input_hint:
"no per-row Python").
"""
