"""Distributed operators: salted skew-aware aggregation, dictionary
spotting, candidate joins, generative scoring, top-k windows, redirect
closure, dedup family, ANN similarity search.
"""
