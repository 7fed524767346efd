"""Relational / dataflow operators (DataFrame-in, DataFrame-out)."""
