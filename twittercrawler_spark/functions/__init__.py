"""Scalar function layer: pure-Python parity twins + vectorized Spark exprs."""
