"""Slow, scalar, pure-Python reference implementations of rensa's semantics.

Used only by tests and the recall harness: the numpy kernels and the Spark
DataFrame operators must reproduce these outputs bit-for-bit (the analogue of
the reference's SIMD-vs-scalar and batch-vs-scalar equivalence tests,
/root/reference/tests/test_rensa.py:178-298, 555-637).
"""
