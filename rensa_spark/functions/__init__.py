"""Vectorized pandas/Arrow UDFs and JVM-side column expressions."""
