"""Spark DataFrame stages composing the parity kernels."""
