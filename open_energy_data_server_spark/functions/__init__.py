"""Scalar function kits (SURVEY §2.3) — all built on
``pyspark.sql.functions`` so every expression stays JVM-side inside
whole-stage codegen; no Python UDFs in the hot path."""
