"""Composite operators (SURVEY §2.4–§2.7 + the 100 TB-scale
extensions): reshape, as-of alignment, dedup, similarity, spatial —
each expressed as compositions of built-in DataFrame ops first,
Arrow-batched Pandas UDFs only where Spark genuinely lacks the
primitive."""
