"""Reader/normalizer library (SURVEY §2.1) — the Spark-side of the
reference's ~30 crawler input formats. Network fetching is a separate
landing-zone step (Spark reads files, not URLs); everything here
turns landed files into normalized DataFrames."""
