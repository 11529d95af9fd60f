"""Round-9 batch 1: batch twins of the streaming-dedup lineage.

``streaming/dedup.py`` deduplicates an unbounded document stream by
k-minhash signature with watermark-bounded state. These queries run
the SAME signature projection (``_with_minhash`` +
``_minhash_sig_col`` — the streaming module's own code path, not a
re-implementation) in batch mode under the DuckDB oracle gate, so the
streaming operator's *semantics* (what counts as a duplicate, which
document survives) are hash-verified even though the stateful
eviction itself is pytest-gated (tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_energy_data_server_spark.io import load_table
from open_energy_data_server_spark.queries import query
from open_energy_data_server_spark.queries.llm_text import (
    SQL_MINHASH,
    SQL_SHINGLES,
    SQL_TOKS,
)

# signature string per document, including the short-doc fallback the
# streaming path applies (raw: + normalized-content md5)
_SQL_SIGS = r"""
    sigs AS (
      SELECT doc, array_to_string(list(CAST(mh AS VARCHAR) ORDER BY i), ',')
               AS minhash_sig
      FROM sig GROUP BY doc
    ),
    withsig AS (
      SELECT d.doc_id,
             COALESCE(
               s.minhash_sig,
               'raw:' || md5(regexp_replace(lower(trim(d.text)), '\s+', ' ', 'g'))
             ) AS minhash_sig
      FROM documents d LEFT JOIN sigs s ON d.doc_id = s.doc
    )"""


@query(
    "q_stream_dedup_batch_twin",
    oracle=f"""
    WITH {SQL_TOKS}, {SQL_SHINGLES}, {SQL_MINHASH}, {_SQL_SIGS}
    SELECT minhash_sig, MIN(doc_id) AS doc_id,
           COUNT(*) AS n_dups
    FROM withsig
    GROUP BY 1
    """,
)
def q_stream_dedup_batch_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first-by-minhash-signature — the batch twin of
    ``streaming.dedup.stream_minhash_dedup``: one surviving doc_id
    (the smallest = first-arrived under the generator's id order) per
    full k=16 signature, with the duplicate count it absorbed. Runs
    the STREAMING module's signature projection verbatim, so the
    stream and batch pipelines provably agree on what a duplicate is.
    Plan: zero-shuffle per-row signature → one hash agg on the
    signature string (map-side combined); at 100 TB the shuffle
    carries (signature, id) pairs, never text."""
    from open_energy_data_server_spark.streaming.dedup import (
        _minhash_sig_col,
        _with_minhash,
    )

    docs = load_table(spark, sf_dir, "documents")
    sigs = (
        _with_minhash(docs, "text", 16, 3)
        .withColumn("minhash_sig", _minhash_sig_col("text", 16))
        .select("doc_id", "minhash_sig")
    )
    return sigs.groupBy("minhash_sig").agg(
        F.min("doc_id").alias("doc_id"),
        F.count(F.lit(1)).alias("n_dups"),
    )
