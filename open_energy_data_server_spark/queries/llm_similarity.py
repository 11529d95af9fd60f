"""Similarity-search + multimodal conformance queries on the
``embeddings`` / ``documents`` tables (north-star extensions)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_energy_data_server_spark.io import load_table
from open_energy_data_server_spark.operators.multimodal import decode_features
from open_energy_data_server_spark.operators.similarity import (
    brute_force_topk,
    hyperplane_buckets,
)
from open_energy_data_server_spark.queries import query
from open_energy_data_server_spark.queries._util import SCALE

# (vid, pos, val) long form of the embedding column — the relational
# twin of the engine's per-row zip_with folds (zipped unnest is
# 0-based via range(), matching posexplode)
SQL_COMP = """
  comp AS (
    SELECT vec_id AS vid,
           unnest(range(len(embedding))) AS pos,
           CAST(unnest(embedding) AS DOUBLE) AS val
    FROM embeddings
  )"""

# fixed-point term: sign(z)·floor(|z|+0.5) — the oracle twin of
# operators.similarity.fixed_round (identical IEEE double ops in both
# engines; see its docstring for why not ROUND)
_FR = (
    f"CAST(SIGN(({{expr}}) * {SCALE}) "
    f"* FLOOR(ABS(({{expr}}) * {SCALE}) + 0.5) AS BIGINT)"
)
_FS = f"CAST(SUM({_FR}) AS DOUBLE) / {SCALE}.0"


@query(
    "q_ann_bruteforce_topk",
    oracle=f"""
    WITH {SQL_COMP},
    norms AS (
      SELECT vid, {_FS.format(expr="val * val")} AS norm2 FROM comp GROUP BY vid
    ),
    q AS (
      SELECT vid AS qid, pos, val AS qval FROM comp WHERE vid < 10
    ),
    dots AS (
      SELECT c.vid, q.qid, {_FS.format(expr="c.val * q.qval")} AS dot
      FROM comp c JOIN q ON c.pos = q.pos AND c.vid <> q.qid
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT d.qid AS query_id, d.vid AS neighbor_id,
             d.dot / (SQRT(nq.norm2) * SQRT(nn.norm2)) AS cosine
      FROM dots d
      JOIN norms nq ON d.qid = nq.vid
      JOIN norms nn ON d.vid = nn.vid
    )
    SELECT query_id, neighbor_id, cosine,
           CAST(rn AS INTEGER) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
      FROM scored
    ) WHERE rn <= 5
    """,
)
def q_ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for a 10-vector query set against the whole
    corpus — the ANN correctness baseline. Relational formulation
    (posexplode + fixed-point dot) so DuckDB replays it exactly; the
    engine-internal fast path is ``similarity.cosine_zip`` (zip_with,
    no explode). Query side is broadcast → corpus scan stays one pass."""
    emb = load_table(spark, sf_dir, "embeddings")
    return brute_force_topk(emb, "vec_id", "embedding", query_ids=list(range(10)), k=5)


@query(
    "q_ann_lsh_buckets",
    oracle=f"""
    WITH {SQL_COMP},
    planes AS (SELECT CAST(unnest(range(12)) AS INTEGER) AS j),
    sums AS (
      SELECT vid, j,
             {_FS.format(expr="val * (1 - 2 * ((pos * 31 + j * 17) % 2))")} AS proj
      FROM comp, planes GROUP BY 1, 2
    )
    SELECT vid AS id,
           CAST(SUM(CASE WHEN proj >= 0 THEN CAST(POW(2, j) AS BIGINT) ELSE 0 END) AS BIGINT)
             AS bucket
    FROM sums GROUP BY vid
    """,
)
def q_ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH hyperplane bucketing (12 arithmetic ±1 planes → 4096
    buckets) — the ANN scale path: bucket once at ingest, probe only
    matching buckets at query time; bucket id becomes the partition
    key at 100 TB."""
    emb = load_table(spark, sf_dir, "embeddings")
    return hyperplane_buckets(emb, "vec_id", "embedding", n_planes=12, dim=64)


@query(
    "q_multimodal_decode",
    oracle="""
    SELECT doc_id AS asset_id,
           strlen(text) AS n_bytes,
           CAST(list_aggregate([ascii(substr(text, i+1, 1)) FOR i IN range(length(text))], 'sum')
             AS BIGINT) AS sum_bytes,
           CAST(len(list_distinct([ascii(substr(text, i+1, 1)) FOR i IN range(length(text))]))
             AS INTEGER) AS n_distinct_bytes,
           CAST(list_aggregate([ascii(substr(text, i+1, 1)) FOR i IN range(length(text))], 'sum')
             AS DOUBLE) / strlen(text) AS mean_byte
    FROM documents
    WHERE strlen(text) = length(text)
    """,
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing, end to end: documents.text encoded to a
    binary payload column, features extracted by the Arrow-batched
    mapInPandas fake decoder (operators.multimodal — the decode is the
    documented stub; the batch plumbing is real). Restricted to
    ASCII-pure rows so the byte-level oracle is SQL-expressible."""
    docs = load_table(spark, sf_dir, "documents")
    assets = docs.filter(F.octet_length("text") == F.length("text")).select(
        F.col("doc_id").alias("asset_id"),
        F.encode("text", "utf-8").alias("payload"),
    )
    feats = decode_features(assets)
    # python ints sum exactly; mean recomputed as double for parity
    return feats.select(
        "asset_id",
        "n_bytes",
        "sum_bytes",
        "n_distinct_bytes",
        (F.col("sum_bytes").cast("double") / F.col("n_bytes")).alias("mean_byte"),
    )


@query(
    "q_dedup_embedding_cosine",
    oracle=f"""
    WITH sample AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id % 17 = 0
    ),
    comp AS (
      SELECT vec_id AS vid,
             unnest(range(len(embedding))) AS pos,
             CAST(unnest(embedding) AS DOUBLE) AS val
      FROM sample
    ),
    norms AS (
      SELECT vid, {_FS.format(expr="val * val")} AS norm2 FROM comp GROUP BY vid
    ),
    dots AS (
      SELECT a.vid AS va, b.vid AS vb, {_FS.format(expr="a.val * b.val")} AS dot
      FROM comp a JOIN comp b ON a.pos = b.pos AND a.vid < b.vid
      GROUP BY 1, 2
    )
    SELECT d.va AS id_a, d.vb AS id_b,
           d.dot / (SQRT(na.norm2) * SQRT(nb.norm2)) AS cosine
    FROM dots d JOIN norms na ON d.va = na.vid JOIN norms nb ON d.vb = nb.vid
    WHERE d.dot / (SQRT(na.norm2) * SQRT(nb.norm2)) >= 0.3
    """,
)
def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (dedup-suite member for vector
    columns) over a deterministic 1/17 sample — the operator itself
    (similarity.cosine_neardup_pairs) takes a blocking column
    (LSH bucket / label) to bound the pair space at corpus scale."""
    from open_energy_data_server_spark.operators.similarity import cosine_neardup_pairs

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 17 == 0)
    # deterministic 1/17 sample → the bounded-size case the quadratic
    # fallback exists for; corpus-scale callers pass block_col instead
    return cosine_neardup_pairs(
        emb, "vec_id", "embedding", threshold=0.3, allow_quadratic=True
    )


@query(
    "q_ann_ivf_probe",
    oracle=f"""
    WITH {SQL_COMP},
    norms AS (
      SELECT vid, {_FS.format(expr="val * val")} AS norm2 FROM comp GROUP BY vid
    ),
    centc AS (SELECT vid AS cid, pos, val AS cval FROM comp WHERE vid < 16),
    cscore AS (
      SELECT c.vid, cc.cid, {_FS.format(expr="c.val * cc.cval")} AS dot
      FROM comp c JOIN centc cc ON c.pos = cc.pos
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT s.vid, s.cid,
             ROW_NUMBER() OVER (
               PARTITION BY s.vid
               ORDER BY s.dot / (SQRT(nv.norm2) * SQRT(nc.norm2)) DESC, s.cid) AS rn
      FROM cscore s
      JOIN norms nv ON s.vid = nv.vid
      JOIN norms nc ON s.cid = nc.vid
    ),
    assigned AS (SELECT vid, cid AS cluster FROM ranked WHERE rn = 1),
    probes AS (SELECT vid AS qid, cid AS cluster FROM ranked WHERE vid < 10 AND rn <= 2),
    cand AS (
      SELECT p.qid, a.vid
      FROM probes p JOIN assigned a USING (cluster)
      WHERE a.vid <> p.qid
    ),
    qdots AS (
      SELECT cand.qid, cand.vid, {_FS.format(expr="cq.val * cv.val")} AS dot
      FROM cand
      JOIN comp cq ON cq.vid = cand.qid
      JOIN comp cv ON cv.vid = cand.vid AND cv.pos = cq.pos
      GROUP BY 1, 2
    ),
    scoredq AS (
      SELECT q.qid AS query_id, q.vid AS neighbor_id,
             q.dot / (SQRT(nq.norm2) * SQRT(nn.norm2)) AS cosine
      FROM qdots q JOIN norms nq ON q.qid = nq.vid JOIN norms nn ON q.vid = nn.vid
    )
    SELECT query_id, neighbor_id, cosine, CAST(rn AS INTEGER) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
      FROM scoredq
    ) WHERE rn <= 5
    """,
)
def q_ann_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (the second scale path beside LSH): 16 deterministic
    coarse centroids (lowest-id vectors, standing in for the offline
    k-means codebook), zero-shuffle cosine assignment of the corpus,
    queries probe their 2 nearest inverted lists, exact top-5 within
    candidates. At 100 TB the corpus is bucketed by cluster id so a
    probe reads nprobe/16 of the data."""
    from open_energy_data_server_spark.operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(
        emb, "vec_id", "embedding", query_ids=list(range(10)), n_centroids=16,
        nprobe=2, k=5,
    )


@query(
    "q_semdedup_pairs",
    oracle=f"""
    WITH {SQL_COMP},
    norms AS (
      SELECT vid, {_FS.format(expr="val * val")} AS norm2 FROM comp GROUP BY vid
    ),
    centc AS (SELECT vid AS cid, pos, val AS cval FROM comp WHERE vid < 16),
    cscore AS (
      SELECT c.vid, cc.cid, {_FS.format(expr="c.val * cc.cval")} AS dot
      FROM comp c JOIN centc cc ON c.pos = cc.pos
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT s.vid, s.cid,
             ROW_NUMBER() OVER (
               PARTITION BY s.vid
               ORDER BY s.dot / (SQRT(nv.norm2) * SQRT(nc.norm2)) DESC, s.cid) AS rn
      FROM cscore s
      JOIN norms nv ON s.vid = nv.vid
      JOIN norms nc ON s.cid = nc.vid
    ),
    assigned AS (SELECT vid, cid AS cluster FROM ranked WHERE rn = 1),
    pairs AS (
      SELECT a.vid AS va, b.vid AS vb, a.cluster
      FROM assigned a JOIN assigned b USING (cluster)
      WHERE a.vid < b.vid
    ),
    pdots AS (
      SELECT p.va, p.vb, p.cluster, {_FS.format(expr="ca.val * cb.val")} AS dot
      FROM pairs p
      JOIN comp ca ON ca.vid = p.va
      JOIN comp cb ON cb.vid = p.vb AND cb.pos = ca.pos
      GROUP BY 1, 2, 3
    )
    SELECT va AS id_a, vb AS id_b, CAST(cluster AS INTEGER) AS cluster,
           d.dot / (SQRT(na.norm2) * SQRT(nb.norm2)) AS cosine
    FROM pdots d
    JOIN norms na ON d.va = na.vid
    JOIN norms nb ON d.vb = nb.vid
    WHERE d.dot / (SQRT(na.norm2) * SQRT(nb.norm2)) >= 0.3
    """,
)
def q_semdedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table: 16 deterministic coarse
    clusters (lowest-id codebook, as the IVF path), within-cluster
    cosine near-dup pairs at threshold 0.3 — the cluster id is the
    blocking key cosine_neardup_pairs requires at scale
    (operators.similarity.semdedup_pairs). Doubling the codebook from
    8 halved the blocked pair count (Σ|c|² — the knob that bounds
    SemDeDup's cost as the corpus grows: k scales with n so |cluster|
    stays fixed)."""
    from open_energy_data_server_spark.operators.similarity import semdedup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    return semdedup_pairs(emb, "vec_id", "embedding", n_clusters=16, threshold=0.3)


# DuckDB twin of multimodal.dhash_bits on the ASCII stand-in grid
_DHASH_SQL = " + ".join(
    f"(CASE WHEN ascii(substr(text, {r * 11 + c + 1}, 1))"
    f" < ascii(substr(text, {r * 11 + c + 2}, 1))"
    f" THEN CAST({1 << (r * 10 + c)} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    for r in range(6)
    for c in range(10)
)


@query(
    "q_image_dhash",
    oracle=f"""
    WITH grids AS (
      SELECT doc_id AS asset_id, text FROM documents
      WHERE strlen(text) = length(text) AND length(text) >= 66
    ),
    h AS (SELECT asset_id, ({_DHASH_SQL}) AS dhash FROM grids)
    SELECT asset_id, dhash,
           CAST((dhash >> 0)  & 32767 AS BIGINT) AS band0,
           CAST((dhash >> 15) & 32767 AS BIGINT) AS band1,
           CAST((dhash >> 30) & 32767 AS BIGINT) AS band2,
           CAST((dhash >> 45) & 32767 AS BIGINT) AS band3
    FROM h
    """,
)
def q_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual difference-hash index build (multimodal near-dup
    scale path): 60-bit dHash per asset + the 4 × 15-bit LSH band
    keys that bucket the corpus for pair search
    (operators.multimodal.dhash_bits/dhash_bands). Byte grids use the
    ASCII stand-in convention of q_multimodal_decode; real binary
    payloads reach the same grid through the injectable codec seam.
    Pure projection — zero shuffles, whole-stage codegen."""
    from open_energy_data_server_spark.operators.multimodal import (
        dhash_bands,
        dhash_bits,
    )

    docs = load_table(spark, sf_dir, "documents")
    grids = docs.filter(
        (F.octet_length("text") == F.length("text")) & (F.length("text") >= 66)
    ).select(F.col("doc_id").alias("asset_id"), F.col("text"))
    h = grids.select("asset_id", dhash_bits(F.col("text")).alias("dhash"))
    return h.select("asset_id", "dhash", *dhash_bands(F.col("dhash")))


@query(
    "q_kmeans_refine",
    oracle=f"""
    WITH {SQL_COMP},
    norms AS (
      SELECT vid, {_FS.format(expr="val * val")} AS norm2 FROM comp GROUP BY vid
    ),
    centc0 AS (SELECT vid AS cid, pos, val AS cval FROM comp WHERE vid < 8),
    cscore0 AS (
      SELECT c.vid, cc.cid, {_FS.format(expr="c.val * cc.cval")} AS dot
      FROM comp c JOIN centc0 cc ON c.pos = cc.pos
      GROUP BY 1, 2
    ),
    cnorm0 AS (
      SELECT cid, {_FS.format(expr="cval * cval")} AS norm2 FROM centc0 GROUP BY cid
    ),
    ranked0 AS (
      SELECT s.vid, s.cid,
             ROW_NUMBER() OVER (
               PARTITION BY s.vid
               ORDER BY s.dot / (SQRT(nv.norm2) * SQRT(nc.norm2)) DESC, s.cid) AS rn
      FROM cscore0 s
      JOIN norms nv ON s.vid = nv.vid
      JOIN cnorm0 nc ON s.cid = nc.cid
    ),
    a0 AS (SELECT vid, cid AS cluster0 FROM ranked0 WHERE rn = 1),
    cent1 AS (
      SELECT a.cluster0 AS cid, c.pos,
             (CAST(SUM(CAST(SIGN(c.val * {SCALE})
                            * FLOOR(ABS(c.val * {SCALE}) + 0.5) AS BIGINT)) AS DOUBLE)
                / {SCALE}.0) / COUNT(*) AS cval
      FROM comp c JOIN a0 a ON c.vid = a.vid
      GROUP BY 1, 2
    ),
    cnorm1 AS (
      SELECT cid, {_FS.format(expr="cval * cval")} AS norm2 FROM cent1 GROUP BY cid
    ),
    cscore1 AS (
      SELECT c.vid, t.cid, {_FS.format(expr="c.val * t.cval")} AS dot
      FROM comp c JOIN cent1 t ON c.pos = t.pos
      GROUP BY 1, 2
    ),
    ranked1 AS (
      SELECT s.vid, s.cid,
             ROW_NUMBER() OVER (
               PARTITION BY s.vid
               ORDER BY s.dot / (SQRT(nv.norm2) * SQRT(nc.norm2)) DESC, s.cid) AS rn
      FROM cscore1 s
      JOIN norms nv ON s.vid = nv.vid
      JOIN cnorm1 nc ON s.cid = nc.cid
    ),
    a1 AS (SELECT vid, cid AS cluster FROM ranked1 WHERE rn = 1)
    SELECT a0.vid, CAST(cluster0 AS INTEGER) AS cluster0,
           CAST(cluster AS INTEGER) AS cluster,
           cluster0 <> cluster AS moved
    FROM a0 JOIN a1 ON a0.vid = a1.vid
    """,
)
def q_kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full Lloyd step of the distributed spherical k-means
    codebook trainer (operators/kmeans.py): assign to the lowest-id
    seed, recompute centroids as fixed-point per-dim means, re-assign.
    The DuckDB twin replays the entire iteration bit-for-bit — the
    iterative-algorithm path under the same hash gate as the
    relational operators."""
    from open_energy_data_server_spark.operators.kmeans import (
        kmeans_refine_assignment,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_refine_assignment(emb, "vec_id", "embedding", k=8)


# PQ oracle building blocks: (vid, s, i, val) subspace components and
# the per-(vid, subspace, code) fixed-point squared L2 to each of the
# 16 codebook entries (codebook = subslices of the 16 lowest-id
# vectors — the same deterministic stand-in the Spark side embeds).
_PQ_SUB = """
  sub AS (
    SELECT vid, CAST(FLOOR(pos / 16) AS INTEGER) AS s, pos % 16 AS i, val
    FROM comp
  ),
  cb AS (SELECT vid AS code, s, i, val AS cval FROM sub WHERE vid < 16),
  dists AS (
    SELECT x.vid, x.s, cb.code,
           CAST(SUM({fr}) AS BIGINT) AS dist
    FROM sub x JOIN cb ON x.s = cb.s AND x.i = cb.i
    GROUP BY 1, 2, 3
  ),
  best AS (
    SELECT vid, s, code,
           ROW_NUMBER() OVER (PARTITION BY vid, s ORDER BY dist, code) AS rn
    FROM dists
  )""".format(fr=_FR.format(expr="(x.val - cb.cval) * (x.val - cb.cval)"))


@query(
    "q_pq_encode",
    oracle=f"""
    WITH {SQL_COMP},
    {_PQ_SUB}
    SELECT vid,
           CAST(MAX(CASE WHEN s = 0 THEN code END) AS INTEGER) AS code_0,
           CAST(MAX(CASE WHEN s = 1 THEN code END) AS INTEGER) AS code_1,
           CAST(MAX(CASE WHEN s = 2 THEN code END) AS INTEGER) AS code_2,
           CAST(MAX(CASE WHEN s = 3 THEN code END) AS INTEGER) AS code_3
    FROM best WHERE rn = 1 GROUP BY vid
    """,
)
def q_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding (Jégou et al. 2011): every 64-dim
    vector compressed to 4 subspace codes (nearest of 16 codebook
    entries per 16-dim slice, fixed-point squared L2, ties to the
    lowest code). The engine side is a zero-shuffle plan-embedded-
    codebook projection; the oracle recomputes the whole argmin
    relationally from the raw table."""
    from open_energy_data_server_spark.operators.similarity import (
        pq_codebook,
        pq_encode,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cb = pq_codebook(emb, "vec_id", "embedding", n_codes=16, m=4, dsub=16)
    return pq_encode(emb, "vec_id", "embedding", cb, dsub=16)


@query(
    "q_pq_adc_topk",
    oracle=f"""
    WITH {SQL_COMP},
    {_PQ_SUB},
    q AS (
      SELECT vid AS qid, s, i, val AS qval FROM sub
      WHERE vid IN (100, 101, 102, 103, 104)
    ),
    dtable AS (
      SELECT q.qid, cb.s, cb.code,
             CAST(SUM({_FR.format(expr="(q.qval - cb.cval) * (q.qval - cb.cval)")}) AS BIGINT)
               AS sub_dist
      FROM q JOIN cb ON q.s = cb.s AND q.i = cb.i
      GROUP BY 1, 2, 3
    ),
    scored AS (
      SELECT b.vid, dt.qid,
             CAST(SUM(dt.sub_dist) AS BIGINT) AS adc_dist_scaled
      FROM best b JOIN dtable dt ON b.s = dt.s AND b.code = dt.code
      WHERE b.rn = 1
      GROUP BY 1, 2
    )
    SELECT qid AS query_id, vid AS neighbor_id, adc_dist_scaled,
           CAST(rn AS INTEGER) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY qid ORDER BY adc_dist_scaled, vid) AS rn
      FROM scored WHERE vid <> qid
    ) WHERE rn <= 5
    """,
)
def q_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance top-5 over PQ codes for a 5-query set: the
    corpus is ranked from its 4-byte codes alone via per-subspace
    distance tables (compressed-domain ANN — the 100 TB scale path
    where raw vectors are never re-read at query time). Distances are
    exact fixed-point bigints, so the DuckDB twin replays encode,
    distance tables, and ranking end to end."""
    from open_energy_data_server_spark.operators.similarity import pq_adc_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return pq_adc_topk(
        emb,
        "vec_id",
        "embedding",
        query_ids=[100, 101, 102, 103, 104],
        n_codes=16,
        m=4,
        dsub=16,
        k=5,
    )
