"""Similarity search over the ``embeddings`` table: brute-force cosine
top-k (correctness baseline) and an IVF-bucketed variant (the scale
path: probe only the nearest centroid buckets instead of scanning all
vectors).

Determinism: IVF "training" picks the first N_CENTROIDS vectors by
vec_id as centroids, so both engines derive the identical index and
results are exactly comparable.  Ordering ties are broken by vec_id.
All scoring is double-precision cosine rounded to 6 decimals (see
functions.dedup.cosine_col).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rdfind_spark.functions.dedup import COSINE_SQL, cosine_col
from rdfind_spark.util import materialize, release

N_QUERIES = 5  # the first N vectors double as the query workload
TOP_K = 10
N_CENTROIDS = 8
N_PROBE = 2


def knn_bruteforce(
    embeddings: DataFrame, n_queries: int = N_QUERIES, k: int = TOP_K
) -> DataFrame:
    """For each query vector (vec_id < n_queries): the k nearest other
    vectors by cosine.  Full scan per query — the exact baseline every
    ANN variant is judged against."""
    q = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = embeddings.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("n_emb")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_col(F.col("q_emb"), F.col("n_emb")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def knn_bruteforce_sql(n_queries: int = N_QUERIES, k: int = TOP_K) -> str:
    cos = COSINE_SQL.format(a="q.embedding", b="c.embedding")
    return f"""WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {cos} AS cosine
  FROM embeddings q, embeddings c
  WHERE q.vec_id < {n_queries} AND q.vec_id <> c.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {k}"""


def ivf_assignments(
    embeddings: DataFrame, n_centroids: int = N_CENTROIDS, n_assign: int = 1
) -> DataFrame:
    """Assign every vector to its ``n_assign`` nearest centroids
    (centroids = the first n_centroids vectors).  This is the IVF index
    build: one broadcast of the centroid table, one scan of the vectors
    — at cluster scale the posting lists would be written
    bucketed/sorted by centroid_id for bucket-pruned probing.
    ``n_assign > 1`` is the multi-assignment variant used for pair
    generation (overlapping coverage so near pairs share a bucket)."""
    cents = embeddings.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("c_emb")
    )
    scored = embeddings.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "centroid_id",
        cosine_col(F.col("embedding"), F.col("c_emb")).alias("cosine"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("centroid_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= n_assign)
        .select("vec_id", "centroid_id")
    )


def ivf_assignments_sql(n_centroids: int = N_CENTROIDS) -> str:
    cos = COSINE_SQL.format(a="v.embedding", b="c.embedding")
    return f"""WITH scored AS (
  SELECT v.vec_id, c.vec_id AS centroid_id, {cos} AS cosine
  FROM embeddings v, embeddings c WHERE c.vec_id < {n_centroids}
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id
                               ORDER BY cosine DESC, centroid_id ASC) AS rnk
  FROM scored
)
SELECT vec_id, centroid_id FROM ranked WHERE rnk = 1"""


def knn_ivf(
    embeddings: DataFrame,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    n_centroids: int = N_CENTROIDS,
    n_probe: int = N_PROBE,
) -> DataFrame:
    """IVF approximate k-NN: each query scores only vectors assigned to
    its n_probe nearest centroids.  The candidate join is
    (query → probed centroid) ⋈ (centroid → bucket members), so the
    scan cost drops from |vectors| to the probed buckets' share."""
    assign = ivf_assignments(embeddings, n_centroids)
    cents = embeddings.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("c_emb")
    )
    q = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    qc = q.crossJoin(F.broadcast(cents)).select(
        "query_id",
        "q_emb",
        "centroid_id",
        cosine_col(F.col("q_emb"), F.col("c_emb")).alias("c_cos"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("c_cos").desc(), F.col("centroid_id").asc()
    )
    probes = (
        qc.withColumn("rnk", F.row_number().over(wq))
        .filter(F.col("rnk") <= n_probe)
        .select("query_id", "q_emb", "centroid_id")
    )
    bucket = assign.join(
        embeddings.select(
            F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("n_emb")
        ),
        on=[assign.vec_id == F.col("neighbor_id")],
    ).select("centroid_id", "neighbor_id", "n_emb")
    scored = (
        probes.join(bucket, on="centroid_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_col(F.col("q_emb"), F.col("n_emb")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def embedding_prep(embeddings: DataFrame) -> DataFrame:
    """Embedding preparation for ANN serving: L2 norm, the normalized
    vector's first component (spot-checkable), and int8 scalar
    quantization stats (scale = max |x| / 127, quantized first
    component) — the standard storage-shrink path before index build.
    All double-precision, rounded for cross-engine stability."""
    emb = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    norm = F.sqrt(
        F.aggregate(F.transform(emb, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    amax = F.array_max(F.transform(emb, lambda x: F.abs(x)))
    scale = amax / F.lit(127.0)
    return embeddings.select(
        "vec_id",
        F.round(norm, 6).alias("l2_norm"),
        F.round(F.element_at(emb, 1) / norm, 6).alias("unit_c0"),
        F.round(scale, 6).alias("q_scale"),
        F.round(F.element_at(emb, 1) / scale).cast("int").alias("q_c0"),
    )


def embedding_prep_sql() -> str:
    return """WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
),
s AS (
  SELECT vec_id, emb,
         sqrt(list_sum(list_transform(emb, x -> x * x))) AS norm,
         list_max(list_transform(emb, x -> abs(x))) / 127.0 AS scale
  FROM e
)
SELECT vec_id,
       round(norm, 6) AS l2_norm,
       round(emb[1] / norm, 6) AS unit_c0,
       round(scale, 6) AS q_scale,
       CAST(round(emb[1] / scale) AS INT) AS q_c0
FROM s"""


def knn_ivf_recall(
    embeddings: DataFrame,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    n_centroids: int = N_CENTROIDS,
    n_probe: int = N_PROBE,
) -> DataFrame:
    """ANN quality evaluation: per-query recall@k of the IVF index
    against the exact brute-force top-k — the metric that decides
    whether n_probe/n_centroids are adequate before scaling out."""
    return _recall_vs_exact(
        embeddings, knn_ivf(embeddings, n_queries, k, n_centroids, n_probe),
        n_queries, k,
    )


def _recall_vs_exact(
    embeddings: DataFrame, approx: DataFrame, n_queries: int, k: int
) -> DataFrame:
    """Per-query recall@k of any approximate top-k (query_id,
    neighbor_id, ...) against the exact brute-force top-k — the one
    hit-join shared by every `*_recall` wrapper in this module."""
    exact = knn_bruteforce(embeddings, n_queries, k).select(
        "query_id", "neighbor_id"
    )
    a = approx.select(
        "query_id", F.col("neighbor_id").alias("approx_neighbor_id")
    )
    hits = exact.join(
        a,
        on=[
            exact.query_id == a.query_id,
            exact.neighbor_id == a.approx_neighbor_id,
        ],
        how="left",
    ).select(
        exact.query_id, F.col("approx_neighbor_id").isNotNull().alias("hit")
    )
    return (
        hits.groupBy("query_id")
        .agg(
            F.round(F.sum(F.col("hit").cast("int")) / F.count("*"), 6).alias(
                "recall_at_k"
            )
        )
        .orderBy("query_id")
    )


def _recall_sql(approx_sql: str, n_queries: int, k: int) -> str:
    """Oracle twin of ``_recall_vs_exact`` for approx queries whose SQL
    is a self-contained WITH chain ending in a ``ranked`` CTE: inline
    the chain's prefix, bound it at rank <= k, and hit-join against the
    brute-force exact top-k."""
    exact = knn_bruteforce_sql(n_queries, k)
    assert approx_sql.startswith("WITH ")
    # guard the string surgery (round-6 advisor): the splice assumes the
    # chain defines a `ranked` CTE and ends in a top-level
    # `SELECT query_id ...` — a future *_sql variant breaking either
    # convention must fail HERE, not produce a mis-spliced oracle
    assert "ranked AS" in approx_sql, "approx chain must define a 'ranked' CTE"
    prefix = approx_sql[5:].rsplit("SELECT query_id", 1)[0].rstrip()
    assert prefix != approx_sql[5:].rstrip(), (
        "approx chain must end in a top-level 'SELECT query_id' to splice"
    )
    assert prefix.endswith(")"), (
        "splice must cut exactly at the end of the CTE chain; got a "
        f"prefix ending {prefix[-40:]!r}"
    )
    return f"""WITH {prefix},
approx_knn AS MATERIALIZED (
  SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {k}
),
exact_knn AS MATERIALIZED (
{exact}
)
SELECT e.query_id,
       round(SUM(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) / COUNT(*), 6)
         AS recall_at_k
FROM exact_knn e
LEFT JOIN approx_knn i
  ON e.query_id = i.query_id AND e.neighbor_id = i.neighbor_id
GROUP BY e.query_id
ORDER BY e.query_id"""


def knn_ivf_recall_sql(
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    n_centroids: int = N_CENTROIDS,
    n_probe: int = N_PROBE,
) -> str:
    exact = knn_bruteforce_sql(n_queries, k)
    approx = knn_ivf_sql(n_queries, k, n_centroids, n_probe)
    return f"""WITH exact_knn AS MATERIALIZED (
{exact}
),
ivf_knn AS MATERIALIZED (
{approx}
)
SELECT e.query_id,
       round(SUM(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) / COUNT(*), 6)
         AS recall_at_k
FROM exact_knn e
LEFT JOIN ivf_knn i
  ON e.query_id = i.query_id AND e.neighbor_id = i.neighbor_id
GROUP BY e.query_id
ORDER BY e.query_id"""


def knn_ivf_sql(
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    n_centroids: int = N_CENTROIDS,
    n_probe: int = N_PROBE,
) -> str:
    cos_vc = COSINE_SQL.format(a="v.embedding", b="c.embedding")
    cos_qc = COSINE_SQL.format(a="q.embedding", b="c.embedding")
    cos_qn = COSINE_SQL.format(a="q.embedding", b="n.embedding")
    return f"""WITH assign AS MATERIALIZED (
  SELECT vec_id, centroid_id FROM (
    SELECT v.vec_id, c.vec_id AS centroid_id,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {cos_vc} DESC, c.vec_id ASC) AS rnk
    FROM embeddings v, embeddings c WHERE c.vec_id < {n_centroids}
  ) WHERE rnk = 1
),
probes AS (
  SELECT query_id, centroid_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS centroid_id,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY {cos_qc} DESC, c.vec_id ASC) AS rnk
    FROM embeddings q, embeddings c
    WHERE q.vec_id < {n_queries} AND c.vec_id < {n_centroids}
  ) WHERE rnk <= {n_probe}
),
scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id, {cos_qn} AS cosine
  FROM probes p
  JOIN assign a ON a.centroid_id = p.centroid_id
  JOIN embeddings q ON q.vec_id = p.query_id
  JOIN embeddings n ON n.vec_id = a.vec_id
  WHERE p.query_id <> a.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {k}"""


# ------------------------------------------- IVF-bucketed embedding dedup

N_DEDUP_CENTROIDS = 8
N_DEDUP_ASSIGN = 4
# The genuine near-dup regime threshold (small angles, ≈31° or less):
# at or above this, qualifying pairs rank centroids near-identically, so
# the index scales its centroid count with the data (the ≥0.8 branch in
# embedding_dedup_pairs_ivf) and Σ bucket² stays linear in n.  This is
# the regime a 100 TB dedup pass actually runs in — registered as
# ``dedup_embedding_ivf_neardup``; the low-threshold variant stays as
# the completeness stress test.
NEARDUP_COSINE_THRESHOLD = 0.85

# The test corpus's seeded duplicates top out at pair cosine ≈0.51 —
# below any honest near-dup threshold — so the registered neardup query
# runs over the corpus AUGMENTED with one deterministically-jittered
# twin per vector (component i scaled by 1 + ((i mod 7) - 3)/100, twin
# ids offset): the twins are ≈0.999-cosine near-dups the scaled-centroid
# plan must find, making the brute-force oracle check exercise pair
# completeness instead of vacuously matching on zero rows.
NEARDUP_TWIN_OFFSET = 1_000_000


def augmented_neardup_embeddings(embeddings: DataFrame) -> DataFrame:
    """The embeddings table unioned with its jittered twins (see
    NEARDUP_TWIN_OFFSET).  The jitter is computed in double and rounded
    back to float, so Spark and the SQL oracle derive bit-identical twin
    vectors."""
    twin = embeddings.select(
        (F.col("vec_id") + F.lit(NEARDUP_TWIN_OFFSET)).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: (
                x.cast("double")
                * (F.lit(1.0) + ((i % 7) - 3).cast("double") / F.lit(100.0))
            ).cast("float"),
        ).alias("embedding"),
    )
    return embeddings.select("vec_id", "embedding").unionByName(twin)


AUGMENTED_NEARDUP_SQL = f"""SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + {NEARDUP_TWIN_OFFSET} AS vec_id,
         list_transform(range(1, len(embedding) + 1),
           i -> CAST(CAST(embedding[i] AS DOUBLE)
                     * (1.0 + CAST((i - 1) % 7 - 3 AS DOUBLE) / 100.0)
                     AS FLOAT)) AS embedding
  FROM embeddings"""


def neardup_pairs_sql(threshold: float = NEARDUP_COSINE_THRESHOLD) -> str:
    """Brute-force all-pairs oracle over the augmented corpus — the
    exact pair set the bucketed scaled-centroid plan must reproduce."""
    cos = COSINE_SQL.format(a="a.embedding", b="b.embedding")
    return f"""WITH aug AS MATERIALIZED (
{AUGMENTED_NEARDUP_SQL}
)
SELECT a.vec_id AS a_id, b.vec_id AS b_id, {cos} AS cosine
FROM aug a, aug b
WHERE a.vec_id < b.vec_id AND {cos} >= {threshold}"""
# vectors per centroid the index aims for: n_centroids = n / this, so
# Σ bucket² stays ~n × (VECTORS_PER_CENTROID × n_assign) instead of
# degenerating to all-pairs when n outgrows a fixed centroid count
# (measured at sf0.1/n=2000 with the old fixed 8 centroids: two random
# vectors shared a bucket with ~87% probability — brute force with
# extra steps)
VECTORS_PER_CENTROID = 64


def embedding_dedup_pairs_ivf(
    embeddings: DataFrame,
    threshold: float | None = None,
    n_centroids: int | None = None,
    n_assign: int = N_DEDUP_ASSIGN,
) -> DataFrame:
    """Embedding near-dup pairs via IVF multi-assignment buckets — the
    bucketed default replacing the all-pairs ``crossJoin`` of
    ``dedup.embedding_cosine_pairs`` (kept as the oracle side only).

    Plan shape: every vector lands in its ``n_assign`` nearest of
    ``n_centroids`` centroid buckets (broadcast centroid table, one
    scan); candidate pairs are the per-bucket self-join (equi-join on
    centroid_id, each unordered pair once via a_id < b_id, deduped
    across buckets); candidates are rescored with the exact cosine and
    filtered at the threshold.  No crossJoin touches the full table —
    work is bounded by Σ bucket², the standard IVF trade.  At 100 TB:
    n_centroids scales with n (n/≈10k keeps buckets rescore-sized),
    posting lists go bucketed-by-centroid on disk, and the rescore
    join stays an equi-join AQE can skew-split.

    Exactness: reported pairs are exact (rescored); completeness holds
    when qualifying pairs share ≥1 centroid — overlapping
    multi-assignment makes misses vanishingly rare and MEASURED zero
    against the brute-force oracle on the seeded test data at both
    sf0.001 (66/66 pairs) and sf0.01 (59/59), which is why this query's
    oracle is the brute-force SQL itself."""
    from rdfind_spark.functions.dedup import COSINE_DUP_THRESHOLD

    if threshold is None:
        threshold = COSINE_DUP_THRESHOLD
    if n_centroids is None:
        if threshold >= 0.8:
            # genuine near-dup regime (small angles): qualifying pairs
            # rank centroids near-identically, so the index can scale
            # with the data — buckets of ~VECTORS_PER_CENTROID keep
            # Σ bucket² ≈ n × (VECTORS_PER_CENTROID × n_assign)
            n_centroids = max(
                N_DEDUP_CENTROIDS, embeddings.count() // VECTORS_PER_CENTROID
            )
        else:
            # weak-similarity regime (the test threshold 0.4 admits
            # pairs up to ~66° apart): no bucketing is complete below
            # ~cos 0.8 without near-total bucket overlap, so the
            # candidate set necessarily approaches all pairs — keep the
            # small fixed index whose multi-assignment coverage is
            # MEASURED exact vs brute force at sf0.001/0.01/0.1
            # (920/920 at sf0.1).  An exact sub-quadratic cosine join
            # at arbitrary thresholds over dense vectors does not
            # exist; at scale a real pipeline raises the threshold.
            n_centroids = N_DEDUP_CENTROIDS
    assign = ivf_assignments(embeddings, n_centroids, n_assign)
    # Candidate mining per bucket runs as an Arrow-batched grouped
    # pandas UDF doing ONE BLAS matmul (Xn · Xnᵀ) instead of Σ bucket²
    # codegen rows each paying a 64-element aggregate — measured ~4x on
    # the sf0.1 rescore (25M candidate pairs → 1.6e9 scalar mults moved
    # into vectorized dgemm).  BLAS float sums differ from the oracle's
    # sequential sums in the last ULPs, so the UDF mines with a small
    # threshold MARGIN and the final cosine is re-computed with the
    # exact sequential expression tree below — output stays bit-exact.
    margin = 1e-4

    def _bucket_pairs(pdf):
        import numpy as np
        import pandas as pd

        X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        ids = pdf["vec_id"].to_numpy()
        norms = np.sqrt((X * X).sum(axis=1))
        norms[norms == 0.0] = 1.0
        Xn = X / norms[:, None]
        out_a, out_b = [], []
        block = 4096
        for i0 in range(0, len(ids), block):
            S = Xn[i0 : i0 + block] @ Xn.T
            ii, jj = np.nonzero(S >= threshold - margin)
            gi = ii + i0
            keep = ids[gi] < ids[jj]
            out_a.append(ids[gi][keep])
            out_b.append(ids[jj][keep])
        if out_a:
            a = np.concatenate(out_a)
            b = np.concatenate(out_b)
        else:  # pragma: no cover - empty bucket
            a = b = np.array([], dtype=np.int64)
        return pd.DataFrame({"a_id": a, "b_id": b})

    bucketed = assign.join(
        embeddings.select("vec_id", "embedding"), on="vec_id"
    ).select("centroid_id", "vec_id", "embedding")
    cand = (
        bucketed.groupBy("centroid_id")
        .applyInPandas(_bucket_pairs, schema="a_id long, b_id long")
        .distinct()
    )
    # Rescore with the norms PRE-computed per vector: the per-pair work
    # is then one 64-dim dot product instead of three array aggregates
    # (dot + both norms) — same double-precision expression tree as the
    # oracle's sqrt(Σx²)·sqrt(Σy²) denominator, just evaluated once per
    # vector instead of once per pair.
    emb_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    norm = F.sqrt(
        F.aggregate(
            F.transform(emb_d, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
        )
    )
    ea = embeddings.select(
        F.col("vec_id").alias("a_id"),
        emb_d.alias("a_emb"),
        norm.alias("a_norm"),
    )
    eb = embeddings.select(
        F.col("vec_id").alias("b_id"),
        emb_d.alias("b_emb"),
        norm.alias("b_norm"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("a_emb"), F.col("b_emb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        cand.join(ea, on="a_id")
        .join(eb, on="b_id")
        .select(
            "a_id",
            "b_id",
            F.round(dot / (F.col("a_norm") * F.col("b_norm")), 6).alias(
                "cosine"
            ),
        )
        .filter(F.col("cosine") >= threshold)
    )


# ----------------------------------------------------- LSH-bucketed ANN

N_HYPERPLANES = 16
LSH_BAND_BITS = 4  # 16 bits -> 4 bands of 4


def lsh_band_signatures(
    embeddings: DataFrame, n_planes: int = N_HYPERPLANES
) -> DataFrame:
    """Random-hyperplane LSH band signatures: bit i = sign(v · h_i),
    packed into ``n_planes / LSH_BAND_BITS`` band values.  Hyperplanes
    are the first ``n_planes`` vectors (deterministic, like the IVF
    centroid choice), so Spark and the SQL oracle derive the identical
    index.  Cosine sign equals dot sign, so the existing cosine kernel
    doubles as the projection."""
    planes = embeddings.filter(F.col("vec_id") < n_planes).select(
        F.col("vec_id").alias("plane_id"), F.col("embedding").alias("p_emb")
    )
    bits = embeddings.crossJoin(F.broadcast(planes)).select(
        "vec_id",
        "plane_id",
        F.when(cosine_col(F.col("embedding"), F.col("p_emb")) >= 0, 1)
        .otherwise(0)
        .alias("bit"),
    )
    return (
        bits.groupBy(
            "vec_id",
            F.floor(F.col("plane_id") / LSH_BAND_BITS).alias("band"),
        )
        .agg(
            F.sum(
                F.expr(f"shiftleft(bit, CAST(plane_id % {LSH_BAND_BITS} AS INT))")
            ).alias("band_val")
        )
    )


def knn_lsh(
    embeddings: DataFrame,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    n_planes: int = N_HYPERPLANES,
) -> DataFrame:
    """LSH-bucketed approximate k-NN: candidates are vectors sharing at
    least one signature band with the query (banded buckets make near
    neighbors collide with high probability); candidates are then
    scored exactly and ranked.  The scan cost is the buckets' share of
    the data, like a MinHash-LSH dedup pass — the equi-join on
    (band, band_val) is Catalyst-native and skew is bounded by bucket
    size."""
    sigs = lsh_band_signatures(embeddings, n_planes)
    q_sigs = sigs.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), "band", "band_val"
    )
    cand = (
        q_sigs.join(
            sigs.select(F.col("vec_id").alias("neighbor_id"), "band", "band_val"),
            on=["band", "band_val"],
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    # broadcast the QUERY-SET projection, not the corpus: cand.query_id
    # is already < n_queries by construction, so the filter changes
    # nothing semantically but bounds the broadcast relation to
    # n_queries rows (the corpus-sized form is the forced-broadcast
    # hazard the round-8/9 fixes removed from semantic_dedup and
    # value_anomalies; plan-pinned in test_plans.py)
    q = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    n = embeddings.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("n_emb")
    )
    scored = cand.join(F.broadcast(q), on="query_id").join(n, on="neighbor_id").select(
        "query_id",
        "neighbor_id",
        cosine_col(F.col("q_emb"), F.col("n_emb")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def knn_lsh_sql(
    n_queries: int = N_QUERIES, k: int = TOP_K, n_planes: int = N_HYPERPLANES
) -> str:
    cos_vp = COSINE_SQL.format(a="v.embedding", b="p.embedding")
    cos_qn = COSINE_SQL.format(a="q.embedding", b="n.embedding")
    return f"""WITH sigs AS MATERIALIZED (
  SELECT vec_id, plane_id // {LSH_BAND_BITS} AS band,
         SUM(bit << (CAST(plane_id AS INT) % {LSH_BAND_BITS})) AS band_val
  FROM (
    SELECT v.vec_id, p.vec_id AS plane_id,
           CASE WHEN {cos_vp} >= 0 THEN 1 ELSE 0 END AS bit
    FROM embeddings v, embeddings p WHERE p.vec_id < {n_planes}
  ) GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT qs.vec_id AS query_id, ns.vec_id AS neighbor_id
  FROM sigs qs
  JOIN sigs ns ON qs.band = ns.band AND qs.band_val = ns.band_val
  WHERE qs.vec_id < {n_queries} AND qs.vec_id <> ns.vec_id
),
scored AS (
  SELECT c.query_id, c.neighbor_id, {cos_qn} AS cosine
  FROM cand c
  JOIN embeddings q ON q.vec_id = c.query_id
  JOIN embeddings n ON n.vec_id = c.neighbor_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {k}"""


# --------------------------------------------------------- SemDeDup


SEMANTIC_DUP_THRESHOLD = 0.35


def semantic_dedup(
    embeddings: DataFrame,
    n_centroids: int = N_CENTROIDS,
    threshold: float = SEMANTIC_DUP_THRESHOLD,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space, then inside each
    cluster drop members too close to the cluster representative.

    Here: assign every vector to its nearest centroid (deterministic
    seeded centroids, see ``ivf_assignments``), pick the lowest-id
    member as the cluster representative, and mark members whose cosine
    to the representative ≥ threshold as duplicates.

    Scale shape: centroid assignment is one broadcast join + scan (the
    IVF index build); the representative table is cluster-count-sized
    (broadcast); the member→representative cosine is a single equi-join
    on centroid_id — linear in the corpus, never pairwise.  Contrast
    with pairwise near-dup (``embedding_dedup_pairs_ivf``): SemDeDup
    trades pair completeness for a one-pass linear plan, which is why
    it is the preferred first pass at the 100 TB tier."""
    assign = ivf_assignments(embeddings, n_centroids, 1)
    reps = assign.groupBy("centroid_id").agg(F.min("vec_id").alias("rep_id"))
    emb = embeddings.select("vec_id", "embedding")
    # Reduce the representative-embedding relation to the genuinely
    # cluster-count-sized set BEFORE broadcasting: a left-semi join
    # against the rep ids keeps ~n_centroids rows.  Broadcasting the
    # raw embeddings projection here would ship the whole corpus to
    # every executor — invisible at sf0.1, an OOM at 100 TB.
    rep_emb = embeddings.select(
        F.col("vec_id").alias("rep_id"), F.col("embedding").alias("r_emb")
    ).join(reps.select("rep_id"), on="rep_id", how="left_semi")
    joined = (
        assign.join(F.broadcast(reps), on="centroid_id")
        .join(emb, on="vec_id")
        .join(F.broadcast(rep_emb), on="rep_id")
    )
    cos = cosine_col(F.col("embedding"), F.col("r_emb"))
    return joined.select(
        "vec_id",
        "centroid_id",
        "rep_id",
        cos.alias("rep_cosine"),
        (
            (F.col("vec_id") != F.col("rep_id")) & (cos >= F.lit(threshold))
        ).alias("is_dup"),
    )


def semantic_dedup_sql(
    n_centroids: int = N_CENTROIDS,
    threshold: float = SEMANTIC_DUP_THRESHOLD,
) -> str:
    cos = COSINE_SQL.format(a="m.embedding", b="r.embedding")
    return f"""WITH assign AS MATERIALIZED (
{ivf_assignments_sql(n_centroids)}
),
reps AS (SELECT centroid_id, MIN(vec_id) AS rep_id FROM assign GROUP BY centroid_id)
SELECT a.vec_id, a.centroid_id, reps.rep_id,
       {cos} AS rep_cosine,
       a.vec_id <> reps.rep_id AND {cos} >= {threshold} AS is_dup
FROM assign a
JOIN reps ON a.centroid_id = reps.centroid_id
JOIN embeddings m ON m.vec_id = a.vec_id
JOIN embeddings r ON r.vec_id = reps.rep_id"""


# ------------------------------------------------- k-means (IVF train)


KMEANS_K = 8
KMEANS_ITERS = 2  # Lloyd centroid-update rounds
KM_SCALE = 1_000_000  # fixed-point units per embedding component


def _quantized(col: F.Column | str):
    """Embedding → integer fixed-point vector: floor(x·SCALE) per
    component.  floor (not round) because floor is bit-identical across
    engines for every double; all subsequent sums/divisions are integer
    and therefore order-independent and exact."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(
        c, lambda x: F.floor(x.cast("double") * KM_SCALE).cast("long")
    )


def _valid_quantized(embeddings: DataFrame, dim: int | None = None) -> DataFrame:
    """(vec_id, q=quantized integer vector) over the WELL-FORMED rows
    only (exactly ``dim`` non-null components; default = the declared
    embeddings-table dimension) — the shared training input of every
    kmeans-derived operator.  The per-dimension Lloyd sums and the PQ
    sub-slicing both index positions 1..dim, so a malformed row would
    crash the loop mid-aggregate (ArrayIndexOutOfBounds — measured);
    filtering here makes every trained variant share one coarse stage
    unconditionally (the oracle chain ``_km_cte_chain`` applies the
    identical predicate).  A no-op on the sf tables, whose rows are all
    well-formed."""
    if dim is None:
        dim = RP_IN_DIM  # defined below; resolved lazily on purpose
    return embeddings.filter(
        (F.size("embedding") == dim)
        & ~F.exists("embedding", lambda x: x.isNull())
    ).select("vec_id", _quantized("embedding").alias("q"))


def _km_cosine(qcol, cvec: list, nc: int):
    """Cosine of an integer vector column against an integer literal
    centroid: exact BIGINT dot/norms, ONE double division — the same
    expression tree the oracle uses, so assignments are bit-identical."""
    lit_c = F.array(*[F.lit(int(v)) for v in cvec])
    dot = F.aggregate(
        F.zip_with(qcol, lit_c, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    nq = F.aggregate(
        F.transform(qcol, lambda x: x * x),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return dot.cast("double") / (
        F.sqrt(nq.cast("double")) * F.sqrt(F.lit(float(nc)))
    )


def embedding_kmeans(
    embeddings: DataFrame,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    dim: int | None = None,
) -> DataFrame:
    """Lloyd k-means over the embeddings — the real IVF index training
    step (``ivf_assignments`` seeds centroids but never refines them).

    Determinism discipline (the PageRank trick, functions/graph.py,
    applied to vectors): components are quantized to integer fixed-
    point, every centroid update is an exact integer Σ//n per
    dimension, and assignment cosines are one double expression over
    identical integers — so Spark and the DuckDB oracle run the
    IDENTICAL recurrence with zero float-drift exposure, iteration
    after iteration.

    Plan shape per round: one scan with a broadcast K-centroid argmax
    (map-side, no shuffle), one groupBy(centroid) with per-dimension
    integer sums (partial agg → K rows), and a model-sized (K × dim)
    collect to rebuild the centroid literals — the standard scalable
    k-means loop; nothing data-sized ever reaches the driver.  Clusters
    that lose all members drop out (both engines derive the centroid
    set from the same assignment table).

    Output: final assignment (vec_id, centroid_id, cosine).  ``dim``
    is the declared embedding width — rows of any other width are
    malformed and filtered (pass the actual width for non-standard
    tables; validity must be declared, not inferred, to keep the plan
    scan-free and the oracle predicate literal)."""
    q = _valid_quantized(embeddings, dim)
    q = materialize(q)  # quantize once, reuse per round
    cents = _train_centroids(q, k, iters)
    return _km_argmax(q, cents).select(
        "vec_id", "centroid_id", F.round("cosine", 6).alias("cosine")
    )


def _km_norm2(cvec: list) -> int:
    return sum(v * v for v in cvec)


def _km_argmax(frame: DataFrame, cents: list) -> DataFrame:
    """Nearest-centroid assignment against driver-side integer centroid
    literals: array_min of struct(-cos, cid) — smallest negated cosine =
    largest cosine, ties broken by smallest centroid id.  Map-side only
    (broadcast-by-literal), no shuffle."""
    scored = F.array_min(
        F.array(
            *[
                F.struct(
                    (-_km_cosine(F.col("q"), cvec, _km_norm2(cvec))).alias("neg"),
                    F.lit(cid).alias("cid"),
                )
                for cid, cvec in cents
            ]
        )
    )
    return frame.select(
        "vec_id",
        "q",
        scored["cid"].alias("centroid_id"),
        (-scored["neg"]).alias("cosine"),
    )


def _sqdist(qcol, cvec: list):
    """Exact BIGINT squared L2 of an integer vector column against an
    integer literal centroid — overflow-safe at KM_SCALE quantization
    ((2·10⁶)² × 64 dims ≈ 2.6e14 ≪ 2⁶³)."""
    lit_c = F.array(*[F.lit(int(v)) for v in cvec])
    return F.aggregate(
        F.zip_with(qcol, lit_c, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def spread_seeds(q: DataFrame, k: int, sample_mod: int = 1) -> list:
    """Deterministic farthest-point (k-center greedy) seeding — the
    spread init the skewed-corpus study identified as the next lever
    (README: from a concentrated first-N init, Lloyd converges to a
    local optimum far below a blob-aligned bucketing).  Start from the
    smallest vec_id, then k-1 times take the point maximizing the exact
    integer squared distance to its nearest chosen seed (ties broken by
    smallest vec_id) — every step is a one-row argmax over a scan with
    literal centroids, so the result is deterministic and, when oracle
    parity is ever needed, reproducible as chained ORDER BY/LIMIT 1
    CTEs.  k-1 scans of the candidate table: at real scale pass
    ``sample_mod`` to greedy-seed over the deterministic hash-sample
    ``vec_id % sample_mod == 0`` instead of the full corpus (the
    k-means|| move: seed quality needs coverage, not the full point
    set).  Returns [(vec_id, [int components...])]."""
    cand = q if sample_mod <= 1 else q.filter(F.col("vec_id") % sample_mod == 0)
    cand = materialize(cand.select("vec_id", "q"))
    try:
        head = cand.orderBy("vec_id").limit(1).collect()
        if not head:
            raise ValueError(
                f"spread_seeds: no candidate rows (sample_mod={sample_mod} "
                "filtered everything)"
            )
        seeds = [(int(head[0]["vec_id"]), [int(v) for v in head[0]["q"]])]
        for _ in range(k - 1):
            d = F.least(*[_sqdist(F.col("q"), c) for _, c in seeds]) if len(
                seeds
            ) > 1 else _sqdist(F.col("q"), seeds[0][1])
            r = (
                cand.select("vec_id", "q", d.alias("d"))
                .orderBy(F.desc("d"), F.asc("vec_id"))
                .limit(1)
                .collect()[0]
            )
            if int(r["d"]) == 0:
                # every remaining point coincides with a chosen seed — a
                # duplicate seed would become a duplicate centroid id
                # downstream, so fail loudly instead
                raise ValueError(
                    f"spread_seeds: only {len(seeds)} distinct points "
                    f"available for k={k} seeds"
                )
            seeds.append((int(r["vec_id"]), [int(v) for v in r["q"]]))
        return sorted(seeds)
    finally:
        # the seed list is fully driver-side by now; don't leak one
        # candidate table's blocks per invocation (util.release, not
        # .unpersist() — the latter is a no-op on checkpoint-backed
        # frames)
        release(cand)


def _train_centroids(
    q: DataFrame, k: int, iters: int, seeds: list | None = None
) -> list:
    """The deterministic integer Lloyd loop from ``embedding_kmeans``,
    reusable as the training step for trained-centroid IVF variants.
    ``q`` holds (vec_id, q=quantized integer vector); returns the final
    centroid list [(cid, [int components...])], model-sized — the only
    thing that ever reaches the driver.  ``seeds`` overrides the
    default first-k-by-id init (e.g. ``spread_seeds``) and must hold
    exactly ``k`` entries — fewer would silently train a smaller model
    than the caller labeled (measured risk in the pq_recall_grid
    capacity study); the REGISTERED queries always use the default,
    whose recurrence the DuckDB oracles mirror seed for seed."""
    if seeds is not None and len(seeds) != k:
        raise ValueError(f"seeds holds {len(seeds)} entries, expected k={k}")
    dim = len(q.select("q").first()["q"])
    cents = (
        sorted(seeds)
        if seeds is not None
        else sorted(
            (int(r["vec_id"]), [int(v) for v in r["q"]])
            for r in q.filter(F.col("vec_id") < k).collect()
        )
    )

    def _tdiv(s: int, n: int) -> int:
        # truncation-toward-zero, matching DuckDB's BIGINT `//` and
        # Spark's `div` (Python's // floors, which differs for
        # negative sums)
        return abs(s) // n * (1 if s >= 0 else -1)

    for _ in range(iters):
        sums = (
            _km_argmax(q, cents)
            .groupBy("centroid_id")
            .agg(
                F.count("*").alias("n"),
                *[
                    F.sum(F.element_at("q", j + 1)).alias(f"s{j}")
                    for j in range(dim)
                ],
            )
            .collect()
        )
        cents = sorted(
            (
                int(r["centroid_id"]),
                [_tdiv(int(r[f"s{j}"]), int(r["n"])) for j in range(dim)],
            )
            for r in sums
        )
    return cents


# the integer-exact cosine of a quantized vector v.q against a centroid
# c.cvec — same expression tree Spark's _km_cosine builds
_KM_DOT_SQL = (
    "list_sum(list_transform(range(1, len(v.q) + 1), "
    "i -> v.q[i] * c.cvec[i]))"
)
_KM_COS_SQL = (
    f"CAST({_KM_DOT_SQL} AS DOUBLE) / "
    "(sqrt(CAST(list_sum(list_transform(v.q, x -> x * x)) AS DOUBLE)) * "
    "sqrt(CAST(list_sum(list_transform(c.cvec, x -> x * x)) AS DOUBLE)))"
)


def _km_assign_cte(name: str, cent: str, src: str = "q") -> str:
    return f"""{name} AS (
  SELECT vec_id, q, cid, cosine FROM (
    SELECT v.vec_id, v.q, c.cid, {_KM_COS_SQL} AS cosine,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {_KM_COS_SQL} DESC, c.cid ASC) AS rn
    FROM {src} v CROSS JOIN {cent} c
  ) WHERE rn = 1
)"""


def _km_update_cte(name: str, assign: str) -> str:
    return f"""{name} AS (
  SELECT cid, list(s ORDER BY j) AS cvec FROM (
    SELECT cid, j, SUM(q[j]) // COUNT(*) AS s
    FROM (SELECT cid, q, unnest(generate_series(1, len(q))) AS j FROM {assign})
    GROUP BY cid, j
  ) GROUP BY cid
)"""


def _km_cte_chain(k: int, iters: int) -> str:
    """``WITH q, c0, a0, c1 … c{iters}`` — the shared training prefix of
    every kmeans-derived oracle (final centroids live in ``c{iters}``)."""
    parts = [
        f"""WITH q AS (
  SELECT vec_id, list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * {KM_SCALE}) AS BIGINT)) AS q
  FROM embeddings
  WHERE len(embedding) = {RP_IN_DIM}
    AND len(list_filter(embedding, x -> x IS NULL)) = 0
),
c0 AS (SELECT vec_id AS cid, q AS cvec FROM q WHERE vec_id < {k})"""
    ]
    for i in range(iters):
        parts.append(", " + _km_assign_cte(f"a{i}", f"c{i}"))
        parts.append(", " + _km_update_cte(f"c{i + 1}", f"a{i}"))
    return "".join(parts)


def embedding_kmeans_sql(k: int = KMEANS_K, iters: int = KMEANS_ITERS) -> str:
    """The identical integer recurrence as chained CTEs (assignment →
    per-dimension integer centroid update, ``iters`` times, then the
    final assignment)."""
    return (
        _km_cte_chain(k, iters)
        + ", "
        + _km_assign_cte("afinal", f"c{iters}")
        + """
SELECT vec_id, cid AS centroid_id, round(cosine, 6) AS cosine FROM afinal"""
    )


def _trained_probes(
    q: DataFrame, cents: list, n_queries: int, n_probe: int
) -> DataFrame:
    """Top-n_probe trained centroids per query by the exact integer
    cosine: array_sort of struct(-cos, cid) → slice(1..n_probe)
    (lexicographic sort = cosine desc, centroid id asc — the
    ``_km_argmax`` tie-break).  Map-side literal-centroid work only, no
    shuffle; shared by ``knn_ivf_trained`` and ``knn_ivf_pq_trained``
    so their coarse probe selection can never drift apart."""
    probe_arr = F.array_sort(
        F.array(
            *[
                F.struct(
                    (-_km_cosine(F.col("q"), cvec, _km_norm2(cvec))).alias(
                        "neg"
                    ),
                    F.lit(cid).alias("cid"),
                )
                for cid, cvec in cents
            ]
        )
    )
    return (
        q.filter(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("query_id"),
            F.explode(F.slice(probe_arr, 1, n_probe)).alias("p"),
        )
        .select("query_id", F.col("p.cid").alias("centroid_id"))
    )


def knn_ivf_trained(
    embeddings: DataFrame,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    n_centroids: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    n_probe: int = N_PROBE,
) -> DataFrame:
    """IVF approximate k-NN over TRAINED centroids: the deterministic
    integer Lloyd loop (``_train_centroids``) replaces the
    first-N-by-id seeding of ``knn_ivf``.  First-N centroids are
    deterministic-for-oracle but track the id order, not the data
    distribution — on a skewed real corpus one seed centroid can own
    most of the index (a melted probe bucket) while others sit empty.
    Trained centroids equalize bucket occupancy, which is what bounds
    per-probe scan cost at 100 TB.

    Plan shape: training is model-sized collects only; assignment and
    probe selection are map-side literal-centroid argmax (no shuffle);
    the probe join is (queries × n_probe) ⋈ bucket members; final
    scoring re-ranks exactly with the double cosine.

    Measured at sf0.01 (500 vectors, k=8, probe=2, 2 Lloyd rounds; see
    ``knn_ivf_trained_recall`` / ``knn_ivf_recall``): mean recall@10
    trained 0.92 vs seeded 0.94, bucket max/mean 1.14 vs 1.12, min
    bucket 53 vs 48 — a tie, because the synthetic embeddings are
    UNIFORM so first-N seeding is already a random (= good) sample.
    The skewed regime was measured in round 7
    (``scripts/pq_recall_grid.py --skewed``, README "skewed-corpus
    claim"): on an id-sorted blob corpus with a query workload
    decoupled from the seed prefix, seeded recall@10 melts to 0.40
    (non-seed blobs scatter across the blob-0 centroids by noise)
    while trained reaches 0.45 at these 2 Lloyd rounds and 0.53 at
    convergence — training wins where id order correlates with
    content, with the measured caveat that Lloyd's own first-N init
    bounds the gain (a spread init is the next lever at scale, not
    more rounds)."""
    q = materialize(_valid_quantized(embeddings))
    cents = _train_centroids(q, n_centroids, iters)
    assign = _km_argmax(q, cents).select("vec_id", "centroid_id")
    probes = _trained_probes(q, cents, n_queries, n_probe)
    qv = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    bucket = assign.join(
        embeddings.select(
            F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("n_emb")
        ),
        on=[assign.vec_id == F.col("neighbor_id")],
    ).select("centroid_id", "neighbor_id", "n_emb")
    scored = (
        probes.join(F.broadcast(qv), on="query_id")
        .join(bucket, on="centroid_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_col(F.col("q_emb"), F.col("n_emb")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def knn_ivf_trained_sql(
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    n_centroids: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    n_probe: int = N_PROBE,
) -> str:
    cos = COSINE_SQL.format(a="qe.embedding", b="ne.embedding")
    return (
        _km_cte_chain(n_centroids, iters)
        + ", "
        + _km_assign_cte("assign", f"c{iters}")
        + f""",
probes AS (
  SELECT vec_id AS query_id, cid AS centroid_id FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {_KM_COS_SQL} DESC, c.cid ASC) AS rn
    FROM q v CROSS JOIN c{iters} c WHERE v.vec_id < {n_queries}
  ) WHERE rn <= {n_probe}
),
scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id, {cos} AS cosine
  FROM probes p
  JOIN assign a ON a.cid = p.centroid_id AND a.vec_id <> p.query_id
  JOIN embeddings qe ON qe.vec_id = p.query_id
  JOIN embeddings ne ON ne.vec_id = a.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {k}"""
    )


def knn_ivf_trained_recall(
    embeddings: DataFrame,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    n_centroids: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    n_probe: int = N_PROBE,
) -> DataFrame:
    """Recall@k of the trained-centroid IVF against the exact
    brute-force top-k — the apples-to-apples companion of
    ``knn_ivf_recall`` (seeded centroids), documenting what training
    buys at the same n_probe."""
    return _recall_vs_exact(
        embeddings,
        knn_ivf_trained(embeddings, n_queries, k, n_centroids, iters, n_probe),
        n_queries,
        k,
    )


def knn_ivf_trained_recall_sql(
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    n_centroids: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    n_probe: int = N_PROBE,
) -> str:
    return _recall_sql(
        knn_ivf_trained_sql(n_queries, k, n_centroids, iters, n_probe),
        n_queries,
        k,
    )


# --------------------------------------------------- hard-negative mining


def knn_hard_negatives(
    embeddings: DataFrame,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    n_centroids: int = N_CENTROIDS,
    n_probe: int = N_PROBE,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    vector, the top-k most-similar vectors whose ``label`` DIFFERS from
    the query's — the high-similarity/wrong-class examples a
    dual-encoder needs as negatives.

    Same IVF probe plan as ``knn_ivf`` (broadcast centroids, bucket
    join restricted to the probed posting lists — scan cost is the
    probed buckets' share, not |vectors|); the label inequality rides
    the scored join as a pushed filter, so mining is no more expensive
    than plain ANN.  At 100 TB the posting lists are the bucketed
    layout of ``ivf_assignments`` and the per-bucket scoring is the
    same BLAS-batched Arrow path the IVF dedup uses."""
    assign = ivf_assignments(embeddings, n_centroids)
    cents = embeddings.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("c_emb")
    )
    q = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("q_label"),
    )
    qc = q.crossJoin(F.broadcast(cents)).select(
        "query_id",
        "q_emb",
        "q_label",
        "centroid_id",
        cosine_col(F.col("q_emb"), F.col("c_emb")).alias("c_cos"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("c_cos").desc(), F.col("centroid_id").asc()
    )
    probes = (
        qc.withColumn("rnk", F.row_number().over(wq))
        .filter(F.col("rnk") <= n_probe)
        .select("query_id", "q_emb", "q_label", "centroid_id")
    )
    bucket = assign.join(
        embeddings.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("n_emb"),
            F.col("label").alias("n_label"),
        ),
        on=[assign.vec_id == F.col("neighbor_id")],
    ).select("centroid_id", "neighbor_id", "n_emb", "n_label")
    scored = (
        probes.join(bucket, on="centroid_id")
        .filter(
            (F.col("query_id") != F.col("neighbor_id"))
            & (F.col("q_label") != F.col("n_label"))
        )
        .select(
            "query_id",
            F.col("q_label").alias("query_label"),
            "neighbor_id",
            F.col("n_label").alias("neighbor_label"),
            cosine_col(F.col("q_emb"), F.col("n_emb")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "query_label", "neighbor_id", "neighbor_label",
            "cosine", "rank",
        )
    )


def knn_hard_negatives_sql(
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    n_centroids: int = N_CENTROIDS,
    n_probe: int = N_PROBE,
) -> str:
    cos_vc = COSINE_SQL.format(a="v.embedding", b="c.embedding")
    cos_qc = COSINE_SQL.format(a="q.embedding", b="c.embedding")
    cos_qn = COSINE_SQL.format(a="q.embedding", b="n.embedding")
    return f"""WITH assign AS MATERIALIZED (
  SELECT vec_id, centroid_id FROM (
    SELECT v.vec_id, c.vec_id AS centroid_id,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {cos_vc} DESC, c.vec_id ASC) AS rnk
    FROM embeddings v, embeddings c WHERE c.vec_id < {n_centroids}
  ) WHERE rnk = 1
),
probes AS (
  SELECT query_id, centroid_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS centroid_id,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY {cos_qc} DESC, c.vec_id ASC) AS rnk
    FROM embeddings q, embeddings c
    WHERE q.vec_id < {n_queries} AND c.vec_id < {n_centroids}
  ) WHERE rnk <= {n_probe}
),
scored AS (
  SELECT p.query_id, q.label AS query_label,
         a.vec_id AS neighbor_id, n.label AS neighbor_label,
         {cos_qn} AS cosine
  FROM probes p
  JOIN assign a ON a.centroid_id = p.centroid_id
  JOIN embeddings q ON q.vec_id = p.query_id
  JOIN embeddings n ON n.vec_id = a.vec_id
  WHERE p.query_id <> a.vec_id AND q.label <> n.label
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, query_label, neighbor_id, neighbor_label, cosine, rank
FROM ranked WHERE rank <= {k}"""


# ------------------------------------ random-projection dim reduction

RP_IN_DIM = 64  # embeddings table component count
RP_OUT_DIM = 16
RP_SCALE = 1_000_000  # fixed-point units per input component


def _rp_sign(j: int, k: int) -> int:
    """Deterministic pseudo-random ±1 for projection cell (j, k):
    parity of an md5-mixed coordinate hash.  Pure-Python and embedded
    as literals on BOTH engines, so there is no RNG (or RNG-seed
    semantics) to disagree about."""
    import hashlib

    h = hashlib.md5(f"rp:{j}:{k}".encode()).digest()
    return 1 if h[0] & 1 else -1


def _rp_matrix(out_dim: int = RP_OUT_DIM, in_dim: int = RP_IN_DIM):
    return [
        [_rp_sign(j, k) for k in range(in_dim)] for j in range(out_dim)
    ]


def rp_reduce(
    embeddings: DataFrame,
    out_dim: int = RP_OUT_DIM,
    scale: int = RP_SCALE,
) -> DataFrame:
    """Sign-random-projection dimensionality reduction (Achlioptas'
    database-friendly ±1 projections): every embedding is mapped to
    ``out_dim`` integer components y_j = Σ_k sign(j,k)·q_k over the
    fixed-point quantized input q = floor(x·scale).  Output in long
    form (vec_id, rp_dim, rp_value) — the shape a downstream LSH /
    coarse-ANN stage consumes.

    Scale: embarrassingly parallel — one projection per row, no
    shuffle, no UDF (the per-dimension dot products are JVM-side
    zip_with/aggregate expressions over array columns); the ±1 matrix
    is a compile-time literal (out_dim × in_dim = 1024 cells), so the
    whole operator is a single narrow codegen stage at any corpus
    size.  Integer arithmetic end-to-end keeps the result bit-identical
    across engines and partitionings.

    Rows whose embedding is NULL, not exactly ``RP_IN_DIM`` wide, or
    containing a NULL component are EXCLUDED (both engines apply the
    same guard): a truncated vector would zip against the 64-wide sign
    rows with NULL padding — and a NULL component would NULL-poison the
    Spark aggregate while DuckDB's SUM skips the NULL row and returns a
    partial sum — either way a confusing gate divergence instead of a
    clean malformed-input exclusion."""
    q = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * F.lit(scale)).cast("long"),
    )
    embeddings = embeddings.filter(
        (F.size("embedding") == RP_IN_DIM)
        & ~F.exists("embedding", lambda x: x.isNull())
    )
    mat = _rp_matrix(out_dim)
    comps = [
        F.aggregate(
            F.zip_with(
                q,
                F.array(*[F.lit(s) for s in row]),
                lambda x, y: x * y.cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        for row in mat
    ]
    return embeddings.select(
        "vec_id", F.posexplode(F.array(*comps)).alias("rp_dim", "rp_value")
    )


def rp_reduce_sql(out_dim: int = RP_OUT_DIM, scale: int = RP_SCALE) -> str:
    mat = _rp_matrix(out_dim)
    # (k, j, sign) literal rows — k is 1-based to match generate_subscripts
    vals = ",\n    ".join(
        f"({k + 1},{j},{mat[j][k]})"
        for j in range(out_dim)
        for k in range(RP_IN_DIM)
    )
    return f"""WITH q AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS k,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {scale}) AS BIGINT)
           AS val
  FROM embeddings WHERE len(embedding) = {RP_IN_DIM}
    AND len(list_filter(embedding, x -> x IS NULL)) = 0
),
s(k, j, sgn) AS (VALUES
    {vals})
SELECT vec_id, j AS rp_dim, CAST(SUM(val * sgn) AS BIGINT) AS rp_value
FROM q JOIN s USING (k)
GROUP BY vec_id, j"""


# ------------------------------------------------ IVF-PQ quantized ANN

PQ_M = 4  # subspaces (64-dim embedding → 4 × 16-dim sub-vectors)
PQ_DSUB = RP_IN_DIM // PQ_M
PQ_KSUB = 8  # codes per sub-codebook → vectors compress to 4 small ints
PQ_ITERS = 1  # Lloyd rounds per sub-codebook
PQ_RESCORE = 50  # ADC candidates kept per query for the exact rescore


def _pq_codebooks(
    q: DataFrame,
    m: int = PQ_M,
    dsub: int = PQ_DSUB,
    ksub: int = PQ_KSUB,
    iters: int = PQ_ITERS,
) -> list:
    """One integer-Lloyd codebook per subspace — the exact
    ``_train_centroids`` recurrence (same seeds, same cosine argmax and
    tie-break, same truncating integer centroid update; pinned
    element-equal by ``test_pq_fused_training_matches_per_subspace``)
    but FUSED: all ``m`` subspaces train in ONE long-form
    (m, cid, sub-vector) aggregation per Lloyd round instead of m
    sequential trainings.  Per round that is one corpus scan and one
    model-sized collect, not m of each — the difference between 1× and
    m× full-table scans per round at the 100 TB tier (measured at
    sf0.1: knn_ivf_pq 11.0 → 8.4-8.7s; the residual is the probe and
    rescore, not training)."""
    seed_rows = sorted(
        (int(r["vec_id"]), [int(v) for v in r["q"]])
        for r in q.filter(F.col("vec_id") < ksub).collect()
    )
    books = [
        [
            (cid, vec[mm * dsub : (mm + 1) * dsub])
            for cid, vec in seed_rows
        ]
        for mm in range(m)
    ]

    def _tdiv(s: int, n: int) -> int:
        # truncation-toward-zero, matching DuckDB's BIGINT // and
        # Spark's div (see _train_centroids)
        return abs(s) // n * (1 if s >= 0 else -1)

    for _ in range(iters):
        entries = []
        for mm, cents in enumerate(books):
            sub = F.slice("q", mm * dsub + 1, dsub)
            best = F.array_min(
                F.array(
                    *[
                        F.struct(
                            (-_km_cosine(sub, cvec, _km_norm2(cvec))).alias(
                                "neg"
                            ),
                            F.lit(cid).alias("cid"),
                        )
                        for cid, cvec in cents
                    ]
                )
            )
            entries.append(
                F.struct(
                    F.lit(mm).alias("m"),
                    best["cid"].alias("cid"),
                    sub.alias("sub"),
                )
            )
        long = q.select(F.explode(F.array(*entries)).alias("e")).select(
            "e.m", "e.cid", "e.sub"
        )
        sums = (
            long.groupBy("m", "cid")
            .agg(
                F.count("*").alias("n"),
                *[
                    F.sum(F.element_at("sub", j + 1)).alias(f"s{j}")
                    for j in range(dsub)
                ],
            )
            .collect()
        )
        new_books: list = [[] for _ in range(m)]
        for r in sums:
            new_books[int(r["m"])].append(
                (
                    int(r["cid"]),
                    [_tdiv(int(r[f"s{j}"]), int(r["n"])) for j in range(dsub)],
                )
            )
        books = [sorted(b) for b in new_books]
    return books


def _pq_codes(q: DataFrame, books: list, dsub: int) -> DataFrame:
    """PQ encoding: per subspace, nearest-sub-centroid id via the same
    literal-centroid argmax as ``_km_argmax`` — one narrow map-side
    projection, no shuffle.  Carries nx2 = Σ_m |c_m[code_m]|², the
    reconstructed vector's exact integer norm² (subspaces are
    orthogonal coordinate blocks, so norms add)."""
    cols = [F.col("vec_id")]
    nx2 = None
    for mm, cents in enumerate(books):
        sub = F.slice("q", mm * dsub + 1, dsub)
        best = F.array_min(
            F.array(
                *[
                    F.struct(
                        (-_km_cosine(sub, cvec, _km_norm2(cvec))).alias("neg"),
                        F.lit(cid).alias("cid"),
                        F.lit(_km_norm2(cvec)).alias("n2"),
                    )
                    for cid, cvec in cents
                ]
            )
        )
        cols.append(best["cid"].alias(f"code{mm}"))
        nx2 = best["n2"] if nx2 is None else nx2 + best["n2"]
    return q.select(*cols, nx2.cast("long").alias("nx2"))


def _pq_lut(q: DataFrame, books: list, dsub: int, n_queries: int) -> DataFrame:
    """Asymmetric-distance lookup table: for every query and subspace,
    the exact BIGINT dot of the query's sub-vector against each sub-
    centroid — (n_queries × m × ksub) rows, the classic PQ trick that
    replaces a full-dimension dot per candidate with m table lookups."""
    from functools import reduce as _reduce

    qq = q.filter(F.col("vec_id") < n_queries)
    parts = []
    for mm, cents in enumerate(books):
        sub = F.slice("q", mm * dsub + 1, dsub)
        entries = F.array(
            *[
                F.struct(
                    F.lit(cid).alias("code"),
                    F.aggregate(
                        F.zip_with(
                            sub,
                            F.array(*[F.lit(int(v)) for v in cvec]),
                            lambda x, y: x * y,
                        ),
                        F.lit(0).cast("long"),
                        lambda acc, x: acc + x,
                    ).alias("dot"),
                )
                for cid, cvec in cents
            ]
        )
        parts.append(
            qq.select(
                F.col("vec_id").alias("query_id"),
                F.lit(mm).alias("m"),
                F.explode(entries).alias("e"),
            ).select("query_id", "m", "e.code", "e.dot")
        )
    return _reduce(lambda a, b: a.unionByName(b), parts)


def knn_ivf_pq(
    embeddings: DataFrame,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    n_centroids: int = N_CENTROIDS,
    n_probe: int = N_PROBE,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = PQ_ITERS,
    rescore: int = PQ_RESCORE,
) -> DataFrame:
    """IVF-PQ approximate k-NN — the 100 TB memory-footprint lever: the
    index holds 4 small ints per vector (the PQ codes) instead of 64
    doubles, candidates inside the probed coarse buckets are ranked by
    ASYMMETRIC DISTANCE (per-candidate cost = m LUT lookups, not a
    64-wide dot), and only the top ``rescore`` survivors per query pay
    the exact double cosine.

    Stages (all engine-deterministic):

    1. coarse IVF: the seeded first-N centroids of ``knn_ivf``
       (``knn_ivf_pq_trained`` swaps in the ``_train_centroids``
       output — same tail, see ``_pq_adc_topk``);
    2. sub-codebooks: one integer-Lloyd run per 16-dim subspace
       (``_pq_codebooks`` — the ``embedding_kmeans`` machinery on
       sliced vectors);
    3. encode: map-side literal argmax per subspace → (code0..code3,
       nx2), no shuffle;
    4. ADC: candidates explode to (m, code) and join the BROADCAST
       query LUT (n_queries × m × ksub rows), one integer sum per
       candidate; approx cosine = adc_dot / (|q|·|x̂|) — one double
       expression over exact integers, bit-identical in the oracle;
    5. exact rescore of the top ``rescore`` by true cosine → top-k.

    Measured at sf0.01 (500 vectors, 5 queries, k=10): mean recall@10
    is 0.70 / 0.84 / 0.92 at rescore = 30 / 50 / 80, against the plain
    exact-scoring IVF's 0.94 — i.e. at rescore=80 ADC loses almost
    nothing and the residual gap is the coarse probe stage both
    variants share.  NB the synthetic embeddings are UNIFORM random —
    PQ's adversarial case (no cluster structure for the codebooks to
    exploit), so these numbers are a floor: on real clustered
    embeddings ADC ranks better at the same rescore depth."""
    dsub = RP_IN_DIM // m
    q = materialize(_valid_quantized(embeddings))
    books = _pq_codebooks(q, m, dsub, ksub, iters)

    # coarse probe selection — identical to knn_ivf's seeded stage
    assign = ivf_assignments(embeddings, n_centroids)
    cents = embeddings.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("c_emb")
    )
    qe = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    qc = qe.crossJoin(F.broadcast(cents)).select(
        "query_id",
        "centroid_id",
        cosine_col(F.col("q_emb"), F.col("c_emb")).alias("c_cos"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("c_cos").desc(), F.col("centroid_id").asc()
    )
    probes = (
        qc.withColumn("rnk", F.row_number().over(wq))
        .filter(F.col("rnk") <= n_probe)
        .select("query_id", "centroid_id")
    )
    cand = (
        probes.join(
            assign.withColumnRenamed("vec_id", "neighbor_id"),
            on="centroid_id",
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
    )
    return _pq_adc_topk(
        q, embeddings, cand, books, dsub, m, n_queries, k, rescore
    )


def _pq_adc_topk(
    q: DataFrame,
    embeddings: DataFrame,
    cand: DataFrame,
    books: list,
    dsub: int,
    m: int,
    n_queries: int,
    k: int,
    rescore: int,
) -> DataFrame:
    """The shared PQ tail of both IVF-PQ variants (seeded and trained
    coarse quantizer): narrow map-side encode, broadcast per-query ADC
    LUT, one integer sum per candidate, row_number-bounded exact
    rescore — stages 2-5 of ``knn_ivf_pq``'s docstring.  ``cand`` is
    whatever coarse stage produced (query_id, neighbor_id)."""
    codes = _pq_codes(q, books, dsub)
    lut = _pq_lut(q, books, dsub, n_queries)
    qe = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    candm = cand.join(
        codes.withColumnRenamed("vec_id", "neighbor_id"), on="neighbor_id"
    ).select(
        "query_id",
        "neighbor_id",
        "nx2",
        F.posexplode(F.array(*[F.col(f"code{mm}") for mm in range(m)])).alias(
            "m", "code"
        ),
    )
    adc = (
        candm.join(F.broadcast(lut), on=["query_id", "m", "code"])
        .groupBy("query_id", "neighbor_id", "nx2")
        .agg(F.sum("dot").alias("adc_dot"))
    )
    qn = q.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.aggregate(
            F.transform("q", lambda x: x * x),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("nq2"),
    )
    approx = adc.join(F.broadcast(qn), on="query_id").select(
        "query_id",
        "neighbor_id",
        (
            F.col("adc_dot").cast("double")
            / (
                F.sqrt(F.col("nq2").cast("double"))
                * F.sqrt(F.col("nx2").cast("double"))
            )
        ).alias("approx_cos"),
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("approx_cos").desc(), F.col("neighbor_id").asc()
    )
    topr = (
        approx.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= rescore)
        .select("query_id", "neighbor_id")
    )
    scored = (
        topr.join(F.broadcast(qe), on="query_id")
        .join(
            embeddings.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("n_emb"),
            ),
            on="neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            cosine_col(F.col("q_emb"), F.col("n_emb")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def knn_ivf_pq_trained(
    embeddings: DataFrame,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    n_centroids: int = KMEANS_K,
    coarse_iters: int = KMEANS_ITERS,
    n_probe: int = N_PROBE,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = PQ_ITERS,
    rescore: int = PQ_RESCORE,
) -> DataFrame:
    """IVF-PQ over a TRAINED coarse quantizer — the production 100 TB
    form: at scale nobody probes a seeded coarse index (see
    ``knn_ivf_trained``'s skew argument), so the coarse stage here is
    the deterministic integer Lloyd loop (``_train_centroids``), while
    the PQ tail (codebooks, narrow encode, broadcast ADC LUT, bounded
    exact rescore) is byte-identical to ``knn_ivf_pq`` via
    ``_pq_adc_topk``.

    Coarse assignment and probe selection are map-side literal-centroid
    argmax over the quantized integer vectors (the ``_km_argmax``
    expression — no shuffle, bit-identical in the oracle), exactly as
    in ``knn_ivf_trained``; the seeded variant scores coarse probes
    with the double cosine over raw embeddings instead.  "Exactly"
    holds unconditionally: every kmeans-derived operator trains on the
    same ``_valid_quantized`` input (round-6 advisor — previously
    ``knn_ivf_trained`` trained unfiltered, so the shared-coarse-stage
    reduction held only on well-formed data, and a malformed row
    crashed its Lloyd aggregate mid-loop;
    test_trained_variants_invariant_to_malformed_rows pins the
    invariance).  Recall is reported by ``knn_ivf_pq_trained_recall``.

    Training cost: coarse_iters + pq_iters full scans (one per Lloyd
    round, collects stay model-sized).  At 100 TB both quantizers
    would be trained on a sample of the corpus (swap ``q`` for
    ``q.sample(...)`` in the two training calls below — encode, probe,
    and ADC read the full table either way); the registered query
    trains on the full table only because the sf tables are already
    sample-sized."""
    dsub = RP_IN_DIM // m
    q = materialize(_valid_quantized(embeddings))
    books = _pq_codebooks(q, m, dsub, ksub, iters)
    cents = _train_centroids(q, n_centroids, coarse_iters)
    assign = _km_argmax(q, cents).select("vec_id", "centroid_id")
    probes = _trained_probes(q, cents, n_queries, n_probe)
    cand = (
        probes.join(
            assign.withColumnRenamed("vec_id", "neighbor_id"),
            on="centroid_id",
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
    )
    return _pq_adc_topk(
        q, embeddings, cand, books, dsub, m, n_queries, k, rescore
    )


def _pq_sub_dot_sql(dsub: int) -> str:
    return (
        f"list_sum(list_transform(range(1, {dsub + 1}), "
        "i -> v.q[i] * c.cvec[i]))"
    )


def _pq_sql(
    coarse_ctes: str,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = PQ_ITERS,
    rescore: int = PQ_RESCORE,
) -> str:
    """The shared PQ oracle body — ``coarse_ctes`` supplies the
    ``assign``/``probes`` CTE text (seeded or trained coarse stage);
    everything downstream (codebook chains, encode, LUT, cand, ADC,
    rescore) is identical between the two variants, mirroring
    ``_pq_adc_topk`` on the Spark side."""
    dsub = RP_IN_DIM // m
    cos_qn = COSINE_SQL.format(a="q.embedding", b="n.embedding")
    parts = [
        f"""WITH qfull AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * {KM_SCALE}) AS BIGINT)) AS q
  FROM embeddings
  WHERE len(embedding) = {RP_IN_DIM}
    AND len(list_filter(embedding, x -> x IS NULL)) = 0
)"""
    ]
    for mm in range(m):
        lo, hi = mm * dsub + 1, (mm + 1) * dsub
        parts.append(
            f""",
q{mm} AS MATERIALIZED (SELECT vec_id, q[{lo}:{hi}] AS q FROM qfull),
pc{mm}_0 AS (SELECT vec_id AS cid, q AS cvec FROM q{mm} WHERE vec_id < {ksub})"""
        )
        for i in range(iters):
            parts.append(
                ", " + _km_assign_cte(f"pa{mm}_{i}", f"pc{mm}_{i}", src=f"q{mm}")
            )
            parts.append(", " + _km_update_cte(f"pc{mm}_{i + 1}", f"pa{mm}_{i}"))
        parts.append(
            ", " + _km_assign_cte(f"enc{mm}", f"pc{mm}_{iters}", src=f"q{mm}")
        )
    code_cols = ", ".join(f"e{mm}.cid AS code{mm}" for mm in range(m))
    nx2 = " + ".join(
        f"list_sum(list_transform(c{mm}.cvec, x -> x * x))" for mm in range(m)
    )
    enc_joins = "\n  ".join(
        f"JOIN enc{mm} e{mm} USING (vec_id)" for mm in range(1, m)
    )
    book_joins = "\n  ".join(
        f"JOIN pc{mm}_{iters} c{mm} ON e{mm}.cid = c{mm}.cid"
        for mm in range(m)
    )
    parts.append(
        f""",
codes AS MATERIALIZED (
  SELECT e0.vec_id, {code_cols}, {nx2} AS nx2
  FROM enc0 e0
  {enc_joins}
  {book_joins}
)"""
    )
    lut_union = "\n  UNION ALL\n  ".join(
        f"""SELECT v.vec_id AS query_id, {mm} AS m, c.cid AS code,
         {_pq_sub_dot_sql(dsub)} AS dot
  FROM q{mm} v CROSS JOIN pc{mm}_{iters} c WHERE v.vec_id < {n_queries}"""
        for mm in range(m)
    )
    cand_union = "\n  UNION ALL\n  ".join(
        f"""SELECT query_id, neighbor_id, {mm} AS m, code{mm} AS code
  FROM cand JOIN codes ON vec_id = neighbor_id"""
        for mm in range(m)
    )
    parts.append(
        f""",
lut AS MATERIALIZED (
  {lut_union}
),
{coarse_ctes},
cand AS MATERIALIZED (
  SELECT p.query_id, a.vec_id AS neighbor_id
  FROM probes p JOIN assign a ON a.centroid_id = p.centroid_id
  WHERE p.query_id <> a.vec_id
),
adc AS (
  SELECT cm.query_id, cm.neighbor_id, SUM(l.dot) AS adc_dot
  FROM ({cand_union}) cm
  JOIN lut l ON l.query_id = cm.query_id AND l.m = cm.m AND l.code = cm.code
  GROUP BY 1, 2
),
qn AS (
  SELECT vec_id AS query_id, list_sum(list_transform(q, x -> x * x)) AS nq2
  FROM qfull WHERE vec_id < {n_queries}
),
topr AS (
  SELECT query_id, neighbor_id FROM (
    SELECT a.query_id, a.neighbor_id,
           row_number() OVER (PARTITION BY a.query_id ORDER BY
             CAST(a.adc_dot AS DOUBLE)
               / (sqrt(CAST(qn.nq2 AS DOUBLE)) * sqrt(CAST(c.nx2 AS DOUBLE)))
             DESC, a.neighbor_id ASC) AS rn
    FROM adc a
    JOIN qn USING (query_id)
    JOIN codes c ON c.vec_id = a.neighbor_id
  ) WHERE rn <= {rescore}
),
scored AS (
  SELECT t.query_id, t.neighbor_id, {cos_qn} AS cosine
  FROM topr t
  JOIN embeddings q ON q.vec_id = t.query_id
  JOIN embeddings n ON n.vec_id = t.neighbor_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {k}"""
    )
    return "".join(parts)


def knn_ivf_pq_sql(
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    n_centroids: int = N_CENTROIDS,
    n_probe: int = N_PROBE,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = PQ_ITERS,
    rescore: int = PQ_RESCORE,
) -> str:
    cos_vc = COSINE_SQL.format(a="v.embedding", b="c.embedding")
    cos_qc = COSINE_SQL.format(a="q.embedding", b="c.embedding")
    coarse = f"""assign AS MATERIALIZED (
  SELECT vec_id, centroid_id FROM (
    SELECT v.vec_id, c.vec_id AS centroid_id,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {cos_vc} DESC, c.vec_id ASC) AS rnk
    FROM embeddings v, embeddings c WHERE c.vec_id < {n_centroids}
  ) WHERE rnk = 1
),
probes AS (
  SELECT query_id, centroid_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS centroid_id,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY {cos_qc} DESC, c.vec_id ASC) AS rnk
    FROM embeddings q, embeddings c
    WHERE q.vec_id < {n_queries} AND c.vec_id < {n_centroids}
  ) WHERE rnk <= {n_probe}
)"""
    return _pq_sql(coarse, n_queries, k, m, ksub, iters, rescore)


def knn_ivf_pq_trained_sql(
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    n_centroids: int = KMEANS_K,
    coarse_iters: int = KMEANS_ITERS,
    n_probe: int = N_PROBE,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = PQ_ITERS,
    rescore: int = PQ_RESCORE,
) -> str:
    """Trained-coarse PQ oracle: the integer-Lloyd CTE chain over the
    SAME filtered quantized table the PQ stages use (``qfull``), then
    ``assign``/``probes`` by the exact integer cosine — mirroring
    ``knn_ivf_pq_trained``'s ``_km_argmax`` coarse stage."""
    parts = [
        f"cc0 AS (SELECT vec_id AS cid, q AS cvec FROM qfull "
        f"WHERE vec_id < {n_centroids})"
    ]
    for i in range(coarse_iters):
        parts.append(_km_assign_cte(f"ca{i}", f"cc{i}", src="qfull"))
        parts.append(_km_update_cte(f"cc{i + 1}", f"ca{i}"))
    parts.append(
        _km_assign_cte("cassign", f"cc{coarse_iters}", src="qfull")
    )
    parts.append(
        f"""assign AS MATERIALIZED (
  SELECT vec_id, cid AS centroid_id FROM cassign
),
probes AS (
  SELECT query_id, centroid_id FROM (
    SELECT v.vec_id AS query_id, c.cid AS centroid_id,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {_KM_COS_SQL} DESC, c.cid ASC) AS rnk
    FROM qfull v CROSS JOIN cc{coarse_iters} c
    WHERE v.vec_id < {n_queries}
  ) WHERE rnk <= {n_probe}
)"""
    )
    return _pq_sql(",\n".join(parts), n_queries, k, m, ksub, iters, rescore)


def knn_ivf_pq_trained_recall(
    embeddings: DataFrame,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    **kwargs,
) -> DataFrame:
    """Recall@k of trained-coarse IVF-PQ vs the exact brute-force
    top-k — completes the 2x2 recall grid (seeded/trained x
    exact-scoring/PQ): what quantization costs ON TOP of a trained
    coarse index, vs ``knn_ivf_trained_recall``'s unquantized row."""
    return _recall_vs_exact(
        embeddings,
        knn_ivf_pq_trained(embeddings, n_queries, k, **kwargs),
        n_queries,
        k,
    )


def knn_ivf_pq_trained_recall_sql(
    n_queries: int = N_QUERIES, k: int = TOP_K, **kwargs
) -> str:
    return _recall_sql(
        knn_ivf_pq_trained_sql(n_queries, k, **kwargs), n_queries, k
    )


def knn_ivf_pq_recall(
    embeddings: DataFrame,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    **kwargs,
) -> DataFrame:
    """Recall@k of IVF-PQ against the exact brute-force top-k — the
    published honesty metric for the quantized path (companion of
    ``knn_ivf_recall`` / ``knn_ivf_trained_recall``): what 16× index
    compression plus LUT scoring costs at the default probe/rescore
    settings."""
    return _recall_vs_exact(
        embeddings, knn_ivf_pq(embeddings, n_queries, k, **kwargs), n_queries, k
    )


def knn_ivf_pq_recall_sql(
    n_queries: int = N_QUERIES, k: int = TOP_K, **kwargs
) -> str:
    return _recall_sql(knn_ivf_pq_sql(n_queries, k, **kwargs), n_queries, k)


def knn_lsh_multiprobe(
    embeddings: DataFrame,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    n_planes: int = N_HYPERPLANES,
) -> DataFrame:
    """Multi-probe LSH k-NN (Lv et al., VLDB 2007): each query probes
    its own bucket PLUS every bucket at Hamming distance 1 in each
    band (flip one of the band's sign bits) — near neighbors that a
    single borderline hyperplane pushed into an adjacent bucket are
    recovered WITHOUT more hash tables or a bigger index.  The classic
    recall-vs-index-size trade: probe count grows
    (1 + band_bits)x per band, index size is unchanged; at 100 TB the
    index (not the query fan-out) is the cost that matters, which is
    why multi-probe beats adding tables.  Measured on the synthetic
    embeddings at sf0.01: recall@10 0.520 single-probe -> 0.960
    multi-probe at an unchanged 4x4-bit index.

    Same exact re-scoring tail as :func:`knn_lsh` (candidates are
    cosine-scored exactly and top-k ranked deterministically), so the
    only approximation is WHICH candidates are seen."""
    sigs = lsh_band_signatures(embeddings, n_planes)
    # probe set per query band: the original value + band_bits flips
    probes = F.array(
        F.col("band_val"),
        *[
            F.col("band_val").bitwiseXOR(F.lit(1 << j))
            for j in range(LSH_BAND_BITS)
        ],
    )
    q_sigs = (
        sigs.filter(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("query_id"),
            "band",
            F.explode(probes).alias("band_val"),
        )
    )
    cand = (
        q_sigs.join(
            sigs.select(
                F.col("vec_id").alias("neighbor_id"), "band", "band_val"
            ),
            on=["band", "band_val"],
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    # broadcast the QUERY-SET projection, not the corpus (see knn_lsh:
    # cand.query_id < n_queries by construction, so this is the same
    # result with an n_queries-row broadcast instead of an unbounded
    # one; plan-pinned in test_plans.py)
    q = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    n = embeddings.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("n_emb")
    )
    scored = (
        cand.join(F.broadcast(q), on="query_id")
        .join(n, on="neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine_col(F.col("q_emb"), F.col("n_emb")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def knn_lsh_multiprobe_sql(
    n_queries: int = N_QUERIES, k: int = TOP_K, n_planes: int = N_HYPERPLANES
) -> str:
    cos_vp = COSINE_SQL.format(a="v.embedding", b="p.embedding")
    cos_qn = COSINE_SQL.format(a="q.embedding", b="n.embedding")
    return f"""WITH sigs AS MATERIALIZED (
  SELECT vec_id, plane_id // {LSH_BAND_BITS} AS band,
         SUM(bit << (CAST(plane_id AS INT) % {LSH_BAND_BITS})) AS band_val
  FROM (
    SELECT v.vec_id, p.vec_id AS plane_id,
           CASE WHEN {cos_vp} >= 0 THEN 1 ELSE 0 END AS bit
    FROM embeddings v, embeddings p WHERE p.vec_id < {n_planes}
  ) GROUP BY 1, 2
),
qprobes AS (
  SELECT vec_id AS query_id, band, band_val FROM sigs
  WHERE vec_id < {n_queries}
  UNION ALL
  SELECT vec_id, band, xor(band_val, 1 << j)
  FROM sigs, range({LSH_BAND_BITS}) t(j)
  WHERE vec_id < {n_queries}
),
cand AS (
  SELECT DISTINCT qp.query_id, ns.vec_id AS neighbor_id
  FROM qprobes qp
  JOIN sigs ns ON qp.band = ns.band AND qp.band_val = ns.band_val
  WHERE qp.query_id <> ns.vec_id
),
scored AS (
  SELECT c.query_id, c.neighbor_id, {cos_qn} AS cosine
  FROM cand c
  JOIN embeddings q ON q.vec_id = c.query_id
  JOIN embeddings n ON n.vec_id = c.neighbor_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {k}"""
