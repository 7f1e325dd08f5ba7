"""Similarity search over the ``embeddings`` table (array<float> column).

Two paths (graft requirement):
* brute-force cosine top-k — the exact baseline; JVM-side zip_with /
  aggregate lambda math, no Python.
* LSH-bucketed ANN — deterministic random-hyperplane signatures; at scale
  the bucket key is the shuffle key and candidate scoring is bucket-local.

Dot products run in double with left-to-right array order in both Spark
and the DuckDB oracle, then round(4), so value hashes match bit-for-bit.
"""

from __future__ import annotations

import hashlib
from typing import List

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load

DIM = 64
QUERY_VEC_ID = 0
TOP_K = 10


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0).cast("double"),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


# ---------------------------------------------------------------------------
# Brute-force top-k (exact baseline)
# ---------------------------------------------------------------------------


def brute_force_topk(embeddings: DataFrame, query_vec_id: int = QUERY_VEC_ID,
                      k: int = TOP_K) -> DataFrame:
    """Top-k cosine neighbors of one query vector.

    The single query row is crossed (broadcast — one row) against the
    corpus; TakeOrderedAndProject keeps only k rows per partition before
    the final merge, so the full similarity column never materializes.
    """
    q = (
        embeddings.filter(F.col("vec_id") == query_vec_id)
        .select(F.col("embedding").alias("q_embedding"))
    )
    scored = embeddings.filter(F.col("vec_id") != query_vec_id).crossJoin(
        F.broadcast(q)
    )
    return (
        scored.select(
            "vec_id", "label",
            F.round(cosine(F.col("embedding"), F.col("q_embedding")), 4).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def q_ann_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    return brute_force_topk(load(spark, sf_dir, "embeddings"))


_DUCK_DOT = (
    "list_sum(list_transform(list_zip(e.embedding::DOUBLE[], q.embedding::DOUBLE[]),"
    " x -> x[1] * x[2]))"
)
_DUCK_NORM_E = "sqrt(list_sum(list_transform(e.embedding::DOUBLE[], x -> x*x)))"
_DUCK_NORM_Q = "sqrt(list_sum(list_transform(q.embedding::DOUBLE[], x -> x*x)))"

ORACLE_ANN_BRUTE_FORCE = f"""
    SELECT e.vec_id, e.label,
           round({_DUCK_DOT} / ({_DUCK_NORM_E} * {_DUCK_NORM_Q}), 4) AS cos_sim
    FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = {QUERY_VEC_ID}) q
    WHERE e.vec_id != {QUERY_VEC_ID}
    ORDER BY cos_sim DESC, e.vec_id ASC
    LIMIT {TOP_K}
"""


# ---------------------------------------------------------------------------
# Batch-query top-k (the production shape: many queries at once)
# ---------------------------------------------------------------------------

N_BATCH_QUERIES = 5
BATCH_TOP_K = 3


def q_ann_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k neighbors for a BATCH of queries in one plan: broadcast the
    query block (vec_id < N), score corpus × queries, rank per query with
    a window — Spark plans WindowGroupLimit, so only k rows per query
    survive each partition before the shuffle.  At 100 TB the query block
    stays broadcast-sized (thousands of rows) while the corpus streams."""
    from pyspark.sql import Window

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_BATCH_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    scored = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id", "label",
            F.round(cosine(F.col("embedding"), F.col("q_embedding")), 4).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= BATCH_TOP_K)
        .select("query_id", "rk", "vec_id", "label", "cos_sim")
        .orderBy("query_id", "rk")
    )


ORACLE_ANN_BATCH_TOPK = f"""
    SELECT query_id, rk, vec_id, label, cos_sim
    FROM (
        SELECT q.vec_id AS query_id, e.vec_id, e.label,
               round({_DUCK_DOT} / ({_DUCK_NORM_E} * {_DUCK_NORM_Q}), 4) AS cos_sim,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY round({_DUCK_DOT} / ({_DUCK_NORM_E} * {_DUCK_NORM_Q}), 4) DESC,
                            e.vec_id ASC
               ) AS rk
        FROM embeddings e,
             (SELECT vec_id, embedding FROM embeddings
              WHERE vec_id < {N_BATCH_QUERIES}) q
        WHERE e.vec_id != q.vec_id
    )
    WHERE rk <= {BATCH_TOP_K}
    ORDER BY query_id, rk
"""


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (random hyperplanes, deterministic)
# ---------------------------------------------------------------------------

# 4 planes → 16 buckets: coarse enough that buckets hold real candidate
# sets at sf0.01 (8 planes left ~1 candidate per bucket); widen on larger
# corpora — bucket count scales 2^planes.
N_PLANES = 4


def _hyperplanes(n_planes: int = N_PLANES, dim: int = DIM,
                 seed_prefix: str = "plane") -> List[List[float]]:
    """±1 hyperplane components derived from md5(plane, dim) parity —
    deterministic across processes/executors, no RNG state.  A distinct
    ``seed_prefix`` yields an independent plane family (used for the
    second-level re-bucketing of hot buckets)."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            digest = hashlib.md5(f"{seed_prefix}:{p}:{d}".encode()).digest()
            row.append(1.0 if digest[0] % 2 == 0 else -1.0)
        planes.append(row)
    return planes


def lsh_bucket_column(emb: Column, n_planes: int = N_PLANES,
                      seed_prefix: str = "plane") -> Column:
    """Signature bit p = sign(dot(v, plane_p)); packed into an int key."""
    planes = _hyperplanes(n_planes, seed_prefix=seed_prefix)
    sig = F.lit(0)
    for p, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(v) for v in plane])
        bit = F.when(_dot(emb, plane_col) > 0, F.lit(1 << p)).otherwise(F.lit(0))
        sig = sig + bit
    return sig


# Multi-band OR-ing (round 3): the recall ledger (q_ann_lsh_recall)
# measured single-band recall@10 at 0.0–0.3 on this corpus, so the ANN
# path now unions candidates from N_BANDS independent hyperplane
# families — the same recall lever as the MinHash multi-band work, in
# the same banded-rows shape: each vector explodes to one row per
# (band_id, bucket) and the candidate join keys on BOTH, so it stays a
# single hash join (no OR-join nested loop).  Recall lift is an
# oracle-checked number in q_ann_lsh_recall, not a claim.
N_BANDS = 2
_BAND_PREFIXES = ["plane", "planeB"]


def lsh_band_keys(emb: Column) -> Column:
    """Array of per-band bucket keys (one independent plane family per
    band) — a narrow per-row expression, like the MinHash signatures."""
    return F.array(
        *[
            lsh_bucket_column(emb, N_PLANES, seed_prefix=p)
            for p in _BAND_PREFIXES[:N_BANDS]
        ]
    )


def ann_lsh_topk(embeddings: DataFrame, query_vec_id: int = QUERY_VEC_ID,
                  k: int = TOP_K) -> DataFrame:
    """ANN: score only vectors sharing ≥1 of the query's per-band
    hyperplane buckets.

    At 100 TB: band-key assignment is a narrow map; the corpus explodes
    to N_BANDS rows per vector and candidates join on (band_id, bucket)
    — one hash join whose key space is N_BANDS × 2^N_PLANES (widen
    planes for finer buckets, add bands for recall); duplicate
    candidates (both bands match) collapse on vec_id before scoring, so
    each candidate is scored once.
    """
    corpus = embeddings.select(
        "vec_id", "label", "embedding",
        F.posexplode(lsh_band_keys(F.col("embedding"))).alias("band_id", "bucket"),
    )
    q = embeddings.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_embedding"),
        F.posexplode(lsh_band_keys(F.col("embedding"))).alias(
            "q_band_id", "q_bucket"
        ),
    )
    cands = (
        corpus.join(
            F.broadcast(q),
            (corpus.band_id == q.q_band_id) & (corpus.bucket == q.q_bucket),
        )
        .filter(F.col("vec_id") != query_vec_id)
        .dropDuplicates(["vec_id"])
    )
    return (
        cands.select(
            "vec_id", "label",
            F.round(cosine(F.col("embedding"), F.col("q_embedding")), 4).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ann_lsh_topk(load(spark, sf_dir, "embeddings"))


# Multi-probe LSH (round 3, late): the OTHER recall lever.  Multi-band
# OR-ing buys recall by exploding the CORPUS (N_BANDS rows per vector —
# at 100 TB that doubles the bucketed table and its shuffle).  Multi-probe
# buys recall by exploding the QUERY side instead: each query probes its
# own bucket plus every Hamming-1 neighbor (flip one plane bit), i.e. the
# buckets a borderline vector most plausibly fell into (Lv et al.,
# "Multi-Probe LSH", VLDB'07).  Corpus stays ONE row per vector; the probe
# fan-out multiplies only the broadcast-sized query block.  Probe keys are
# 1+N_PLANES distinct ints, and each corpus row carries exactly one
# bucket, so a candidate can match at most one probe — no dedup shuffle
# needed before scoring.
PROBE_XORS = [0] + [1 << p for p in range(N_PLANES)]


def lsh_probe_keys(bucket: Column) -> Column:
    """Array of Hamming-≤1 probe buckets for a query's bucket key."""
    return F.array(*[bucket.bitwiseXOR(F.lit(x)) for x in PROBE_XORS])


def ann_lsh_multiprobe_topk(
    embeddings: DataFrame, query_vec_id: int = QUERY_VEC_ID, k: int = TOP_K
) -> DataFrame:
    """ANN via single-band LSH with Hamming-1 multi-probe on the query.

    At 100 TB: the corpus-side plan is a narrow map to (vec_id, bucket)
    — half the exploded footprint of the two-band path — and ONE
    broadcast hash join against (1+N_PLANES)·|queries| probe rows.
    Candidate volume per query ≈ (1+N_PLANES)·corpus/2^N_PLANES; widen
    N_PLANES to keep buckets bounded, and the probe count stays the
    recall dial that costs no corpus bytes.
    """
    corpus = embeddings.select(
        "vec_id", "label", "embedding",
        lsh_bucket_column(F.col("embedding")).alias("bucket"),
    )
    q = (
        embeddings.filter(F.col("vec_id") == query_vec_id)
        .select(
            F.col("embedding").alias("q_embedding"),
            lsh_bucket_column(F.col("embedding")).alias("qb"),
        )
        .select(
            "q_embedding",
            F.explode(lsh_probe_keys(F.col("qb"))).alias("probe"),
        )
    )
    cands = corpus.join(
        F.broadcast(q), corpus.bucket == q.probe
    ).filter(F.col("vec_id") != query_vec_id)
    return (
        cands.select(
            "vec_id", "label",
            F.round(cosine(F.col("embedding"), F.col("q_embedding")), 4).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def q_ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ann_lsh_multiprobe_topk(load(spark, sf_dir, "embeddings"))


def _probe_predicate_sql(lhs: str = "e.b0", rhs: str = "q.b0") -> str:
    """OR-of-xors membership test mirroring ``lsh_probe_keys``."""
    return " OR ".join(f"{lhs} = xor({rhs}, {x})" for x in PROBE_XORS)


def _lsh_sql_duckdb(n_planes: int = N_PLANES, seed_prefix: str = "plane") -> str:
    planes = _hyperplanes(n_planes, seed_prefix=seed_prefix)
    terms = []
    for p, plane in enumerate(planes):
        arr = "[" + ", ".join(str(v) for v in plane) + "]"
        dot = (
            f"list_sum(list_transform(list_zip(embedding::DOUBLE[], {arr}::DOUBLE[]),"
            " x -> x[1] * x[2]))"
        )
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << p} ELSE 0 END)")
    return " + ".join(terms)


ORACLE_ANN_LSH = f"""
    WITH bucketed AS (
        SELECT vec_id, label, embedding,
               {_lsh_sql_duckdb()} AS b0,
               {_lsh_sql_duckdb(seed_prefix='planeB')} AS b1
        FROM embeddings
    ),
    q AS (SELECT embedding, b0, b1 FROM bucketed WHERE vec_id = {QUERY_VEC_ID})
    SELECT e.vec_id, e.label,
           round({_DUCK_DOT} / ({_DUCK_NORM_E} * {_DUCK_NORM_Q}), 4) AS cos_sim
    FROM bucketed e, q
    WHERE (e.b0 = q.b0 OR e.b1 = q.b1) AND e.vec_id != {QUERY_VEC_ID}
    ORDER BY cos_sim DESC, e.vec_id ASC
    LIMIT {TOP_K}
"""


ORACLE_ANN_LSH_MULTIPROBE = f"""
    WITH bucketed AS (
        SELECT vec_id, label, embedding,
               {_lsh_sql_duckdb()} AS b0
        FROM embeddings
    ),
    q AS (SELECT embedding, b0 FROM bucketed WHERE vec_id = {QUERY_VEC_ID})
    SELECT e.vec_id, e.label,
           round({_DUCK_DOT} / ({_DUCK_NORM_E} * {_DUCK_NORM_Q}), 4) AS cos_sim
    FROM bucketed e, q
    WHERE ({_probe_predicate_sql()}) AND e.vec_id != {QUERY_VEC_ID}
    ORDER BY cos_sim DESC, e.vec_id ASC
    LIMIT {TOP_K}
"""


# ---------------------------------------------------------------------------
# Embedding near-dup: cosine > threshold within LSH buckets (dedup family)
# ---------------------------------------------------------------------------

# synthetic embeddings are near-orthogonal (max same-label cosine ≈ 0.47,
# p99 ≈ 0.30); 0.28 marks the "suspiciously close" tail for this corpus
NEAR_DUP_THRESHOLD = 0.28

# Two-level capped bucketing: a coarse bucket holding more than
# MAX_BUCKET_VECS vectors is re-bucketed with an independent fine plane
# family, so per-bucket pair work is bounded by cap² for quiet buckets
# and shrinks ~2^N_PLANES_FINE-fold for hot ones — the same hot-bucket
# discipline as dedup.MAX_BAND_DOCS.  Without the cap, the fixed
# 2^N_PLANES buckets make the self-join degrade toward all-pairs/16 as
# the corpus grows.  At 100 TB: add levels (depth log_{2^fine}(n/cap))
# or widen N_PLANES; recall lost to fine-bucket splits is the standard
# LSH trade — multi-band OR-ing is the recall lever, as in the MinHash
# path.  Cap=40 exercises BOTH paths at sf0.01 (bucket sizes 20-44).
N_PLANES_FINE = 4
MAX_BUCKET_VECS = 40


def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return embedding_near_dups(load(spark, sf_dir, "embeddings"))


def embedding_near_dups(emb: DataFrame) -> DataFrame:
    bucketed = emb.select(
        "vec_id", "embedding",
        lsh_bucket_column(F.col("embedding")).alias("coarse"),
        lsh_bucket_column(
            F.col("embedding"), N_PLANES_FINE, seed_prefix="plane2"
        ).alias("fine"),
    )
    # bucket-size census: ≤2^N_PLANES rows regardless of corpus size →
    # broadcast back; the refined key space [2^N_PLANES, …) can't collide
    # with unrefined coarse keys [0, 2^N_PLANES).  The census and the
    # pair join each re-scan `bucketed` (the plane dot products run
    # twice) — deliberate at 100 TB: a corpus-wide cache doesn't fit and
    # a window-count alternative would shuffle the whole corpus onto
    # 2^N_PLANES keys (max skew); re-scanning a columnar source is the
    # cheaper second pass.
    sizes = bucketed.groupBy("coarse").agg(F.count("*").alias("bucket_n"))
    n_coarse, n_fine = 1 << N_PLANES, 1 << N_PLANES_FINE
    final_bucket = F.when(
        F.col("bucket_n") > MAX_BUCKET_VECS,
        F.lit(n_coarse) + F.col("coarse") * n_fine + F.col("fine"),
    ).otherwise(F.col("coarse"))
    keyed = (
        bucketed.join(F.broadcast(sizes), "coarse")
        .select(final_bucket.alias("bucket"), "vec_id", "embedding")
    )
    a = keyed.select(
        F.col("bucket"), F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a")
    )
    b = keyed.select(
        F.col("bucket"), F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b")
    )
    pairs = a.join(b, "bucket").filter(F.col("vec_a") < F.col("vec_b"))
    sim = F.round(cosine(F.col("emb_a"), F.col("emb_b")), 4)
    return (
        pairs.select("vec_a", "vec_b", sim.alias("cos_sim"))
        .filter(F.col("cos_sim") > NEAR_DUP_THRESHOLD)
        .distinct()
        .orderBy("vec_a", "vec_b")
    )


def embedding_near_dup_stats(emb: DataFrame) -> DataFrame:
    """Refinement observability for :func:`embedding_near_dups` (one row):
    how many coarse buckets were hot (> MAX_BUCKET_VECS), how many vectors
    were re-bucketed, and — the recall ledger — how many same-coarse-bucket
    candidate PAIRS the fine split declined to examine
    (Σ_hot [C(n,2) − Σ_fine C(m,2)]).  The pair query's capped bucketing
    silently drops genuine near-dups that straddle fine buckets; this
    census makes that loss a first-class, oracle-checked number instead of
    a code comment.  Cost: the same two narrow plane projections plus two
    small aggregations — no pair join."""
    bucketed = emb.select(
        lsh_bucket_column(F.col("embedding")).alias("coarse"),
        lsh_bucket_column(
            F.col("embedding"), N_PLANES_FINE, seed_prefix="plane2"
        ).alias("fine"),
    )
    fine_counts = bucketed.groupBy("coarse", "fine").agg(F.count("*").alias("m"))
    coarse_stats = fine_counts.groupBy("coarse").agg(
        F.sum("m").alias("n"),
        F.sum(F.expr("m * (m - 1) DIV 2")).alias("fine_pairs"),
    )
    hot = F.col("n") > MAX_BUCKET_VECS
    return coarse_stats.agg(
        F.sum("n").alias("n_vecs"),
        F.sum(F.when(hot, 1).otherwise(0)).cast("bigint").alias("n_hot_buckets"),
        F.sum(F.when(hot, F.col("n")).otherwise(0)).cast("bigint").alias("refined_vecs"),
        F.sum(
            F.when(hot, F.expr("n * (n - 1) DIV 2") - F.col("fine_pairs")).otherwise(0)
        ).cast("bigint").alias("candidate_pairs_skipped"),
    )


def q_embedding_near_dup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return embedding_near_dup_stats(load(spark, sf_dir, "embeddings"))


ORACLE_EMBEDDING_NEAR_DUP_STATS = f"""
    WITH bucketed AS (
        SELECT {_lsh_sql_duckdb()} AS coarse,
               {_lsh_sql_duckdb(N_PLANES_FINE, seed_prefix='plane2')} AS fine
        FROM embeddings
    ),
    fc AS (SELECT coarse, fine, count(*) AS m FROM bucketed GROUP BY coarse, fine),
    cs AS (
        SELECT coarse,
               CAST(sum(m) AS BIGINT) AS n,
               CAST(sum(m * (m - 1) // 2) AS BIGINT) AS fine_pairs
        FROM fc GROUP BY coarse
    )
    -- CAST wraps each sum: DuckDB sum(BIGINT) yields HUGEINT
    SELECT CAST(sum(n) AS BIGINT) AS n_vecs,
           CAST(sum(CASE WHEN n > {MAX_BUCKET_VECS} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hot_buckets,
           CAST(sum(CASE WHEN n > {MAX_BUCKET_VECS} THEN n ELSE 0 END) AS BIGINT)
               AS refined_vecs,
           CAST(sum(CASE WHEN n > {MAX_BUCKET_VECS}
                         THEN n * (n - 1) // 2 - fine_pairs ELSE 0 END) AS BIGINT)
               AS candidate_pairs_skipped
    FROM cs
"""


_DUCK_PAIR_DOT = (
    "list_sum(list_transform(list_zip(a.embedding::DOUBLE[], b.embedding::DOUBLE[]),"
    " x -> x[1] * x[2]))"
)
_DUCK_PAIR_NA = "sqrt(list_sum(list_transform(a.embedding::DOUBLE[], x -> x*x)))"
_DUCK_PAIR_NB = "sqrt(list_sum(list_transform(b.embedding::DOUBLE[], x -> x*x)))"

ORACLE_EMBEDDING_NEAR_DUPS = f"""
    WITH bucketed AS (
        SELECT vec_id, embedding,
               {_lsh_sql_duckdb()} AS coarse,
               {_lsh_sql_duckdb(N_PLANES_FINE, seed_prefix='plane2')} AS fine
        FROM embeddings
    ),
    sized AS (
        SELECT bucketed.*, count(*) OVER (PARTITION BY coarse) AS bucket_n
        FROM bucketed
    ),
    keyed AS (
        SELECT vec_id, embedding,
               CASE WHEN bucket_n > {MAX_BUCKET_VECS}
                    THEN {1 << N_PLANES} + coarse * {1 << N_PLANES_FINE} + fine
                    ELSE coarse END AS bucket
        FROM sized
    )
    SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round({_DUCK_PAIR_DOT} / ({_DUCK_PAIR_NA} * {_DUCK_PAIR_NB}), 4) AS cos_sim
    FROM keyed a JOIN keyed b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE round({_DUCK_PAIR_DOT} / ({_DUCK_PAIR_NA} * {_DUCK_PAIR_NB}), 4) > {NEAR_DUP_THRESHOLD}
    ORDER BY vec_a, vec_b
"""


# ---------------------------------------------------------------------------
# IVF-style ANN: coarse quantizer (centroid per cluster) → probe nearest
# centroids → exact search within probed cells
# ---------------------------------------------------------------------------

N_PROBE = 2


def ivf_centroids(embeddings: DataFrame, dim: int = DIM) -> DataFrame:
    """Coarse quantizer: per-cluster centroid via element-wise mean.

    Clusters come from the ``label`` column (at 100 TB these would be
    k-means assignments computed once offline).  One per-dimension avg
    aggregate per component — a single groupBy(label) with map-side
    partial aggregation over the ORIGINAL n rows.  (The earlier
    posexplode formulation materialized n×dim rows before the combine
    and shuffled on (label, dim); this shape touches each row once and
    shuffles only n_partitions × n_clusters partial states.)
    """
    # F.get (not [i]): returns NULL for a too-short array instead of an
    # ANSI INVALID_ARRAY_INDEX error, and avg skips NULLs — matching the
    # old posexplode behavior on ragged inputs.  dim is the centroid
    # contract: components past it are ignored by design.
    means = embeddings.groupBy("label").agg(
        *[F.avg(F.get("embedding", i)).alias(f"_m{i}") for i in range(dim)]
    )
    return means.select(
        "label",
        F.array(*[F.col(f"_m{i}") for i in range(dim)]).alias("centroid"),
    )


def ann_ivf_topk(embeddings: DataFrame, query_vec_id: int = QUERY_VEC_ID,
                  k: int = TOP_K, n_probe: int = N_PROBE) -> DataFrame:
    """IVF search: score the query against every centroid (tiny, broadcast),
    keep the n_probe nearest cells, exact-search only rows in those cells."""
    cents = ivf_centroids(embeddings)
    q = embeddings.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_embedding")
    )
    probed = (
        cents.crossJoin(F.broadcast(q))
        .select(
            "label",
            cosine(F.col("centroid"), F.col("q_embedding")).alias("c_sim"),
        )
        .orderBy(F.desc("c_sim"), F.asc("label"))
        .limit(n_probe)
        .select("label")
    )
    cands = embeddings.join(F.broadcast(probed), "label").filter(
        F.col("vec_id") != query_vec_id
    )
    return (
        cands.crossJoin(F.broadcast(q))
        .select(
            "vec_id", "label",
            F.round(cosine(F.col("embedding"), F.col("q_embedding")), 4).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ann_ivf_topk(load(spark, sf_dir, "embeddings"))


_DUCK_CENT_DOT = (
    "list_sum(list_transform(list_zip(c.centroid, q.embedding::DOUBLE[]),"
    " x -> x[1] * x[2]))"
)
_DUCK_CENT_NORM = "sqrt(list_sum(list_transform(c.centroid, x -> x*x)))"

ORACLE_ANN_IVF = f"""
    WITH cents AS (
        SELECT label, list(m ORDER BY dim) AS centroid
        FROM (
            SELECT label, dim, avg(v) AS m
            FROM (
                SELECT label, unnest(embedding::DOUBLE[]) AS v,
                       generate_subscripts(embedding, 1) - 1 AS dim
                FROM embeddings
            )
            GROUP BY label, dim
        )
        GROUP BY label
    ),
    q AS (SELECT embedding FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
    probed AS (
        SELECT c.label
        FROM cents c, q
        ORDER BY {_DUCK_CENT_DOT} / ({_DUCK_CENT_NORM} * {_DUCK_NORM_Q}) DESC, c.label ASC
        LIMIT {N_PROBE}
    )
    SELECT e.vec_id, e.label,
           round({_DUCK_DOT} / ({_DUCK_NORM_E} * {_DUCK_NORM_Q}), 4) AS cos_sim
    FROM embeddings e JOIN probed USING (label), q
    WHERE e.vec_id != {QUERY_VEC_ID}
    ORDER BY cos_sim DESC, e.vec_id ASC
    LIMIT {TOP_K}
"""


# ---------------------------------------------------------------------------
# ANN recall evaluation: recall@k of the LSH path vs the exact baseline
# ---------------------------------------------------------------------------

# recall@10 over the same 5-query block as ann_batch_topk: coarse enough
# to be stable at sf0.01, fine enough that bucket misses actually show.
K_RECALL = 10


def _recall_query_block(emb: DataFrame) -> DataFrame:
    """The broadcast-sized query block both ledgers evaluate against."""
    return emb.filter(F.col("vec_id") < N_BATCH_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )


def _recall_window():
    from pyspark.sql import Window

    return Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("vec_id")
    )


def _exact_topk(emb: DataFrame, q: DataFrame) -> DataFrame:
    """Exact per-query top-k baseline — shared by BOTH recall ledgers so
    the ground truth (scoring, rounding, tie-break) can never
    desynchronize between them."""
    w = _recall_window()
    return (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id",
            F.round(cosine(F.col("embedding"), F.col("q_embedding")), 4).alias("cos_sim"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= K_RECALL)
        .select("query_id", "vec_id")
    )


def _recall_expr(hit) -> Column:
    """The shared recall ratio rounding (decimal-chain, engine-portable)."""
    return F.round(
        (F.sum(hit) / F.count("*")).cast("decimal(18,10)"), 4
    ).cast("double")


def q_ann_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query recall@k of LSH-bucketed ANN against brute force — the
    "measure, don't guess" companion to ``ann_lsh``: approximate search
    is only shippable with its recall measured on the same corpus.
    Reported for one band (the pre-round-3 path; measured 0.0–0.3
    here), the shipped two-band union, AND the Hamming-1 multi-probe
    path, so both recall levers (more corpus rows vs more query probes)
    are oracle-checked numbers side by side, not claims.

    Plan shape: the query block is broadcast to every path (exact
    scoring crossJoin + banded-bucket joins); each path keeps k rows per
    query via WindowGroupLimit before any shuffle, so the recall joins
    touch ≤ 3·k·|queries| rows regardless of corpus size.  At 100 TB
    this runs on a sampled query block the same way.
    """
    emb = load(spark, sf_dir, "embeddings")
    q = _recall_query_block(emb)
    w = _recall_window()
    exact = _exact_topk(emb, q)

    corpus = emb.select(
        "vec_id", "embedding",
        F.posexplode(lsh_band_keys(F.col("embedding"))).alias("band_id", "bucket"),
    )
    qb = q.select(
        "query_id", "q_embedding",
        F.posexplode(lsh_band_keys(F.col("q_embedding"))).alias(
            "q_band_id", "q_bucket"
        ),
    )

    def lsh_topk(n_bands: int, tag: str) -> DataFrame:
        c = corpus.filter(F.col("band_id") < n_bands)
        qq = qb.filter(F.col("q_band_id") < n_bands)
        return (
            c.join(
                F.broadcast(qq),
                (c.band_id == qq.q_band_id) & (c.bucket == qq.q_bucket),
            )
            .filter(F.col("vec_id") != F.col("query_id"))
            .dropDuplicates(["query_id", "vec_id"])
            .select(
                "query_id", "vec_id",
                F.round(
                    cosine(F.col("embedding"), F.col("q_embedding")), 4
                ).alias("cos_sim"),
            )
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= K_RECALL)
            .select(
                F.col("query_id").alias(f"{tag}_qid"),
                F.col("vec_id").alias(f"{tag}_vid"),
            )
        )

    # third path: single-band Hamming-1 multi-probe (ann_lsh_multiprobe's
    # plan) — corpus NOT exploded, probe fan-out on the broadcast side
    # only.  Probe keys are distinct and each corpus row has one bucket,
    # so no dedup is needed before the top-k window.
    cmp_ = emb.select(
        "vec_id", "embedding",
        lsh_bucket_column(F.col("embedding")).alias("bucket"),
    )
    qmp = (
        q.select(
            "query_id", "q_embedding",
            lsh_bucket_column(F.col("q_embedding")).alias("qb"),
        )
        .select(
            "query_id", "q_embedding",
            F.explode(lsh_probe_keys(F.col("qb"))).alias("probe"),
        )
    )
    h3 = (
        cmp_.join(F.broadcast(qmp), cmp_.bucket == qmp.probe)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id",
            F.round(
                cosine(F.col("embedding"), F.col("q_embedding")), 4
            ).alias("cos_sim"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= K_RECALL)
        .select(
            F.col("query_id").alias("mp_qid"),
            F.col("vec_id").alias("mp_vid"),
        )
    )

    h1, h2 = lsh_topk(1, "b1"), lsh_topk(N_BANDS, "b2")
    joined = (
        exact.join(
            h1,
            (exact.query_id == h1.b1_qid) & (exact.vec_id == h1.b1_vid),
            "left",
        )
        .join(
            h2,
            (exact.query_id == h2.b2_qid) & (exact.vec_id == h2.b2_vid),
            "left",
        )
        .join(
            h3,
            (exact.query_id == h3.mp_qid) & (exact.vec_id == h3.mp_vid),
            "left",
        )
    )
    hit1 = F.when(F.col("b1_vid").isNotNull(), 1).otherwise(0)
    hit2 = F.when(F.col("b2_vid").isNotNull(), 1).otherwise(0)
    hit3 = F.when(F.col("mp_vid").isNotNull(), 1).otherwise(0)
    recall = _recall_expr

    return (
        joined.groupBy("query_id")
        .agg(
            F.count("*").alias("n_exact"),
            F.sum(hit1).alias("n_hits_one_band"),
            F.sum(hit2).alias("n_hits_two_band"),
            F.sum(hit3).alias("n_hits_multiprobe"),
            recall(hit1).alias("recall_one_band"),
            recall(hit2).alias("recall_two_band"),
            recall(hit3).alias("recall_multiprobe"),
        )
        .orderBy("query_id")
    )


ORACLE_ANN_LSH_RECALL = f"""
    WITH bucketed AS (
        SELECT vec_id, embedding,
               {_lsh_sql_duckdb()} AS b0,
               {_lsh_sql_duckdb(seed_prefix='planeB')} AS b1
        FROM embeddings
    ),
    q AS (
        SELECT vec_id AS query_id, embedding, b0, b1
        FROM bucketed WHERE vec_id < {N_BATCH_QUERIES}
    ),
    exact AS (
        SELECT query_id, vec_id FROM (
            SELECT q.query_id, e.vec_id,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY round({_DUCK_DOT} / ({_DUCK_NORM_E} * {_DUCK_NORM_Q}), 4) DESC,
                                e.vec_id ASC
                   ) AS rk
            FROM embeddings e, q
            WHERE e.vec_id != q.query_id
        ) WHERE rk <= {K_RECALL}
    ),
    lsh1 AS (
        SELECT query_id, vec_id FROM (
            SELECT q.query_id, e.vec_id,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY round({_DUCK_DOT} / ({_DUCK_NORM_E} * {_DUCK_NORM_Q}), 4) DESC,
                                e.vec_id ASC
                   ) AS rk
            FROM bucketed e JOIN q ON e.b0 = q.b0
            WHERE e.vec_id != q.query_id
        ) WHERE rk <= {K_RECALL}
    ),
    lsh2 AS (
        SELECT query_id, vec_id FROM (
            SELECT q.query_id, e.vec_id,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY round({_DUCK_DOT} / ({_DUCK_NORM_E} * {_DUCK_NORM_Q}), 4) DESC,
                                e.vec_id ASC
                   ) AS rk
            FROM bucketed e JOIN q ON (e.b0 = q.b0 OR e.b1 = q.b1)
            WHERE e.vec_id != q.query_id
        ) WHERE rk <= {K_RECALL}
    ),
    lshmp AS (
        SELECT query_id, vec_id FROM (
            SELECT q.query_id, e.vec_id,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY round({_DUCK_DOT} / ({_DUCK_NORM_E} * {_DUCK_NORM_Q}), 4) DESC,
                                e.vec_id ASC
                   ) AS rk
            FROM bucketed e JOIN q ON ({_probe_predicate_sql()})
            WHERE e.vec_id != q.query_id
        ) WHERE rk <= {K_RECALL}
    )
    -- CAST wraps each sum: DuckDB sum(INTEGER) yields HUGEINT
    SELECT x.query_id,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(sum(CASE WHEN l1.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hits_one_band,
           CAST(sum(CASE WHEN l2.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hits_two_band,
           CAST(sum(CASE WHEN lm.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hits_multiprobe,
           CAST(round(CAST(sum(CASE WHEN l1.vec_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
                      / count(*) AS DECIMAL(18,10)), 4) AS DOUBLE) AS recall_one_band,
           CAST(round(CAST(sum(CASE WHEN l2.vec_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
                      / count(*) AS DECIMAL(18,10)), 4) AS DOUBLE) AS recall_two_band,
           CAST(round(CAST(sum(CASE WHEN lm.vec_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
                      / count(*) AS DECIMAL(18,10)), 4) AS DOUBLE) AS recall_multiprobe
    FROM exact x
    LEFT JOIN lsh1 l1 ON x.query_id = l1.query_id AND x.vec_id = l1.vec_id
    LEFT JOIN lsh2 l2 ON x.query_id = l2.query_id AND x.vec_id = l2.vec_id
    LEFT JOIN lshmp lm ON x.query_id = lm.query_id AND x.vec_id = lm.vec_id
    GROUP BY x.query_id
    ORDER BY x.query_id
"""


def q_ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query recall@k of the IVF path (n_probe nearest cells) vs the
    exact baseline — the IVF twin of ``ann_lsh_recall``: EVERY
    approximate path ships with its recall measured on the same corpus,
    so the n_probe/centroid-quality trade-off is a number, not a claim.

    Plan shape: centroids and the query block are both tiny — the
    per-query cell ranking runs on a |cells|×|queries| frame; the corpus
    is touched once per path (exact crossJoin + probed-cell join, both
    query sides broadcast) and each path WindowGroupLimits to k rows per
    query before its shuffle, so the recall join is O(k·|queries|) at
    any corpus size.  Cell-similarity ordering compares the 4-decimal
    rounded value (engine-portable tie behavior), label as tie-break.
    """
    from pyspark.sql import Window

    emb = load(spark, sf_dir, "embeddings")
    q = _recall_query_block(emb)
    w = _recall_window()
    exact = _exact_topk(emb, q)

    cents = ivf_centroids(emb)
    wc = Window.partitionBy("query_id").orderBy(F.desc("c_sim"), F.asc("label"))
    probed = (
        cents.crossJoin(F.broadcast(q))
        .select(
            "query_id", "label",
            F.round(cosine(F.col("centroid"), F.col("q_embedding")), 4).alias("c_sim"),
        )
        .withColumn("rk", F.row_number().over(wc))
        .filter(F.col("rk") <= N_PROBE)
        .select("query_id", "label")
    )
    ivf = (
        emb.join(F.broadcast(probed), "label")
        .filter(F.col("vec_id") != F.col("query_id"))
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id", "vec_id",
            F.round(cosine(F.col("embedding"), F.col("q_embedding")), 4).alias("cos_sim"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= K_RECALL)
        .select(
            F.col("query_id").alias("i_qid"), F.col("vec_id").alias("i_vid")
        )
    )
    joined = exact.join(
        ivf,
        (exact.query_id == ivf.i_qid) & (exact.vec_id == ivf.i_vid),
        "left",
    )
    hit = F.when(F.col("i_vid").isNotNull(), 1).otherwise(0)
    return (
        joined.groupBy("query_id")
        .agg(
            F.count("*").alias("n_exact"),
            F.sum(hit).alias("n_hits"),
            _recall_expr(hit).alias("recall_at_k"),
        )
        .orderBy("query_id")
    )


ORACLE_ANN_IVF_RECALL = f"""
    WITH cents AS (
        SELECT label, list(m ORDER BY dim) AS centroid
        FROM (
            SELECT label, dim, avg(v) AS m
            FROM (
                SELECT label, unnest(embedding::DOUBLE[]) AS v,
                       generate_subscripts(embedding, 1) - 1 AS dim
                FROM embeddings
            )
            GROUP BY label, dim
        )
        GROUP BY label
    ),
    q AS (
        SELECT vec_id AS query_id, embedding
        FROM embeddings WHERE vec_id < {N_BATCH_QUERIES}
    ),
    probed AS (
        SELECT query_id, label FROM (
            SELECT q.query_id, c.label,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY round({_DUCK_CENT_DOT} / ({_DUCK_CENT_NORM} * {_DUCK_NORM_Q}), 4) DESC,
                                c.label ASC
                   ) AS rk
            FROM cents c, q
        ) WHERE rk <= {N_PROBE}
    ),
    exact AS (
        SELECT query_id, vec_id FROM (
            SELECT q.query_id, e.vec_id,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY round({_DUCK_DOT} / ({_DUCK_NORM_E} * {_DUCK_NORM_Q}), 4) DESC,
                                e.vec_id ASC
                   ) AS rk
            FROM embeddings e, q
            WHERE e.vec_id != q.query_id
        ) WHERE rk <= {K_RECALL}
    ),
    ivf AS (
        SELECT query_id, vec_id FROM (
            SELECT q.query_id, e.vec_id,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY round({_DUCK_DOT} / ({_DUCK_NORM_E} * {_DUCK_NORM_Q}), 4) DESC,
                                e.vec_id ASC
                   ) AS rk
            FROM embeddings e
            JOIN probed p ON e.label = p.label
            JOIN q ON q.query_id = p.query_id
            WHERE e.vec_id != q.query_id
        ) WHERE rk <= {K_RECALL}
    )
    -- CAST wraps each sum: DuckDB sum(INTEGER) yields HUGEINT
    SELECT x.query_id,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(sum(CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
           CAST(round(CAST(sum(CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
                      / count(*) AS DECIMAL(18,10)), 4) AS DOUBLE) AS recall_at_k
    FROM exact x
    LEFT JOIN ivf i ON x.query_id = i.query_id AND x.vec_id = i.vec_id
    GROUP BY x.query_id
    ORDER BY x.query_id
"""


QUERIES = {
    "ann_brute_force": q_ann_brute_force,
    "ann_batch_topk": q_ann_batch_topk,
    "ann_lsh": q_ann_lsh,
    "ann_lsh_multiprobe": q_ann_lsh_multiprobe,
    "ann_ivf": q_ann_ivf,
    "ann_lsh_recall": q_ann_lsh_recall,
    "ann_ivf_recall": q_ann_ivf_recall,
    "embedding_near_dups": q_embedding_near_dups,
    "embedding_near_dup_stats": q_embedding_near_dup_stats,
}

ORACLE_SQL = {
    "ann_brute_force": ORACLE_ANN_BRUTE_FORCE,
    "ann_batch_topk": ORACLE_ANN_BATCH_TOPK,
    "ann_lsh": ORACLE_ANN_LSH,
    "ann_lsh_multiprobe": ORACLE_ANN_LSH_MULTIPROBE,
    "ann_ivf": ORACLE_ANN_IVF,
    "ann_lsh_recall": ORACLE_ANN_LSH_RECALL,
    "ann_ivf_recall": ORACLE_ANN_IVF_RECALL,
    "embedding_near_dups": ORACLE_EMBEDDING_NEAR_DUPS,
    "embedding_near_dup_stats": ORACLE_EMBEDDING_NEAR_DUP_STATS,
}
