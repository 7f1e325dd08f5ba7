"""Distributed k-means clustering over the embeddings table (graft
extension: corpus clustering for data curation — semantic bucketing,
per-cluster sampling quotas, topic balance diagnostics).

Lloyd's algorithm, Spark-first: the per-iteration state is ONLY the k×dim
centroid matrix, which is collected to the driver and re-broadcast as
column literals (exactly MLlib's design — driver state is O(k·dim),
independent of corpus size, so 100 TB of vectors stream through a narrow
map per iteration).  The centroid update is one posexplode → groupBy
(cluster, dim) partial-agg shuffle of k·dim running sums — bytes shuffled
are O(partitions · k · dim), not O(rows).

Cross-engine exactness (the DuckDB oracle must hash-match):
* distances sum (x−c)² left-to-right via ``F.aggregate∘zip_with`` — the
  same sequential order as DuckDB's ``list_sum∘list_transform∘list_zip``
  (the idiom the ANN oracles already proved bit-stable);
* centroid means sum DECIMAL(18,6)-rounded components — decimal sums are
  EXACT and partition-order-independent, so Spark's nondeterministic
  partial-agg order cannot perturb the means (a raw double sum would
  diverge between engines and compound across iterations);
* argmin ties break on the smaller cluster id via struct comparison
  (``array_min`` over (dist, cid) structs) == SQL ``ORDER BY d, cid``.

An empty cluster simply drops out of the next round's centroid set in
BOTH formulations (the rebuild uses only observed groups), keeping
parity without a carry-forward rule.

Reference analog: the reference has no clustering; this serves its
"group related products for review" aspiration (src/utils/helpers.py
category grouping) at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load

K = 8
ITERS = 3  # assignment passes; ITERS-1 centroid updates between them
DIM = 64


def _sq_dist(vec: Column, centroid: list[float]) -> Column:
    carr = F.array(*[F.lit(float(v)) for v in centroid])
    return F.aggregate(
        F.zip_with(
            vec, carr,
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def _nearest(centroids: dict[int, list[float]]) -> Column:
    """(dist, cid) struct of the nearest centroid — argmin with ties to
    the smaller cid via struct ordering."""
    return F.array_min(
        F.array(
            *[
                F.struct(
                    _sq_dist(F.col("embedding"), centroids[cid]).alias("d"),
                    F.lit(cid).alias("cid"),
                )
                for cid in sorted(centroids)
            ]
        )
    )


def assign_clusters(emb: DataFrame, centroids: dict[int, list[float]]) -> DataFrame:
    """Nearest-centroid assignment — a pure narrow map (centroids are
    literals, no shuffle).  Ties on distance take the smaller cid.
    An empty centroid set (empty/filtered-out corpus — a legitimate
    partition-level state at scale) yields an empty, correctly-typed
    frame instead of an unevaluable ``array_min(array())``."""
    if not centroids:
        return emb.select(
            "vec_id",
            "label",
            F.lit(None).cast("int").alias("cluster"),
            F.lit(None).cast("double").alias("dist"),
        ).where(F.lit(False))
    best = _nearest(centroids)
    return emb.select(
        "vec_id",
        "label",
        best["cid"].alias("cluster"),
        best["d"].alias("dist"),
    )


def update_centroids(emb: DataFrame, asg: DataFrame) -> dict[int, list[float]]:
    """Per-dimension means of each cluster's members.  Components are
    rounded to 6 decimals and summed as DECIMAL(18,6) (exact,
    order-independent), then divided in double — bit-identical to the
    oracle's formulation.  Collects k·dim rows (bounded)."""
    rows = (
        asg.select("vec_id", "cluster")
        .join(emb.select("vec_id", "embedding"), "vec_id")
        .select("cluster", F.posexplode("embedding").alias("dim", "v"))
        .groupBy("cluster", "dim")
        .agg(
            (
                F.sum(F.round(F.col("v").cast("double"), 6).cast("decimal(18,6)"))
                .cast("double")
                / F.count("*")
            ).alias("m")
        )
        .collect()
    )
    cents: dict[int, dict[int, float]] = {}
    for r in rows:
        cents.setdefault(r["cluster"], {})[r["dim"]] = r["m"]
    return {
        cid: [dims[i] for i in sorted(dims)] for cid, dims in cents.items()
    }


def kmeans_fit(
    emb: DataFrame, k: int = K, iters: int = ITERS
) -> dict[int, list[float]]:
    """Fit ``iters`` Lloyd assignment passes with ``iters-1`` centroid
    updates in between (init = the k smallest vec_ids' vectors) and
    return the FINAL centroid dict — the O(k·dim) model state, so
    callers can re-derive the final assignment as a narrow map that
    keeps whatever columns they need (e.g. the embedding itself for
    semantic dedup) without re-running the fit."""
    init_rows = (
        emb.filter(F.col("vec_id") < k).select("vec_id", "embedding").collect()
    )
    centroids = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]] for r in init_rows
    }
    for _ in range(iters - 1):
        asg = assign_clusters(emb, centroids)
        centroids = update_centroids(emb, asg)
    return centroids


def kmeans_fit_predict(
    emb: DataFrame, k: int = K, iters: int = ITERS
) -> DataFrame:
    """``iters`` Lloyd assignment passes with ``iters-1`` centroid
    updates in between; init = the k smallest vec_ids' vectors."""
    return assign_clusters(emb, kmeans_fit(emb, k, iters))


# Semantic dedup (SemDeDup, Abbas et al. 2023, arXiv:2303.09540): k-means
# buckets the corpus by topic, then duplicates are detected ONLY within a
# cluster — the pair join is cluster-local, so the all-pairs O(n²) the
# naive formulation needs collapses to O(Σ c_i²).  At 100 TB the knob is
# k: grow it with the corpus (k ≈ n / target_cluster_size) so per-cluster
# pair work stays bounded; cluster_size ships in the output so skew is
# observable, not guessed (same discipline as the near-dup ledgers).
# Threshold 0.28 = this corpus's "suspiciously close" tail, shared with
# similarity.NEAR_DUP_THRESHOLD.
SEM_DUP_THRESHOLD = 0.28


def semantic_dedup(
    emb: DataFrame,
    k: int = K,
    iters: int = ITERS,
    threshold: float = SEM_DUP_THRESHOLD,
) -> DataFrame:
    """Per-vector keep/drop decision: drop a vector when a SAME-CLUSTER
    vector with a smaller vec_id is closer than ``threshold`` cosine —
    the deterministic "keep the first" rule the exact-dedup family uses,
    applied to semantic (embedding-space) duplicates.

    Plan: final k-means assignment is a narrow map (centroid literals);
    the pair join shuffles both sides once on the cluster key and the
    per-victim max aggregates on vec_id.  Output: one row per vector
    with its cluster, the cluster's size, the max cosine to any
    lower-id cluster-mate (NULL when none), and the keep flag.
    """
    from .similarity import cosine

    centroids = kmeans_fit(emb, k, iters)
    if not centroids:  # empty corpus → empty, correctly-typed result
        cluster = F.lit(None).cast("int").alias("cluster")
        keyed = emb.select("vec_id", "embedding", cluster).where(F.lit(False))
    else:
        keyed = emb.select(
            "vec_id", "embedding", _nearest(centroids)["cid"].alias("cluster")
        )
    sizes = keyed.groupBy("cluster").agg(F.count("*").alias("cluster_size"))
    a = keyed.select(
        "cluster",
        F.col("vec_id").alias("vid_a"),
        F.col("embedding").alias("emb_a"),
    )
    b = keyed.select(
        "cluster",
        F.col("vec_id").alias("vid_b"),
        F.col("embedding").alias("emb_b"),
    )
    sim = F.round(cosine(F.col("emb_a"), F.col("emb_b")), 4)
    lower_max = (
        a.join(b, "cluster")
        .filter(F.col("vid_a") < F.col("vid_b"))
        .select(F.col("vid_b").alias("vec_id"), sim.alias("s"))
        .groupBy("vec_id")
        .agg(F.max("s").alias("max_sim_lower"))
    )
    return (
        keyed.select("vec_id", "cluster")
        .join(F.broadcast(sizes), "cluster")
        .join(lower_max, "vec_id", "left")
        .select(
            "vec_id",
            "cluster",
            "cluster_size",
            "max_sim_lower",
            F.when(F.col("max_sim_lower") > threshold, F.lit(0))
            .otherwise(F.lit(1))
            .alias("keep"),
        )
        .orderBy("vec_id")
    )


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return semantic_dedup(load(spark, sf_dir, "embeddings"))


# IVF over the LEARNED quantizer: similarity.ann_ivf probes cells derived
# from the label column, standing in for "k-means assignments computed
# once offline" (its own docstring).  This query closes that loop: the
# coarse quantizer IS the Lloyd fit above (same oracle-exact centroids),
# so the claim is an implemented, driver-checked path, not a comment.
N_PROBE_KMEANS = 2
TOP_K_KMEANS = 10


def ann_ivf_kmeans_topk(
    emb: DataFrame,
    query_vec_id: int = 0,
    topk: int = TOP_K_KMEANS,
    k: int = K,
    iters: int = ITERS,
    n_probe: int = N_PROBE_KMEANS,
) -> DataFrame:
    """IVF ANN with a k-means coarse quantizer: fit k cells (O(k·dim)
    driver state), assign the corpus as a NARROW map (centroid
    literals), rank cells against the query (k-row frame, broadcast),
    exact-search only the n_probe nearest cells.

    At 100 TB: the fit runs once offline; per query the corpus is
    touched only for rows whose cell survives the probe — the scan
    prunes on the cell key when the assignment is materialized as a
    partition column.
    """
    from .similarity import cosine

    cents = kmeans_fit(emb, k, iters)
    if not cents:  # empty corpus → empty, correctly-typed result
        return emb.select(
            "vec_id",
            "label",
            F.lit(None).cast("double").alias("cos_sim"),
        ).where(F.lit(False))
    asg = emb.select(
        "vec_id", "label", "embedding", _nearest(cents)["cid"].alias("cell")
    )
    q = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_embedding")
    )
    cents_df = emb.sparkSession.createDataFrame(
        [(cid, cents[cid]) for cid in sorted(cents)],
        "cell int, centroid array<double>",
    )
    probed = (
        cents_df.crossJoin(F.broadcast(q))
        .select(
            "cell",
            cosine(F.col("centroid"), F.col("q_embedding")).alias("c_sim"),
        )
        .orderBy(F.desc("c_sim"), F.asc("cell"))
        .limit(n_probe)
        .select("cell")
    )
    cands = asg.join(F.broadcast(probed), "cell").filter(
        F.col("vec_id") != query_vec_id
    )
    return (
        cands.crossJoin(F.broadcast(q))
        .select(
            "vec_id", "label",
            F.round(
                cosine(F.col("embedding"), F.col("q_embedding")), 4
            ).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(topk)
    )


def q_ann_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ann_ivf_kmeans_topk(load(spark, sf_dir, "embeddings"))


def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector cluster assignment after 3 Lloyd iterations (k=8,
    deterministic smallest-vec_id init)."""
    emb = load(spark, sf_dir, "embeddings")
    asg = kmeans_fit_predict(emb)
    return (
        asg.select(
            "vec_id",
            "label",
            "cluster",
            F.round("dist", 4).alias("dist"),
        )
        .orderBy("vec_id")
    )


_D = (
    "list_sum(list_transform(list_zip(e.embedding::DOUBLE[], c.c),"
    " x -> (x[1]-x[2])*(x[1]-x[2])))"
)

_ASSIGN = """
    d{n} AS (
        SELECT e.vec_id, c.cid, {dist} AS d
        FROM embeddings e CROSS JOIN {cents} c
    ),
    a{n} AS (
        SELECT vec_id, cid, d FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
            FROM d{n}
        ) WHERE rn = 1
    )
"""

_UPDATE = """
    c{n} AS (
        SELECT cid, list(m ORDER BY dim) AS c FROM (
            SELECT a.cid AS cid, r.range AS dim,
                   CAST(SUM(CAST(round(e.embedding[r.range]::DOUBLE, 6)
                                 AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS m
            FROM a{prev} a
            JOIN embeddings e ON e.vec_id = a.vec_id
            CROSS JOIN range(1, {dimp1}) r
            GROUP BY a.cid, r.range
        ) GROUP BY cid
    )
"""

ORACLE_KMEANS = (
    "WITH init AS (\n"
    f"    SELECT vec_id AS cid, embedding::DOUBLE[] AS c\n"
    f"    FROM embeddings WHERE vec_id < {K}\n"
    "),"
    + _ASSIGN.format(n=1, dist=_D, cents="init")
    + ","
    + _UPDATE.format(n=2, prev=1, dimp1=DIM + 1)
    + ","
    + _ASSIGN.format(n=2, dist=_D, cents="c2")
    + ","
    + _UPDATE.format(n=3, prev=2, dimp1=DIM + 1)
    + ","
    + _ASSIGN.format(n=3, dist=_D, cents="c3")
    + """
    SELECT a.vec_id, e.label, a.cid AS cluster, round(a.d, 4) AS dist
    FROM a3 a JOIN embeddings e ON e.vec_id = a.vec_id
    ORDER BY a.vec_id
"""
)

# the shared Lloyd CTE chain (init → a1 → c2 → a2 → c3 → a3), reused by
# the semantic-dedup oracle so the two queries can never disagree on the
# clustering itself
_LLOYD_CTES = (
    "WITH init AS (\n"
    f"    SELECT vec_id AS cid, embedding::DOUBLE[] AS c\n"
    f"    FROM embeddings WHERE vec_id < {K}\n"
    "),"
    + _ASSIGN.format(n=1, dist=_D, cents="init")
    + ","
    + _UPDATE.format(n=2, prev=1, dimp1=DIM + 1)
    + ","
    + _ASSIGN.format(n=2, dist=_D, cents="c2")
    + ","
    + _UPDATE.format(n=3, prev=2, dimp1=DIM + 1)
    + ","
    + _ASSIGN.format(n=3, dist=_D, cents="c3")
)

_SEM_DOT = (
    "list_sum(list_transform(list_zip(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]),"
    " x -> x[1] * x[2]))"
)
_SEM_NA = "sqrt(list_sum(list_transform(ea.embedding::DOUBLE[], x -> x*x)))"
_SEM_NB = "sqrt(list_sum(list_transform(eb.embedding::DOUBLE[], x -> x*x)))"

ORACLE_SEMANTIC_DEDUP = (
    _LLOYD_CTES
    + f"""
    , sized AS (SELECT cid, count(*) AS cluster_size FROM a3 GROUP BY cid),
    pairs AS (
        SELECT b.vec_id AS vec_id,
               round({_SEM_DOT} / ({_SEM_NA} * {_SEM_NB}), 4) AS s
        FROM a3 a
        JOIN a3 b ON a.cid = b.cid AND a.vec_id < b.vec_id
        JOIN embeddings ea ON ea.vec_id = a.vec_id
        JOIN embeddings eb ON eb.vec_id = b.vec_id
    ),
    lm AS (SELECT vec_id, max(s) AS max_sim_lower FROM pairs GROUP BY vec_id)
    SELECT k.vec_id, k.cid AS cluster, s.cluster_size, lm.max_sim_lower,
           CASE WHEN lm.max_sim_lower > {SEM_DUP_THRESHOLD} THEN 0 ELSE 1 END
               AS keep
    FROM a3 k
    JOIN sized s ON s.cid = k.cid
    LEFT JOIN lm ON lm.vec_id = k.vec_id
    ORDER BY k.vec_id
"""
)

# c3's centroid column is `c` (DOUBLE[]); q's is embeddings.embedding
_IVFK_CENT_DOT = (
    "list_sum(list_transform(list_zip(c.c, q.embedding::DOUBLE[]),"
    " x -> x[1] * x[2]))"
)
_IVFK_CENT_NORM = "sqrt(list_sum(list_transform(c.c, x -> x*x)))"
_IVFK_Q_NORM = (
    "sqrt(list_sum(list_transform(q.embedding::DOUBLE[], x -> x*x)))"
)
_IVFK_DOT = (
    "list_sum(list_transform(list_zip(e.embedding::DOUBLE[], q.embedding::DOUBLE[]),"
    " x -> x[1] * x[2]))"
)
_IVFK_E_NORM = (
    "sqrt(list_sum(list_transform(e.embedding::DOUBLE[], x -> x*x)))"
)

ORACLE_ANN_IVF_KMEANS = (
    _LLOYD_CTES
    + f"""
    , q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
    probed AS (
        SELECT c.cid AS cell
        FROM c3 c, q
        ORDER BY {_IVFK_CENT_DOT} / ({_IVFK_CENT_NORM} * {_IVFK_Q_NORM}) DESC,
                 c.cid ASC
        LIMIT {N_PROBE_KMEANS}
    )
    SELECT e.vec_id, e.label,
           round({_IVFK_DOT} / ({_IVFK_E_NORM} * {_IVFK_Q_NORM}), 4) AS cos_sim
    FROM a3 a
    JOIN probed p ON a.cid = p.cell
    JOIN embeddings e ON e.vec_id = a.vec_id, q
    WHERE e.vec_id != 0
    ORDER BY cos_sim DESC, e.vec_id ASC
    LIMIT {TOP_K_KMEANS}
"""
)

# ---------------------------------------------------------------------------
# Product quantization (PQ) ANN with asymmetric distance (ADC)
# ---------------------------------------------------------------------------
#
# Jégou et al., "Product Quantization for Nearest Neighbor Search"
# (TPAMI 2011): split the vector into M subspaces, k-means each subspace
# into a tiny codebook, store each vector as M one-byte codes.  At 100 TB
# this is THE memory lever — 64 float32 (256 B) → M=4 codes (4 B), 64×
# compression — and ADC scoring reads only the code table: the query
# computes one M×k distance table, every corpus distance is M lookups.
# Codebooks are the oracle-exact Lloyd fit per subspace (the learned-
# quantizer discipline ann_ivf_kmeans established: quality of the
# quantizer IS the recall lever), and like every approximate path in
# this engine it ships with measured recall (ann_pq_recall), not claims.
PQ_SUB = 4
PQ_SUBDIM = DIM // PQ_SUB
PQ_CODEBOOK_K = 8
PQ_ITERS = 2


def _sq_dist_cols(a: Column, b: Column) -> Column:
    """Σ(a−b)² between two array columns, summed left-to-right — the
    zip_with idiom the DuckDB oracles reproduce bit-for-bit."""
    return F.aggregate(
        F.zip_with(
            a, b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def pq_fit(emb: DataFrame) -> list[dict[int, list[float]]]:
    """One Lloyd codebook per subspace, each fit on the sliced vectors
    (same init/update/parity rules as kmeans_fit — driver state is
    M·k·subdim floats)."""
    books = []
    for m in range(PQ_SUB):
        sub = emb.select(
            "vec_id",
            F.lit(0).alias("label"),
            F.slice("embedding", m * PQ_SUBDIM + 1, PQ_SUBDIM).alias(
                "embedding"
            ),
        )
        books.append(kmeans_fit(sub, k=PQ_CODEBOOK_K, iters=PQ_ITERS))
    return books


def pq_encode(emb: DataFrame, books: list[dict[int, list[float]]]) -> DataFrame:
    """vec_id + M code columns — a pure narrow map (codebooks ride as
    literals; nearest codeword per subspace, ties to the smaller cid)."""
    cols = []
    for m, book in enumerate(books):
        sl = F.slice("embedding", m * PQ_SUBDIM + 1, PQ_SUBDIM)
        best = F.array_min(
            F.array(
                *[
                    F.struct(
                        _sq_dist(sl, book[cid]).alias("d"),
                        F.lit(cid).alias("cid"),
                    )
                    for cid in sorted(book)
                ]
            )
        )
        cols.append(best["cid"].alias(f"code_{m}"))
    return emb.select("vec_id", *cols)


def q_ann_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query recall@k of PQ-ADC search vs the exact L2 baseline (PQ
    approximates Euclidean distance, so its ledger's ground truth is L2
    — scoring/rounding/tie conventions otherwise identical to the
    cosine ledgers).  Plan shape: codebook fit collects only M·k·subdim
    floats; encoding is narrow; ADC scoring is a broadcast crossJoin of
    the query block against the CODE table (M ints per corpus row — the
    corpus vectors themselves are never re-read at query time, PQ's
    whole point); both paths WindowGroupLimit to k rows per query
    before the recall join."""
    from .similarity import K_RECALL, N_BATCH_QUERIES

    emb = load(spark, sf_dir, "embeddings")
    books = pq_fit(emb)
    codes = pq_encode(emb, books)
    q = emb.filter(F.col("vec_id") < N_BATCH_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.asc("d"), F.asc("vec_id"))

    adc = None
    for m, book in enumerate(books):
        qs = F.slice("q_embedding", m * PQ_SUBDIM + 1, PQ_SUBDIM)
        branch = None
        for cid in sorted(book):
            d_m = _sq_dist(qs, book[cid])
            branch = (
                F.when(F.col(f"code_{m}") == cid, d_m)
                if branch is None
                else branch.when(F.col(f"code_{m}") == cid, d_m)
            )
        adc = branch if adc is None else adc + branch
    pq_top = (
        codes.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", F.round(adc, 4).alias("d"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= K_RECALL)
        .select("query_id", "vec_id")
        .withColumn("hit", F.lit(1))
    )
    exact = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                _sq_dist_cols(F.col("embedding"), F.col("q_embedding")), 4
            ).alias("d"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= K_RECALL)
        .select("query_id", "vec_id")
    )
    return (
        exact.join(pq_top, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("*").alias("n_exact"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hits"),
            F.round(
                (
                    F.sum(F.coalesce(F.col("hit"), F.lit(0)))
                    / F.count("*")
                ).cast("decimal(18,10)"),
                4,
            ).cast("double").alias("recall_at_k"),
        )
        .orderBy("query_id")
    )


def _pq_chain_sql(m: int) -> str:
    """The per-subspace Lloyd chain (init → assign → update → assign),
    over list_slice of the embedding — the ORACLE_KMEANS templates
    specialized to subspace m."""
    lo = m * PQ_SUBDIM + 1
    hi = (m + 1) * PQ_SUBDIM
    sl = f"list_slice(e.embedding::DOUBLE[], {lo}, {hi})"
    dist = (
        f"list_sum(list_transform(list_zip({sl}, c.c),"
        " x -> (x[1]-x[2])*(x[1]-x[2])))"
    )
    return f"""
    init{m} AS (
        SELECT vec_id AS cid, list_slice(embedding::DOUBLE[], {lo}, {hi}) AS c
        FROM embeddings WHERE vec_id < {PQ_CODEBOOK_K}
    ),
    d{m}_1 AS (
        SELECT e.vec_id, c.cid, {dist} AS d
        FROM embeddings e CROSS JOIN init{m} c
    ),
    a{m}_1 AS (
        SELECT vec_id, cid FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
            FROM d{m}_1
        ) WHERE rn = 1
    ),
    b{m} AS (
        SELECT cid, list(mn ORDER BY dim) AS c FROM (
            SELECT a.cid AS cid, r.range AS dim,
                   CAST(SUM(CAST(round(e.embedding[r.range + {lo - 1}]::DOUBLE, 6)
                                 AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS mn
            FROM a{m}_1 a
            JOIN embeddings e ON e.vec_id = a.vec_id
            CROSS JOIN range(1, {PQ_SUBDIM + 1}) r
            GROUP BY a.cid, r.range
        ) GROUP BY cid
    ),
    d{m}_2 AS (
        SELECT e.vec_id, c.cid, {dist} AS d
        FROM embeddings e CROSS JOIN b{m} c
    ),
    a{m}_2 AS (
        SELECT vec_id, cid AS code_{m} FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
            FROM d{m}_2
        ) WHERE rn = 1
    )"""


def _pq_oracle_sql() -> str:
    from .similarity import K_RECALL, N_BATCH_QUERIES

    chains = ",".join(_pq_chain_sql(m) for m in range(PQ_SUB))
    code_joins = " ".join(
        f"JOIN a{m}_2 USING (vec_id)" for m in range(1, PQ_SUB)
    )
    adc_terms = " + ".join(
        f"list_sum(list_transform(list_zip("
        f"list_slice(q.embedding::DOUBLE[], {m * PQ_SUBDIM + 1}, {(m + 1) * PQ_SUBDIM}),"
        f" bb{m}.c), x -> (x[1]-x[2])*(x[1]-x[2])))"
        for m in range(PQ_SUB)
    )
    book_joins = " ".join(
        f"JOIN b{m} bb{m} ON bb{m}.cid = cd.code_{m}" for m in range(PQ_SUB)
    )
    exact_d = (
        "list_sum(list_transform(list_zip(e.embedding::DOUBLE[],"
        " q.embedding::DOUBLE[]), x -> (x[1]-x[2])*(x[1]-x[2])))"
    )
    return f"""
    WITH {chains},
    codes AS (
        SELECT * FROM a0_2 {code_joins}
    ),
    q AS (
        SELECT vec_id AS query_id, embedding
        FROM embeddings WHERE vec_id < {N_BATCH_QUERIES}
    ),
    pq_top AS (
        SELECT query_id, vec_id FROM (
            SELECT q.query_id, cd.vec_id,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY round({adc_terms}, 4) ASC, cd.vec_id ASC
                   ) AS rk
            FROM codes cd {book_joins}
            CROSS JOIN q
            WHERE cd.vec_id != q.query_id
        ) WHERE rk <= {K_RECALL}
    ),
    exact AS (
        SELECT query_id, vec_id FROM (
            SELECT q.query_id, e.vec_id,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY round({exact_d}, 4) ASC, e.vec_id ASC
                   ) AS rk
            FROM embeddings e, q
            WHERE e.vec_id != q.query_id
        ) WHERE rk <= {K_RECALL}
    )
    SELECT x.query_id,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(sum(CASE WHEN p.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
           CAST(round(CAST(sum(CASE WHEN p.vec_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
                      / count(*) AS DECIMAL(18,10)), 4) AS DOUBLE) AS recall_at_k
    FROM exact x
    LEFT JOIN pq_top p ON x.query_id = p.query_id AND x.vec_id = p.vec_id
    GROUP BY x.query_id
    ORDER BY x.query_id
"""


# ---------------------------------------------------------------------------
# Distributed PCA (moment aggregation on the cluster, eigh on the driver)
# ---------------------------------------------------------------------------
#
# The MLlib RowMatrix.computePrincipalComponents design: the corpus never
# leaves the executors — each partition folds its rows into (n, Σx, ΣxxT)
# with one Arrow pass, the d+d² moment entries reduce by a position-keyed
# sum (≤ (d²+d)·partitions tiny rows through the shuffle, never vectors),
# and only the d×d covariance reaches the driver for numpy's eigh.
# Driver state is O(d²), corpus-size-independent.  At 100 TB this is the
# only sane PCA: d=64 ⇒ 4160 doubles per partition summary.

PCA_DIM = 64
PCA_K = 8


def pca_fit(emb: DataFrame, dim: int = PCA_DIM, k: int = PCA_K) -> dict:
    """Fit PCA over an `embedding` array column.  Returns mean, top-k
    components (rows = components), eigenvalues (descending), the
    covariance trace, and n — everything downstream projection and
    whitening need."""
    import numpy as np
    import pandas as pd

    def partial(batches):
        n = 0
        s = np.zeros(dim)
        ss = np.zeros((dim, dim))
        for pdf in batches:
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            n += m.shape[0]
            s += m.sum(axis=0)
            ss += m.T @ m
        if n:
            # n rides as moment position 0, so ONE position-keyed sum
            # reduces count and moments together (single job)
            yield pd.DataFrame(
                {
                    "moments": [
                        np.concatenate([[float(n)], s, ss.ravel()]).tolist()
                    ]
                }
            )

    parts = emb.select("embedding").mapInPandas(
        partial, schema="moments array<double>"
    )
    # position-keyed reduce: the shuffle carries moment ENTRIES, not vectors
    reduced = (
        parts.select(F.posexplode("moments").alias("pos", "v"))
        .groupBy("pos")
        .agg(F.sum("v").alias("v"))
        .collect()
    )
    if not reduced:
        raise ValueError("pca_fit: empty input")
    flat = np.zeros(1 + dim + dim * dim)
    for r in reduced:
        flat[r["pos"]] = r["v"]
    n = int(flat[0])
    s, ss = flat[1 : 1 + dim], flat[1 + dim :].reshape(dim, dim)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    trace = float(np.trace(cov))
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigvals)[::-1]
    eigvals = np.maximum(eigvals[order], 0.0)
    components = eigvecs[:, order].T[:k]  # (k, dim)
    return {
        "n": n,
        "mean": mean,
        "trace": trace,
        "eigvals": eigvals,
        "components": components,
    }


def pca_project(emb: DataFrame, fit: dict) -> DataFrame:
    """Narrow map: vec_id + the k-dim projection (centered · componentsᵀ).
    Components/mean ride as task-closure constants — no shuffle, no join."""
    import numpy as np
    import pandas as pd

    comps = fit["components"]
    mean = fit["mean"]

    def project(batches):
        for pdf in batches:
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            pc = (m - mean) @ comps.T
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "pc": list(pc)}
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        project, schema="vec_id long, pc array<double>"
    )


def q_embedding_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA over the embeddings table.  Oracle-ability follows the sketch
    idiom: the eigendecomposition is driver-side numpy (DuckDB has no
    linalg), so the hashed output carries what BOTH engines can compute
    exactly — n and the covariance TRACE (= Σ per-dim population
    variance, which end-to-end validates the distributed moment
    pipeline the eigensolve consumes) — plus invariant flags computed
    from the real spectrum: eigenvalues non-increasing, Σλ == trace
    (1e-6 relative), and top-k capturing a sane (0,1] variance share.
    The eigen math itself is pinned by the numpy-oracle pytest."""
    emb = load(spark, sf_dir, "embeddings")
    fit = pca_fit(emb)
    ev = fit["eigvals"]
    noninc = bool(all(ev[i] >= ev[i + 1] - 1e-12 for i in range(len(ev) - 1)))
    sum_ok = bool(abs(float(ev.sum()) - fit["trace"]) <= 1e-6 * max(fit["trace"], 1e-12))
    evr_k = float(ev[:PCA_K].sum() / fit["trace"]) if fit["trace"] > 0 else 0.0
    evr_ok = bool(0.0 < evr_k <= 1.0 + 1e-9)
    return spark.createDataFrame(
        [(fit["n"], round(fit["trace"], 4), noninc, sum_ok, evr_ok)],
        "n_vectors long, total_variance double, eig_nonincreasing boolean, "
        "eig_sum_matches_trace boolean, topk_evr_in_unit boolean",
    )


def _pca_trace_sql_duckdb(dim: int = PCA_DIM) -> str:
    # population variance per dim from the same raw moments the Spark
    # side folds: Σx²/n − mean² (NOT var_samp/var_pop built-ins, whose
    # Welford accumulation order could diverge in the 4th decimal)
    terms = " + ".join(
        f"(sum(embedding[{i + 1}]::DOUBLE * embedding[{i + 1}]::DOUBLE) / count(*)"
        f" - pow(sum(embedding[{i + 1}]::DOUBLE) / count(*), 2))"
        for i in range(dim)
    )
    return terms


ORACLE_EMBEDDING_PCA = f"""
    SELECT count(*) AS n_vectors,
           CAST(round(CAST({_pca_trace_sql_duckdb()} AS DECIMAL(18,10)), 4)
                AS DOUBLE) AS total_variance,
           TRUE AS eig_nonincreasing,
           TRUE AS eig_sum_matches_trace,
           TRUE AS topk_evr_in_unit
    FROM embeddings
"""


# ---------------------------------------------------------------------------
# Label-centroid separation census
# ---------------------------------------------------------------------------


def centroid_similarity_census(
    emb: DataFrame, key_col: str = "label", dim: int = PCA_DIM
) -> DataFrame:
    """Pairwise cosine similarity between per-group embedding centroids —
    the separation diagnostic a mixture/quantizer design is tuned
    against (this census's label geometry is exactly what drove the
    `ann_ivf_kmeans` finding: label cells recall 0.3 vs 1.0 for learned
    cells — here that difference is visible as high inter-label
    centroid similarity).

    Scale shape (the `embedding_pca` moment discipline): vectors reduce
    position-keyed — posexplode feeds a map-side-partial sum/count per
    (group, position), ≤ |groups|·dim rows through the exchange
    regardless of corpus size; the pairwise stage runs on the
    |groups|-row centroid frame (|groups|² work, corpus-independent).
    The dot/norm folds iterate positions in fixed ascending order on
    BOTH engines (left-to-right association), so the doubles agree
    bit-for-bit given equal centroids.
    """
    from pyspark.sql import Window

    cells = (
        emb.select(key_col, F.posexplode("embedding").alias("pos", "v"))
        .groupBy(key_col, "pos")
        .agg(
            (F.sum(F.col("v").cast("double")) / F.count("*")).alias("m"),
            F.count("*").alias("n"),
        )
    )
    cent = cells.groupBy(key_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))),
            lambda s: s.getField("m"),
        ).alias("c"),
        F.max("n").alias("n"),
    )
    a, b = cent.alias("a"), cent.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.c"), F.col("b.c"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )

    def _norm(side):
        return F.sqrt(
            F.aggregate(
                F.transform(F.col(f"{side}.c"), lambda x: x * x),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )

    return (
        a.join(b, F.col(f"a.{key_col}") < F.col(f"b.{key_col}"))
        .select(
            F.col(f"a.{key_col}").alias(f"{key_col}_a"),
            F.col(f"b.{key_col}").alias(f"{key_col}_b"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
            F.round(
                (dot / (_norm("a") * _norm("b"))).cast("decimal(18,10)"), 4
            ).cast("double").alias("cos_sim"),
        )
        .orderBy(f"{key_col}_a", f"{key_col}_b")
    )


def q_label_centroid_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return centroid_similarity_census(load(spark, sf_dir, "embeddings"))


def _centroid_sim_sql_duckdb(dim: int = PCA_DIM) -> str:
    comps = ", ".join(
        f"sum(embedding[{i + 1}]::DOUBLE) / count(*) AS c{i}"
        for i in range(dim)
    )
    dot = " + ".join(f"a.c{i} * b.c{i}" for i in range(dim))
    na = " + ".join(f"a.c{i} * a.c{i}" for i in range(dim))
    nb = " + ".join(f"b.c{i} * b.c{i}" for i in range(dim))
    return f"""
        WITH cent AS (
            SELECT label, count(*) AS n, {comps}
            FROM embeddings GROUP BY label
        )
        SELECT a.label AS label_a, b.label AS label_b,
               a.n AS n_a, b.n AS n_b,
               CAST(round(CAST(({dot}) / (sqrt({na}) * sqrt({nb}))
                    AS DECIMAL(18,10)), 4) AS DOUBLE) AS cos_sim
        FROM cent a JOIN cent b ON a.label < b.label
        ORDER BY label_a, label_b
    """


ORACLE_SQL = {
    "label_centroid_sim": _centroid_sim_sql_duckdb(),
    "embedding_pca": ORACLE_EMBEDDING_PCA,
    "ann_pq_recall": _pq_oracle_sql(),
    "kmeans_clusters": ORACLE_KMEANS,
    "semantic_dedup": ORACLE_SEMANTIC_DEDUP,
    "ann_ivf_kmeans": ORACLE_ANN_IVF_KMEANS,
}

QUERIES = {
    "label_centroid_sim": q_label_centroid_sim,
    "embedding_pca": q_embedding_pca,
    "ann_pq_recall": q_ann_pq_recall,
    "kmeans_clusters": q_kmeans_clusters,
    "semantic_dedup": q_semantic_dedup,
    "ann_ivf_kmeans": q_ann_ivf_kmeans,
}
