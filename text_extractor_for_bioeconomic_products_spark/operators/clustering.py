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


def assign_clusters(emb: DataFrame, centroids: dict[int, list[float]]) -> DataFrame:
    """Nearest-centroid assignment — a pure narrow map (centroids are
    literals, no shuffle).  Ties on distance take the smaller cid."""
    best = F.array_min(
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


def kmeans_fit_predict(
    emb: DataFrame, k: int = K, iters: int = ITERS
) -> DataFrame:
    """``iters`` Lloyd assignment passes with ``iters-1`` centroid
    updates in between; init = the k smallest vec_ids' vectors."""
    init_rows = (
        emb.filter(F.col("vec_id") < k).select("vec_id", "embedding").collect()
    )
    centroids = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]] for r in init_rows
    }
    asg = assign_clusters(emb, centroids)
    for _ in range(iters - 1):
        centroids = update_centroids(emb, asg)
        asg = assign_clusters(emb, centroids)
    return asg


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

ORACLE_SQL = {
    "kmeans_clusters": ORACLE_KMEANS,
}

QUERIES = {
    "kmeans_clusters": q_kmeans_clusters,
}
