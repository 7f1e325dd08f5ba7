"""Output sinks mirroring the reference's export surface (SURVEY §2.1).

S8 JSON envelope, S9 exploding CSV (explode_outer — a product with no
uses still emits one row, batch_process.py:162-171), parquet defaults.
XML/HTML (S11) are presentation-only and intentionally out of scope; the
JSON sink covers their data contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_spans_csv(spans: DataFrame, path: str) -> None:
    """S9 exploding CSV (export_manager.py:186-249): one row per
    (span, use); empty-uses spans kept via explode_outer.  Array columns
    are joined for CSV flatness, mirroring the reference's ';'-joined
    list cells (batch_process.py:166)."""
    (
        spans
        .withColumn("uso", F.explode_outer("tipos_uso"))
        .withColumn("paises_str", F.array_join("paises", ";"))
        .drop("tipos_uso", "paises")
        .orderBy("conv_id", "turn_idx", "span_seq")
        .write.mode("overwrite")
        .option("header", True)
        .csv(path)
    )


def write_spans_json(spans: DataFrame, path: str) -> None:
    """S8 JSON sink (export_manager.py:164-184): per-record JSON lines;
    the reference's export_info envelope becomes a _meta column on each
    line (envelope totals are derivable — no driver-side collect)."""
    (
        spans
        .withColumn(
            "_meta",
            F.struct(F.lit("product_spans").alias("export"), F.lit(1).alias("version")),
        )
        .write.mode("overwrite")
        .json(path)
    )


def write_turns_parquet(turns: DataFrame, path: str, n_buckets: int = 64) -> None:
    """Default analytic sink: bucket-partitioned parquet so downstream
    per-conversation work prunes partitions (Iceberg table swap-in point)."""
    (
        turns.withColumn(
            "bucket", F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int")
        )
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )
