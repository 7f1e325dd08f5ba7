"""Table profiling (graft extension): the one-pass column-statistics
census every ingest pipeline runs before trusting a new drop of data.

The reference validates inputs field-by-field with per-row Python
checks (src/utils/helpers.py:153 ``validate_file_path``, :233
``extract_countries`` region gate); at 100 TB the equivalent health
check is a COLUMN census: null counts, distinct cardinalities, numeric
ranges, string lengths — computed in ONE pass over the table, not one
scan per column.

Scale shape: all per-column aggregates are expressed in a single
``agg(...)`` so Catalyst plans one scan; the multiple exact
``count(distinct)`` terms plan through a single Expand (row
multiplication by #distinct-aggregates, map-side partials intact) —
one wide stage instead of N scans.  At 100 TB the exact distincts
would swap to ``approx_count_distinct`` (HLL — the
``approx_distinct_users`` idiom, mergeable and one-pass); exact is
kept here because it is what a DuckDB twin can hash-check.  The final
unpivot to one row per column is a literal ``stack`` over the single
aggregate row — no second pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load


def profile_table(df: DataFrame,
                  numeric_cols: list[str],
                  string_cols: list[str],
                  timestamp_cols: list[str]) -> DataFrame:
    """One-pass profile: a row per column with
    (column, n_rows, n_nulls, n_distinct, min_num, max_num, avg_len).
    Numeric/timestamp columns report their range as doubles (timestamps
    as epoch seconds); string columns report mean length; the unused
    slots are null."""
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in numeric_cols + string_cols + timestamp_cols:
        aggs.append(F.count(F.col(c)).alias(f"nn_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"nd_{c}"))
    for c in numeric_cols:
        aggs.append(F.min(F.col(c)).cast("double").alias(f"mn_{c}"))
        aggs.append(F.max(F.col(c)).cast("double").alias(f"mx_{c}"))
    for c in timestamp_cols:
        # NTZ has no direct numeric cast; route via TIMESTAMP — the
        # session pins spark.sql.session.timeZone=UTC (session.py), so
        # the wall-clock value maps to the same epoch seconds DuckDB's
        # epoch_ms assigns a naive timestamp
        ts = F.col(c).cast("timestamp").cast("double")
        aggs.append(F.min(ts).alias(f"mn_{c}"))
        aggs.append(F.max(ts).alias(f"mx_{c}"))
    for c in string_cols:
        aggs.append(
            F.round(
                F.avg(F.length(F.col(c)).cast("decimal(18,10)")), 4
            ).cast("double").alias(f"al_{c}")
        )
    one = df.agg(*aggs)

    parts = []
    for c in numeric_cols + timestamp_cols:
        parts.append(
            f"'{c}', nn_{c}, nd_{c}, mn_{c}, mx_{c}, CAST(NULL AS DOUBLE)"
        )
    for c in string_cols:
        parts.append(
            f"'{c}', nn_{c}, nd_{c}, CAST(NULL AS DOUBLE), "
            f"CAST(NULL AS DOUBLE), al_{c}"
        )
    n = len(numeric_cols) + len(string_cols) + len(timestamp_cols)
    stacked = one.select(
        "__rows",
        F.expr(
            f"stack({n}, {', '.join(parts)}) AS "
            "(column, n_non_null, n_distinct, min_num, max_num, avg_len)"
        ),
    )
    return stacked.select(
        F.col("column"),
        F.col("__rows").alias("n_rows"),
        (F.col("__rows") - F.col("n_non_null")).alias("n_nulls"),
        "n_distinct",
        "min_num",
        "max_num",
        "avg_len",
    ).orderBy("column")


ORDERS_NUMERIC = ["o_orderkey", "o_custkey", "o_totalprice"]
ORDERS_STRING = ["o_orderstatus", "o_orderpriority"]
ORDERS_TIMESTAMP = ["o_orderdate"]


def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver surface: the full-column profile of the orders table."""
    return profile_table(
        load(spark, sf_dir, "orders"),
        ORDERS_NUMERIC,
        ORDERS_STRING,
        ORDERS_TIMESTAMP,
    )


def _profile_sql_duckdb() -> str:
    selects = []
    for c in ORDERS_NUMERIC:
        selects.append(f"""
    SELECT '{c}' AS "column", count(*) AS n_rows,
           count(*) - count({c}) AS n_nulls,
           count(DISTINCT {c}) AS n_distinct,
           CAST(min({c}) AS DOUBLE) AS min_num,
           CAST(max({c}) AS DOUBLE) AS max_num,
           CAST(NULL AS DOUBLE) AS avg_len
    FROM orders""")
    for c in ORDERS_TIMESTAMP:
        selects.append(f"""
    SELECT '{c}', count(*), count(*) - count({c}), count(DISTINCT {c}),
           CAST(epoch_ms(min({c})) AS DOUBLE) / 1000,
           CAST(epoch_ms(max({c})) AS DOUBLE) / 1000,
           CAST(NULL AS DOUBLE)
    FROM orders""")
    for c in ORDERS_STRING:
        selects.append(f"""
    SELECT '{c}', count(*), count(*) - count({c}), count(DISTINCT {c}),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           CAST(round(avg(CAST(len({c}) AS DECIMAL(18,10))), 4) AS DOUBLE)
    FROM orders""")
    body = "\n    UNION ALL".join(selects)
    return f'{body}\n    ORDER BY "column"'


ORACLE_SQL = {
    "table_profile": _profile_sql_duckdb(),
}

QUERIES = {
    "table_profile": q_table_profile,
}
