#!/usr/bin/env python
"""spark-submit entry for the corpus DATA CARD — the
Datasheets-for-Datasets artifact a training-data release ships: one
deterministic JSON assembling the engine's existing censuses over the
``documents`` table into a single reviewable document.

    python jobs/run_datacard.py --input /root/testdata/sf0.001 \
        --output /tmp/datacard [--master local[8]]

Sections (every number produced by an operator the test suite already
verifies — this job is pure composition, no new semantics):
  schema        per-column profile (profile_table: nulls, distincts,
                ranges, mean lengths)
  composition   per-source doc counts + estimated tokens per lang
  independence  chi-square source×lang cell total (drift diagnostic)
  quality       corpus means: char entropy, Flesch reading ease,
                compression ratio, plus the repetitive/gibberish flags
  duplication   exact-dup census (duplicate docs / groups / distincts)
  concentration per-source doc-count Gini (is the corpus dominated by
                one source?)

Writes ``datacard.json`` (sorted keys — byte-deterministic for the
same input) and prints it as the job's one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_datacard(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from text_extractor_for_bioeconomic_products_spark.operators.dedup import (
        q_dedup_exact,
    )
    from text_extractor_for_bioeconomic_products_spark.operators.profiling import (
        chi_square_cells,
        profile_table,
    )
    from text_extractor_for_bioeconomic_products_spark.operators.relational import (
        gini_concentration,
    )
    from text_extractor_for_bioeconomic_products_spark.operators.textstats import (
        ENTROPY_GIBBERISH_MIN,
        ENTROPY_REPETITIVE_MAX,
        char_entropy_stats,
        doc_readability,
        doc_compression_signal,
    )
    from text_extractor_for_bioeconomic_products_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents").persist()
    try:
        schema_rows = [
            r.asDict()
            for r in profile_table(
                docs, numeric_cols=["doc_id", "n_chars"],
                string_cols=["text", "source", "lang"],
                timestamp_cols=[],
            ).collect()
        ]

        composition = [
            r.asDict()
            for r in docs.groupBy("source", "lang")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum(F.floor(F.length("text") / 4)).alias("est_tokens"),
            )
            .orderBy("source", "lang")
            .collect()
        ]

        chi = chi_square_cells(docs).agg(
            F.round(F.sum(F.col("contribution").cast("decimal(18,6)")), 4)
            .cast("double")
            .alias("chi_square_total"),
            F.count("*").alias("n_cells"),
        ).collect()[0]

        ent = char_entropy_stats(docs)
        quality = ent.agg(
            F.round(F.avg(F.col("entropy_bits").cast("decimal(18,6)")), 4)
            .cast("double")
            .alias("mean_entropy_bits"),
            F.sum(
                F.when(
                    F.col("entropy_bits") < ENTROPY_REPETITIVE_MAX, 1
                ).otherwise(0)
            ).alias("n_repetitive"),
            F.sum(
                F.when(
                    F.col("entropy_bits") > ENTROPY_GIBBERISH_MIN, 1
                ).otherwise(0)
            ).alias("n_gibberish"),
        ).collect()[0].asDict()
        quality["mean_flesch_reading_ease"] = doc_readability(docs).agg(
            F.round(
                F.avg(F.col("flesch_reading_ease").cast("decimal(18,6)")), 4
            ).cast("double").alias("m")
        ).collect()[0]["m"]
        quality["mean_compress_ratio"] = doc_compression_signal(docs).agg(
            F.round(
                F.avg(F.col("compress_ratio").cast("decimal(18,10)")), 4
            ).cast("double").alias("m")
        ).collect()[0]["m"]

        duplication = q_dedup_exact(spark, sf_dir).collect()[0].asDict()

        source_sizes = docs.groupBy("source").agg(
            F.count("*").cast("double").alias("n")
        ).withColumn("k", F.monotonically_increasing_id())
        gini = gini_concentration(
            source_sizes.withColumn("g", F.lit("all")),
            group_col="g", value_col="n", key_col="k",
        ).collect()
        concentration = {
            "n_sources": int(source_sizes.count()),
            "source_size_gini": gini[0]["gini"] if gini else None,
        }
    finally:
        docs.unpersist()

    return {
        "table": "documents",
        "input": os.path.basename(os.path.normpath(sf_dir)),
        "schema": schema_rows,
        "composition": composition,
        "independence": {
            "chi_square_total": chi["chi_square_total"],
            "n_cells": int(chi["n_cells"]),
        },
        "quality": quality,
        "duplication": duplication,
        "concentration": concentration,
        "events": _events_section(spark, sf_dir),
    }


def _events_section(spark, sf_dir: str) -> dict:
    """Time-series half of the card (the ``events`` table): load shape,
    audit, and behavior summaries from the same suite-verified census
    operators."""
    from pyspark.sql import functions as F

    from text_extractor_for_bioeconomic_products_spark.operators.relational import (
        benford_digit_census,
        seasonality_census,
        user_value_trend,
    )
    from text_extractor_for_bioeconomic_products_spark.sources.tables import load

    events = load(spark, sf_dir, "events").persist()
    try:
        season = seasonality_census(events)
        peak = season.orderBy(F.col("n_events").desc(), "dow", "hour").first()
        n_cells = season.count()
        benford = benford_digit_census(events, amount_col="value")
        max_dev = benford.agg(
            F.round(F.max(F.abs(F.col("deviation")).cast("decimal(18,6)")), 6)
            .cast("double")
            .alias("m")
        ).collect()[0]["m"]
        trend = user_value_trend(events)
        trend_summary = trend.agg(
            F.count("*").alias("n_users_with_trend"),
            F.sum(F.when(F.col("slope_per_hour") > 0, 1).otherwise(0)).alias(
                "n_rising"
            ),
            F.sum(F.when(F.col("slope_per_hour") < 0, 1).otherwise(0)).alias(
                "n_falling"
            ),
        ).collect()[0].asDict()
        return {
            "n_events": int(events.count()),
            "seasonality": {
                "n_active_cells": int(n_cells),
                "peak": {
                    "dow": int(peak["dow"]),
                    "hour": int(peak["hour"]),
                    "n_events": int(peak["n_events"]),
                    "share": peak["share"],
                },
            },
            "benford_max_abs_deviation": max_dev,
            "value_trends": {
                k: int(v) for k, v in trend_summary.items()
            },
        }
    finally:
        events.unpersist()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from text_extractor_for_bioeconomic_products_spark.session import get_spark

    spark = get_spark(app_name="datacard", master=args.master)
    card = build_datacard(spark, args.input)
    os.makedirs(args.output, exist_ok=True)
    with open(os.path.join(args.output, "datacard.json"), "w") as fh:
        json.dump(card, fh, sort_keys=True, indent=1)
    print(json.dumps(card, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
