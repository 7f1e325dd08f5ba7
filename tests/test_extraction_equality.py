"""Per-turn equality: Spark pipeline vs pure-pandas oracle.

This is the BASELINE.json invariant — per-turn text equality under stable
(conv_id, turn_idx) ordering — plus span-level equality and a determinism
check across parallelism levels (same input ⇒ identical output hash).
"""

from __future__ import annotations

import pandas as pd
import pytest

from text_extractor_for_bioeconomic_products_spark import rules
from text_extractor_for_bioeconomic_products_spark.operators.extract import (
    conversation_stats,
    explode_spans,
    extract_turns,
    stable_turn_order,
)


@pytest.fixture(scope="module")
def turns(transcripts_df):
    df = extract_turns(transcripts_df)
    df.cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def input_pdf(transcripts_df) -> pd.DataFrame:
    return (
        transcripts_df.select("conv_id", "turn_idx", "text")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


def test_per_turn_text_equality(turns, input_pdf):
    """Every turn's clean_text matches the oracle byte-for-byte."""
    got = (
        turns.select("conv_id", "turn_idx", "clean_text", "lang", "lang_conf",
                      "relevance", "n_tokens", "n_spans")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    exp = rules.oracle_extract_turns(input_pdf)
    assert len(got) == len(exp) > 0
    mismatch = (got["clean_text"].values != exp["clean_text"].values)
    assert not mismatch.any(), (
        f"{mismatch.sum()}/{len(exp)} turns mismatch; first: "
        f"{got.loc[mismatch.argmax()]} vs {exp.loc[mismatch.argmax()]}"
    )
    assert (got["lang"].values == exp["lang"].values).all()
    assert got["lang_conf"].values == pytest.approx(exp["lang_conf"].values)
    assert got["relevance"].values == pytest.approx(exp["relevance"].values)
    assert (got["n_tokens"].values == exp["n_tokens"].values).all()
    assert (got["n_spans"].values == exp["n_spans"].values).all()


def test_span_equality(turns, input_pdf):
    got = (
        explode_spans(turns)
        .toPandas()
        .sort_values(["conv_id", "turn_idx", "span_seq"])
        .reset_index(drop=True)
    )
    exp = rules.oracle_extract_spans(input_pdf)
    assert len(got) == len(exp) > 0
    for col in ["nome_popular", "nome_canonico", "begin", "end", "categoria"]:
        assert (got[col].values == exp[col].values).all(), col
    # nullable / list / float columns
    assert got["nome_cientifico"].fillna("∅").tolist() == exp["nome_cientifico"].fillna("∅").tolist()
    assert [list(x) for x in got["paises"]] == [list(x) for x in exp["paises"]]
    assert [list(x) for x in got["tipos_uso"]] == [list(x) for x in exp["tipos_uso"]]
    assert got["confianca"].values == pytest.approx(exp["confianca"].values)


def test_determinism_across_partitionings(spark, transcripts_df):
    """Same input at different partition counts ⇒ identical result hash —
    the sandbox evidence for the N vs 4N cluster-size invariance half of
    north_rule (throughput half lives in bench.py)."""
    def result_hash(df):
        from pyspark.sql import functions as F
        t = extract_turns(df).select(
            "conv_id", "turn_idx", "clean_text", "lang", "n_spans"
        )
        row = t.select(
            F.sum(
                F.xxhash64("conv_id", "turn_idx", "clean_text", "lang", "n_spans")
                .cast("decimal(38,0)")
            ).alias("h"),
            F.count("*").alias("n"),
        ).collect()[0]
        return row["h"], row["n"]

    h1 = result_hash(transcripts_df.repartition(1))
    h8 = result_hash(transcripts_df.repartition(8))
    h31 = result_hash(transcripts_df.repartition(31))
    assert h1 == h8 == h31


def test_stable_turn_order_contract(turns):
    ordered = stable_turn_order(turns)
    pdf = (
        ordered.select("conv_id", "turn_idx", "turn_rank")
        .toPandas().sort_values(["conv_id", "turn_idx"])
    )
    for _, grp in pdf.groupby("conv_id"):
        assert grp["turn_rank"].tolist() == list(range(1, len(grp) + 1))


def test_conversation_stats_salted_matches_plain(spark, turns):
    """Two-stage salted aggregation == direct groupBy (semantic identity)."""
    from pyspark.sql import functions as F
    salted = conversation_stats(turns, salt_buckets=16).orderBy("conv_id")
    plain = (
        turns.groupBy("conv_id")
        .agg(
            F.count("*").alias("n_turns"),
            F.sum("n_spans").alias("n_spans"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum(F.when(F.col("relevance") >= 0.1, 1).otherwise(0)).alias("n_relevant"),
            F.sum(F.when(F.col("parse_error"), 1).otherwise(0)).alias("n_errors"),
            F.max("ts").alias("max_ts"),
            F.min("ts").alias("min_ts"),
        )
        .orderBy("conv_id")
    )
    assert salted.collect() == plain.collect()


def test_mega_conversation_skew_exists(transcripts_df):
    """The fixture really is skewed (guards the salting test's premise)."""
    counts = transcripts_df.groupBy("conv_id").count().toPandas()
    top = counts["count"].max() / counts["count"].sum()
    assert top > 0.05


def test_layout_artifacts_repaired_in_spark_pipeline(spark):
    """PDF-extraction artifacts (hyphen wraps, form feeds) repaired
    identically in the Spark featurizer and the scalar oracle, with the
    page count surfaced."""
    df = spark.createDataFrame(
        [("c1", 0, "user", "bio-\neconomic acai products\x0cpage two", None, None),
         ("c1", 1, "user", "plain turn", None, None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    rows = {r["turn_idx"]: r for r in extract_turns(df).collect()}
    assert rows[0]["n_pages"] == 2 and rows[1]["n_pages"] == 1
    assert "bioeconomic" in rows[0]["clean_text"]
    assert "\x0c" not in rows[0]["clean_text"]
    exp = rules.extract_main_content("bio-\neconomic acai products\x0cpage two")
    assert rows[0]["clean_text"] == exp
