"""applyInPandas grouped operators + stateful streaming tracker."""

from __future__ import annotations

import os

import pytest

from text_extractor_for_bioeconomic_products_spark.operators.conversation import (
    consecutive_turn_similarity,
    conversation_echo_stats,
    dedup_turns_within_conversation,
)
from text_extractor_for_bioeconomic_products_spark.operators.extract import (
    extract_turns,
)


@pytest.fixture(scope="module")
def turns(transcripts_df):
    df = extract_turns(transcripts_df).drop("spans")
    df.cache()
    df.count()
    return df


def test_consecutive_similarity_matches_scalar_oracle(spark, turns):
    from text_extractor_for_bioeconomic_products_spark import rules

    sims = consecutive_turn_similarity(turns)
    got = {
        (r["conv_id"], r["turn_idx"]): r["sim_to_prev"]
        for r in sims.collect()
    }
    pdf = (
        turns.select("conv_id", "turn_idx", "clean_text")
        .toPandas().sort_values(["conv_id", "turn_idx"])
    )
    n_checked = 0
    for conv_id, grp in pdf.groupby("conv_id"):
        texts = grp["clean_text"].tolist()
        idxs = grp["turn_idx"].tolist()
        for i in range(1, len(texts)):
            exp = rules.text_similarity(texts[i], texts[i - 1])
            assert got[(conv_id, idxs[i])] == pytest.approx(exp)
            n_checked += 1
    assert n_checked == len(got) > 0


def test_echo_stats_shape(spark, turns):
    stats = conversation_echo_stats(turns).collect()
    assert len(stats) == turns.select("conv_id").distinct().count()
    for r in stats:
        assert 0 <= r["n_echoes"] <= r["n_pairs"]
        assert 0.0 <= r["avg_sim"] <= 1.0


def test_dedup_within_conversation(spark, turns):
    from pyspark.sql import functions as F

    deduped = dedup_turns_within_conversation(turns)
    assert deduped.count() <= turns.count()
    # no (conv_id, clean_text) appears twice afterwards
    dups = (
        deduped.groupBy("conv_id", F.md5("clean_text")).count()
        .filter("count > 1").count()
    )
    assert dups == 0
    # kept row is the earliest turn_idx of its group
    first = turns.groupBy("conv_id", F.md5("clean_text").alias("h")).agg(
        F.min("turn_idx").alias("turn_idx")
    )
    assert deduped.count() == first.count()


def test_stateful_tracker_stream(spark, transcripts_df, tmp_path):
    from pyspark.sql import functions as F

    from text_extractor_for_bioeconomic_products_spark.sources.transcripts import (
        write_transcripts,
    )
    from text_extractor_for_bioeconomic_products_spark.streaming.pipeline import (
        run_stateful_conversation_tracker,
    )

    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    write_transcripts(transcripts_df, in_dir)
    run_stateful_conversation_tracker(spark, in_dir, out_dir, timeout_sec=180)
    got = spark.read.parquet(os.path.join(out_dir, "conv_tracker_stream"))
    # final state per conversation (last update wins) == batch totals
    final = (
        got.groupBy("conv_id")
        .agg(F.max("turns_seen").alias("turns_seen"),
             F.max("spans_seen").alias("spans_seen"))
    )
    batch = (
        extract_turns(transcripts_df)
        .groupBy("conv_id")
        .agg(F.count("*").alias("bt"), F.sum("n_spans").alias("bs"))
    )
    joined = final.join(batch, "conv_id").collect()
    assert len(joined) == transcripts_df.select("conv_id").distinct().count()
    for r in joined:
        assert r["turns_seen"] == r["bt"]
        assert r["spans_seen"] == r["bs"]
