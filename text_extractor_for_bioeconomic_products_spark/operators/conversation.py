"""Per-conversation grouped operators (applyInPandas surface).

Cross-turn computations that need a whole conversation in one place,
under the W2 stable ordering contract: consecutive-turn similarity (T6
difflib, helpers.py:286-306) and within-conversation exact dedup.

Scale notes: groupBy(conv_id).applyInPandas shuffles once on conv_id;
mega-conversations are the skew risk — ``max_turns_per_group`` hard-caps
the pandas frame (documented truncation, not silent — O4 pattern), and
AQE skew-split handles the shuffle side.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import rules

SIM_SCHEMA = (
    "conv_id string, turn_idx int, prev_turn_idx int, sim_to_prev double"
)


def consecutive_turn_similarity(
    turns: DataFrame, max_turns_per_group: int = 10000
) -> DataFrame:
    """difflib similarity of each turn's clean_text to the previous turn
    in (conv_id, turn_idx) order — echo/loop detection in agent
    transcripts.  Output ordered per group; first turn has null prev."""

    def per_conv(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("turn_idx").head(max_turns_per_group)
        texts = pdf["clean_text"].tolist()
        idxs = pdf["turn_idx"].tolist()
        rows = []
        for i in range(1, len(texts)):
            rows.append({
                "conv_id": pdf["conv_id"].iloc[0],
                "turn_idx": idxs[i],
                "prev_turn_idx": idxs[i - 1],
                "sim_to_prev": rules.text_similarity(texts[i], texts[i - 1]),
            })
        return pd.DataFrame(
            rows, columns=["conv_id", "turn_idx", "prev_turn_idx", "sim_to_prev"]
        )

    return (
        turns.select("conv_id", "turn_idx", "clean_text")
        .groupBy("conv_id")
        .applyInPandas(per_conv, schema=SIM_SCHEMA)
    )


def conversation_echo_stats(turns: DataFrame, threshold: float = 0.95) -> DataFrame:
    """Per-conversation echo rate: fraction of turns nearly identical to
    their predecessor (near-dup detection inside a conversation)."""
    sims = consecutive_turn_similarity(turns)
    return (
        sims.groupBy("conv_id")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(F.when(F.col("sim_to_prev") >= threshold, 1).otherwise(0)).alias("n_echoes"),
            F.round(F.avg("sim_to_prev"), 4).alias("avg_sim"),
        )
    )


def dedup_turns_within_conversation(turns: DataFrame) -> DataFrame:
    """Exact within-conversation dedup: keep the first turn (by turn_idx)
    of each identical clean_text — window rank, no applyInPandas needed."""
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id", F.md5("clean_text")).orderBy("turn_idx")
    return (
        turns.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )


def q_conversation_echo_stats(spark, sf_dir: str) -> DataFrame:
    """Driver-surface window into the applyInPandas cross-turn operators
    (rows-only — input is the deterministic synthetic transcript corpus):
    extract → consecutive-turn difflib similarity → corpus-level echo
    census.  Scalar-oracle equality is pinned by tests/test_conversation."""
    from .extract import extract_turns
    from ..sources.transcripts import synthesize_transcripts

    t = synthesize_transcripts(spark, n_convs=40, seed=42)
    stats = conversation_echo_stats(extract_turns(t))
    return stats.agg(
        F.count("*").alias("n_conversations"),
        F.sum("n_pairs").alias("n_pairs"),
        F.sum("n_echoes").alias("n_echoes"),
        F.round(F.avg("avg_sim"), 4).alias("mean_avg_sim"),
    )


QUERIES = {
    "conversation_echo_stats": q_conversation_echo_stats,
}
