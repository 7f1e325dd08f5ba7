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


# greedy chat-example assembly: a turn that would overflow the context
# window starts a new example; turns never split across examples
PACK_CTX_TOKENS = 256
# every 83rd doc is inflated past the window so the oversize path (a
# single turn larger than the whole context) is exercised non-vacuously
_PACK_OVERSIZE_MOD = 83
_PACK_OVERSIZE_REPEAT = 8

PACK_SCHEMA = (
    "conv_id string, example_id bigint, n_turns bigint, "
    "example_tokens bigint, n_oversize bigint"
)


def greedy_pack_fold(
    token_counts: list[int], ctx: int
) -> list[tuple[int, int, int]]:
    """The pure greedy fold (one conversation, ordered token counts) —
    extracted so hypothesis can hammer the recurrence without Spark.
    Returns [(n_turns, example_tokens, n_oversize), ...] per example."""
    examples: list[list[int]] = []
    fill = 0
    for n in token_counts:
        if not examples or fill + n > ctx:
            examples.append([0, 0, 0])
            fill = 0
        examples[-1][0] += 1
        examples[-1][1] += n
        examples[-1][2] += 1 if n > ctx else 0
        fill += n
    return [tuple(e) for e in examples]


def greedy_pack_turns(
    turns: DataFrame,
    ctx: int = PACK_CTX_TOKENS,
    max_turns_per_group: int = 100_000,
) -> DataFrame:
    """Greedy chat-example assembly — the training-example builder for
    multi-turn transcripts (reference analog: the chunker's respect-
    boundaries mode, `src/utils/helpers.py` TextChunker, lifted from
    characters-within-a-document to turns-within-a-conversation).

    Unlike ``q_sequence_packing``'s fixed cumulative bins, the boundary
    is *stateful*: a turn that would overflow ``ctx`` starts a new
    example and the fill counter resets, so no example (except a single
    oversize turn, which gets its own example and is flagged) exceeds
    the window.  That running reset is not expressible as a window
    function — it is the canonical per-group stateful fold, so the
    Spark idiom is one ``applyInPandas`` per conversation (one shuffle
    on conv_id; mega-conversations hard-capped like
    ``consecutive_turn_similarity``) and the DuckDB oracle is a
    recursive CTE stepping turn-by-turn.

    Input needs (conv_id, turn_idx, n_tokens); output one row per
    (conv_id, example_id) with turn/token/oversize counts."""

    def per_conv(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("turn_idx").head(max_turns_per_group)
        conv = pdf["conv_id"].iloc[0]
        examples = greedy_pack_fold(
            [int(n) for n in pdf["n_tokens"].astype("int64")], ctx
        )
        return pd.DataFrame(
            {
                "conv_id": conv,
                "example_id": range(len(examples)),
                "n_turns": [e[0] for e in examples],
                "example_tokens": [e[1] for e in examples],
                "n_oversize": [e[2] for e in examples],
            }
        )

    return (
        turns.select("conv_id", "turn_idx", "n_tokens")
        .groupBy("conv_id")
        .applyInPandas(per_conv, schema=PACK_SCHEMA)
    )


def q_conversation_context_pack(spark, sf_dir: str) -> DataFrame:
    """Documents mapped to the transcript shape (conv_id=source,
    turn_idx=doc_id), token counts by the len//4 estimate, greedily
    packed into 256-token training examples.  Every 83rd turn is
    deterministically inflated past the window so the oversize flag is
    driven on both engines."""
    from ..sources.tables import load

    docs = load(spark, sf_dir, "documents")
    inflated = F.when(
        F.col("doc_id") % _PACK_OVERSIZE_MOD == 0,
        F.expr(f"repeat(text, {_PACK_OVERSIZE_REPEAT})"),
    ).otherwise(F.col("text"))
    turns = docs.select(
        F.col("source").alias("conv_id"),
        F.col("doc_id").alias("turn_idx"),
        (F.length(inflated) / F.lit(4)).cast("bigint").alias("n_tokens"),
    )
    return greedy_pack_turns(turns).orderBy("conv_id", "example_id")


ORACLE_SQL = {
    # the greedy reset is a per-group stateful fold — the oracle steps
    # turn-by-turn with a recursive CTE (same idiom as doc_chunks)
    "conversation_context_pack": f"""
        WITH RECURSIVE t AS (
            SELECT source AS conv_id,
                   row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn,
                   length(CASE WHEN doc_id % {_PACK_OVERSIZE_MOD} = 0
                               THEN repeat(text, {_PACK_OVERSIZE_REPEAT})
                               ELSE text END) // 4 AS n_tokens
            FROM documents
        ),
        pack AS (
            SELECT conv_id, rn, n_tokens,
                   CAST(0 AS BIGINT) AS example_id, n_tokens AS fill
            FROM t WHERE rn = 1
            UNION ALL
            SELECT t.conv_id, t.rn, t.n_tokens,
                   CASE WHEN p.fill + t.n_tokens > {PACK_CTX_TOKENS}
                        THEN p.example_id + 1 ELSE p.example_id END,
                   CASE WHEN p.fill + t.n_tokens > {PACK_CTX_TOKENS}
                        THEN t.n_tokens ELSE p.fill + t.n_tokens END
            FROM pack p JOIN t ON t.conv_id = p.conv_id AND t.rn = p.rn + 1
        )
        SELECT conv_id, example_id,
               count(*) AS n_turns,
               CAST(sum(n_tokens) AS BIGINT) AS example_tokens,
               CAST(sum(CASE WHEN n_tokens > {PACK_CTX_TOKENS} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_oversize
        FROM pack
        GROUP BY conv_id, example_id
        ORDER BY conv_id, example_id
    """,
}

QUERIES = {
    "conversation_echo_stats": q_conversation_echo_stats,
    "conversation_context_pack": q_conversation_context_pack,
}
