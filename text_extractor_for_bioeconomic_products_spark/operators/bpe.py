"""Distributed BPE tokenizer training (Sennrich et al. 2016) — the
training-data-pipeline op the reference's len//4 token estimate gestures
at (`src/llm/openai_client.py:190-192`), done for real at corpus scale.

The Spark-sized insight (same as the original algorithm's): after ONE
corpus pass for word frequencies, training never touches the corpus
again — every merge round runs over the WORD-FREQUENCY TABLE
(vocabulary-sized, millions of rows at 100 TB, not trillions):

  1. pair counts: per word, adjacent symbol pairs weighted by the word's
     frequency — a narrow in-row zip + one vocabulary-sized partial-agg
     shuffle per round;
  2. argmax pair on the driver (deterministic tie-break: count desc,
     pair asc) — O(1) driver state;
  3. merge application: a pure JVM ``aggregate`` fold over each word's
     symbol array (greedy left-to-right, the standard semantics) — a
     narrow map, no Python.

Verification: ``tests`` pin the full merge sequence + final
tokenizations byte-exact against a pure-Python reference BPE on the
same corpus (the rules.py discipline: one semantics, two independent
implementations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load

N_MERGES = 8


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The one corpus pass: lowercase alnum words → (word, freq)."""
    return (
        docs.select(
            F.explode(
                F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")
            ).alias("w")
        )
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )


def _apply_merge_expr(a: str, b: str) -> F.Column:
    """Greedy left-to-right merge of adjacent (a, b) inside `syms` as a
    pure JVM fold (symbols are alnum-only, so direct quoting is safe)."""
    ab = a + b
    return F.expr(
        "aggregate(syms, CAST(array() AS ARRAY<STRING>), (acc, s) -> "
        f"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '{a}' "
        f"AND s = '{b}' "
        f"THEN concat(slice(acc, 1, size(acc) - 1), array('{ab}')) "
        "ELSE concat(acc, array(s)) END)"
    )


def bpe_train(
    vocab: DataFrame, n_merges: int = N_MERGES
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges over a (w, freq) vocabulary table.
    Returns (merges [(a, b, pair_count)...], final tokenized vocab
    (w, freq, syms)).  Per round: one vocab-sized shuffle + one driver
    argmax; the corpus is never re-read."""
    # Java split keeps a trailing empty match from the lookahead — drop it
    tokenized = vocab.withColumn(
        "syms",
        F.filter(F.split("w", "(?!^)"), lambda x: F.length(x) > 0),
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        tokenized = tokenized.localCheckpoint(eager=True)  # sever lineage
        pairs = (
            tokenized.filter(F.size("syms") >= 2)
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(slice(syms, 1, size(syms) - 1), "
                        "(s, i) -> struct(s AS a, element_at(syms, i + 2) AS b))"
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not pairs:
            break
        a, b, n = pairs[0]["a"], pairs[0]["b"], int(pairs[0]["n"])
        merges.append((a, b, n))
        tokenized = tokenized.withColumn("syms", _apply_merge_expr(a, b))
    return merges, tokenized


def reference_bpe(word_freqs: dict[str, int], n_merges: int = N_MERGES):
    """Pure-Python reference (the pytest oracle): identical pair counting
    (all adjacent occurrences, frequency-weighted), identical argmax
    tie-break, identical greedy left-to-right application."""
    toks = {w: list(w) for w in word_freqs}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in toks.items():
            f = word_freqs[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (a, b), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((a, b, n))
        ab = a + b
        for w, syms in toks.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = ab
                else:
                    out.append(s)
            toks[w] = out
    return merges, toks


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver surface: the learned merge table (rank, pair, weighted
    count) over the documents corpus.  No SQL oracle by design — the
    merge loop is iterative driver-state logic DuckDB cannot express;
    byte-exactness vs the pure-Python reference is pytest-pinned
    (test_bpe_matches_reference), the doc_extract_full discipline."""
    vocab = word_frequencies(load(spark, sf_dir, "documents"))
    merges, _ = bpe_train(vocab)
    return spark.createDataFrame(
        [(i, a, b, a + b, n) for i, (a, b, n) in enumerate(merges)],
        "rank int, a string, b string, merged string, pair_count bigint",
    )


def bpe_encode(docs: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text") -> DataFrame:
    """Apply a learned merge list to a corpus: (doc_id, n_words,
    n_tokens) per document — the tokenizer-application half of the BPE
    loop (train above, encode here).

    Entirely JVM-side: explode words (narrow — no shuffle), split to
    characters, then chain one greedy left-to-right fold per merge in
    rank order (the exact encoder semantics: merge k applies to the
    output of merge k-1).  The ONLY shuffle is the final per-doc count
    rollup.  At 100 TB this is the whole-stage-codegen path — zero
    Python in the hot loop, unlike a per-row tokenizer UDF."""
    words = docs.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                lambda x: F.length(x) > 0,
            )
        ).alias("w"),
    )
    toks = words.withColumn(
        "syms", F.filter(F.split("w", "(?!^)"), lambda x: F.length(x) > 0)
    )
    for a, b in merges:
        toks = toks.withColumn("syms", _apply_merge_expr(a, b))
    return (
        toks.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum(F.size("syms")).alias("n_tokens"),
        )
    )


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver surface: train on the corpus, encode the corpus, report
    the per-source token census (docs, words, tokens, chars/token-style
    compression as tokens-per-word).  Rows-only by design, like
    bpe_merges: the merge list is runtime state a static SQL string
    cannot carry; encoder byte-exactness vs the pure-Python reference
    is pytest-pinned (test_bpe_encode_matches_reference)."""
    docs = load(spark, sf_dir, "documents")
    merges, _ = bpe_train(word_frequencies(docs))
    enc = bpe_encode(docs, [(a, b) for a, b, _n in merges])
    return (
        docs.select("doc_id", "source")
        .join(enc, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").alias("total_words"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(
                F.avg(
                    (F.col("n_tokens") / F.col("n_words")).cast(
                        "decimal(18,10)"
                    )
                ),
                4,
            )
            .cast("double")
            .alias("tokens_per_word"),
        )
        .orderBy("source")
    )


QUERIES = {
    "bpe_merges": q_bpe_merges,
    "bpe_encode": q_bpe_encode,
}
