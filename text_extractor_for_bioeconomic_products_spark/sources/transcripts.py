"""Deterministic synthetic transcript source (FIXTURES.md §1).

Input table shape per BASELINE.json input_hint:
    transcripts(conv_id string, turn_idx int, role string,
                text string, tool string, ts timestamp)

Generation is fully distributed and closed-form deterministic (seed mixes
into xxhash64; no RNG, no clock): a small conversation-dimension frame
(one row per conversation — thousands, not billions) is exploded into
turns, so the same code generates 10^3 or 10^12 turns without any
driver-side loop over turns.

Skew by construction: conversation 0 is a "mega conversation" holding
~mega_frac of all turns (north_rule salting test target); the rest have
sizes varying 10..70.  Rows are written in hash-shuffled order so stable
(conv_id, turn_idx) ordering logic is actually exercised (FIXTURES.md §1).
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .golden import DIRTY_WRAPPERS, GOLDEN_TEXTS, html_wrap

EPOCH_2026 = 1767225600  # 2026-01-01T00:00:00Z — fixed, never datetime.now()

TRANSCRIPT_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), False),
    T.StructField("text", T.StringType(), True),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), False),
])


def build_templates() -> List[Tuple[int, str]]:
    """~26 payload templates: golden texts plain/dirty/html-wrapped plus
    guard-rule edge cases (empty, whitespace, <10 chars, long)."""
    templates: List[str] = []
    for i, (_, text) in enumerate(sorted(GOLDEN_TEXTS.items())):
        templates.append(text)
        pre, post = DIRTY_WRAPPERS[i % len(DIRTY_WRAPPERS)]
        templates.append(pre + text + post)
        templates.append(html_wrap(text, key=f"t{i}"))
    # guard-rule edges (language_detector.py:38-43, text_preprocessing.py:72-73)
    templates.append("")
    templates.append("   \n\t  ")
    templates.append("ok then")
    templates.append("sim")
    # long text (> 2500 chars → multi-chunk, W1 offsets)
    long_text = ("\n\n".join([GOLDEN_TEXTS["multiple_products"]] * 4)
                 + "\n\n" + GOLDEN_TEXTS["portuguese_report"])
    templates.append(long_text)
    # tool-ish output (markup-free JSON-like payload)
    templates.append('{"status": "ok", "results": [1, 2, 3], "query": "açaí exports"}')
    return list(enumerate(templates))


def synthesize_transcripts(
    spark: SparkSession,
    n_convs: int = 500,
    seed: int = 42,
    mega_frac: float = 0.10,
) -> DataFrame:
    """Build the deterministic transcripts DataFrame.

    Average non-mega conversation size is 40 turns; total turns ≈
    n_convs * 40 / (1 - mega_frac).
    """
    base_turns = n_convs * 40
    mega_turns = int(base_turns * mega_frac / (1.0 - mega_frac))

    conv = spark.range(n_convs).withColumnRenamed("id", "conv_num")
    # sizes: conv 0 = mega; others 10..70 by closed form (avg 40)
    conv = conv.withColumn(
        "size",
        F.when(F.col("conv_num") == 0, F.lit(max(mega_turns, 1)))
        .otherwise((F.lit(10) + F.pmod(F.col("conv_num") * 7919, F.lit(61))).cast("long")),
    )
    # start offsets by closed-form stride (max non-mega size is 70 < 71):
    # no global window / prefix sum — a 10^10-conversation dimension would
    # otherwise funnel through one partition.  Offsets only feed ts; they
    # are unique globally and monotone within each conversation.
    conv = conv.withColumn(
        "start",
        F.when(F.col("conv_num") == 0, F.lit(0))
        .otherwise(F.lit(max(mega_turns, 1)) + (F.col("conv_num") - 1) * 71),
    )
    conv = conv.withColumn(
        "conv_id", F.format_string("conv-%06d", F.col("conv_num").cast("int"))
    )

    turns = conv.select(
        "conv_id", "conv_num", "start",
        F.explode(F.sequence(F.lit(0), (F.col("size") - 1).cast("int"))).alias("turn_idx"),
    )
    turns = turns.withColumn("global_seq", F.col("start") + F.col("turn_idx"))

    templates = build_templates()
    tpl_df = spark.createDataFrame(
        [(i, t) for i, t in templates], "tpl_id int, body string"
    )

    h = F.xxhash64(F.lit(seed), F.col("conv_id"), F.col("turn_idx"))
    turns = turns.withColumn(
        "tpl_id", F.pmod(h, F.lit(len(templates))).cast("int")
    )
    turns = turns.join(F.broadcast(tpl_df), "tpl_id", "left")

    roles = F.array(F.lit("user"), F.lit("assistant"), F.lit("tool"))
    tools = F.array(F.lit("search"), F.lit("browser"), F.lit("python"))
    out = turns.select(
        F.col("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.element_at(roles, F.pmod(F.col("turn_idx"), F.lit(3)).cast("int") + 1).alias("role"),
        # ~50% of turns get a unique suffix so payloads are not all repeats
        F.concat(
            F.col("body"),
            F.when(
                F.pmod(F.xxhash64(F.lit(seed + 1), F.col("conv_id"), F.col("turn_idx")), F.lit(2)) == 0,
                F.format_string("\n\nref %s:%d", F.col("conv_id"), F.col("turn_idx")),
            ).otherwise(F.lit("")),
        ).alias("text"),
        F.when(
            F.pmod(F.col("turn_idx"), F.lit(3)) == 2,
            F.element_at(tools, F.pmod(F.xxhash64(F.col("conv_id")), F.lit(3)).cast("int") + 1),
        ).alias("tool"),
        F.timestamp_seconds(F.lit(EPOCH_2026) + F.col("global_seq") * 7).alias("ts"),
    )
    return out


def write_transcripts(df: DataFrame, path: str, shuffled: bool = True) -> None:
    """Persist, in hash-shuffled row order (FIXTURES.md: rows written
    shuffled so stable-ordering logic is exercised)."""
    if shuffled:
        df = df.orderBy(F.xxhash64("conv_id", "turn_idx"))
    df.write.mode("overwrite").parquet(path)


def _require_transcript_columns(spark: SparkSession, path: str, fmt: str) -> None:
    """Fail fast when a self-describing input (parquet/orc footers) has
    none of the transcript key columns.  An explicit read schema over
    mismatched files silently fills every column with NULL — a
    mis-pointed --input then flows 100%-quarantined phantom rows through
    the whole job (round-5 README audit caught exactly this: an
    arbitrary testdata dir "processed" 9,890 all-null turns, 0 spans).
    Footer-only check — no data is scanned."""
    actual = {f.name for f in spark.read.format(fmt).load(path).schema.fields}
    required = {"conv_id", "text"}
    if not (required & actual):
        raise ValueError(
            f"input at {path!r} has none of the transcript columns "
            f"{sorted(required)} (found: {sorted(actual)[:8]}...) — "
            "not a transcripts table"
        )


def read_transcripts(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """S1 format-dispatch scan (text_extractor.py:28-48 analog): route by
    format with the explicit schema — never inferSchema (SURVEY §1.3).
    Unsupported format ⇒ error, matching the reference's dispatch; a
    self-describing input bearing NO transcript columns also errors
    instead of reading as all-NULL rows."""
    if fmt == "parquet":
        _require_transcript_columns(spark, path, fmt)
        return spark.read.schema(TRANSCRIPT_SCHEMA).parquet(path)
    if fmt == "json":
        return spark.read.schema(TRANSCRIPT_SCHEMA).json(path)
    if fmt == "csv":
        return (
            spark.read.schema(TRANSCRIPT_SCHEMA)
            .option("header", True)
            .option("multiLine", True)
            .option("escape", '"')
            .csv(path)
        )
    if fmt == "orc":
        _require_transcript_columns(spark, path, fmt)
        return spark.read.schema(TRANSCRIPT_SCHEMA).orc(path)
    if fmt == "avro":
        # stdlib OCF reader (sources/avro.py) — self-describing, so the
        # transcript-column guard applies to ITS schema, not a footer
        from .avro import read_avro
        df = read_avro(spark, path)
        if not ({"conv_id", "text"} & set(df.columns)):
            raise ValueError(
                f"avro input at {path!r} has none of the transcript "
                "columns — not a transcripts table"
            )
        return df
    raise ValueError(f"unsupported transcript format: {fmt}")


def read_text_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Whole-file raw-text ingest — the reference's file-per-document
    shape (`src/core/text_extractor.py:28-48` dispatches on extension;
    its TXT branch reads the whole file).  One row per file:
    (doc_id = xxhash64(full file path), file_name, text).  wholetext
    keeps each file a single record, so downstream cleaning/chunking
    sees the document exactly as the reference's extractor did; at
    100 TB each file is one task input and the scan parallelizes on
    file count.

    doc_id hashes the path RELATIVE TO THE INGEST ROOT, not the
    basename and not the full URI: file-per-document corpora ingested
    recursively routinely repeat basenames across subdirectories (r3
    ADVICE — a basename hash silently merged such documents in every
    downstream keyed op), while a full-URI hash changes whenever the
    corpus is relocated/remounted or the scheme spelling differs
    (file:/ vs file:/// — r4 ADVICE), breaking id stability across
    ingests of the same corpus.  The root prefix is stripped from
    ``input_file_name()`` by locating the normalized root inside the
    URI, so any scheme spelling yields the same relative path.  The
    scan is recursive for the same duplicate-basename reason."""
    import os

    raw = (
        spark.read.option("recursiveFileLookup", "true")
        .text(path, wholetext=True)
    )
    fpath = F.input_file_name()
    root = os.path.abspath(path).rstrip("/")
    pos = F.locate(root + "/", fpath)
    rel_path = F.when(
        pos > 0,
        F.substring(fpath, pos + len(root) + 1, 2_000_000_000),
    ).otherwise(
        # root not found as a directory prefix (single-file ingest, or a
        # URI-encoded path component): fall back to the basename, which
        # for a single file IS its root-relative path
        F.element_at(F.split(fpath, "/"), -1)
    )
    return raw.select(
        F.xxhash64(rel_path).alias("doc_id"),
        F.element_at(F.split(fpath, "/"), -1).alias("file_name"),
        F.col("value").alias("text"),
    )
