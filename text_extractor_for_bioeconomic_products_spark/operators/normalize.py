"""Normalization & scalar-function operators as oracle-checked queries.

Covers SURVEY §2.8-2.9 pieces that are SQL-expressible: M1 use-type
synonym map, M2 country correction, T4 scientific-name fix, T7/BPE-ish
token counting, T9 JSON extraction, plus F1 relevance scoring generated
in both dialects.  Map-driven normalizations run over inline VALUES built
from the exact rules-module tables, so the oracle checks the *data* of
the maps, not just the plumbing.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import rules
from ..sources.tables import load

# ---------------------------------------------------------------------------
# M1 — use-type normalization over an inline VALUES table
# ---------------------------------------------------------------------------

# every synonym, every valid type, plus unknowns/case/whitespace probes
_USE_INPUTS = sorted(
    set(rules.USE_TYPE_MAP) | set(rules.VALID_USE_TYPES)
    | {"XYZZY", "  Madeira ", "ALIMENTÍCIO", "", "42"}
)


def _values_clause(items, quote=lambda s: "'" + s.replace("'", "''") + "'"):
    return ", ".join(f"({quote(i)})" for i in items)


def q_normalize_use_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """map lookup → valid-set check → 'outro' (response_parser.py:321-363)
    as a broadcast map_lit expression chain."""
    inputs = spark.createDataFrame([(i,) for i in _USE_INPUTS], "raw string")
    mapping = F.create_map(
        *[F.lit(x) for kv in rules.USE_TYPE_MAP.items() for x in kv]
    )
    lowered = F.trim(F.lower(F.col("raw")))
    mapped = F.coalesce(mapping[lowered], lowered)
    normalized = F.when(
        mapped.isin(rules.VALID_USE_TYPES), mapped
    ).otherwise(F.lit("outro"))
    return inputs.select("raw", normalized.alias("tipo_uso")).orderBy("raw")


def _oracle_use_types() -> str:
    when = "\n".join(
        f"WHEN '{k}' THEN '{v}'" for k, v in rules.USE_TYPE_MAP.items()
    )
    valid = ", ".join(f"'{v}'" for v in rules.VALID_USE_TYPES)
    return f"""
        SELECT raw,
               CASE WHEN mapped IN ({valid}) THEN mapped ELSE 'outro' END AS tipo_uso
        FROM (
            SELECT raw,
                   CASE trim(lower(raw)) {when} ELSE trim(lower(raw)) END AS mapped
            FROM (VALUES {_values_clause(_USE_INPUTS)}) AS t(raw)
        )
        ORDER BY raw
    """


# ---------------------------------------------------------------------------
# M2 + T4 — country correction + scientific-name fix
# ---------------------------------------------------------------------------

_COUNTRY_INPUTS = sorted(
    set(rules.COUNTRY_CORRECTIONS) | {"Brasil", "PERÚ", "Guyana", "france", ""}
)
_SCI_INPUTS = [
    "Euterpe oleracea", "euterpe OLERACEA", "UNCARIA tomentosa", "single",
    "Myrciaria  dubia extra", "lowercase only", "",
]


def q_correct_countries(spark: SparkSession, sf_dir: str) -> DataFrame:
    inputs = spark.createDataFrame([(i,) for i in _COUNTRY_INPUTS], "raw string")
    mapping = F.create_map(
        *[F.lit(x) for kv in rules.COUNTRY_CORRECTIONS.items() for x in kv]
    )
    corrected = F.coalesce(mapping[F.trim(F.lower("raw"))], F.trim("raw"))
    return inputs.select("raw", corrected.alias("country")).orderBy("raw")


def _oracle_countries() -> str:
    when = "\n".join(
        f"WHEN '{k}' THEN '{v}'" for k, v in rules.COUNTRY_CORRECTIONS.items()
    )
    return f"""
        SELECT raw,
               CASE trim(lower(raw)) {when} ELSE trim(raw) END AS country
        FROM (VALUES {_values_clause(_COUNTRY_INPUTS)}) AS t(raw)
        ORDER BY raw
    """


def q_fix_scientific_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 (validation.py:225-245): valid 'Genus species' kept; two-word
    inputs re-capitalized; everything else null."""
    inputs = spark.createDataFrame([(i,) for i in _SCI_INPUTS], "raw string")
    words = F.split(F.trim("raw"), r"\s+")
    fixed = F.concat(F.initcap(words[0]), F.lit(" "), F.lower(words[1]))
    pattern = "^[A-Z][a-z]+ [a-z]+$"
    result = (
        F.when(F.trim("raw").rlike(pattern), F.trim("raw"))
        .when((F.size(words) >= 2) & fixed.rlike(pattern), fixed)
        .otherwise(F.lit(None))
    )
    return inputs.select("raw", result.alias("scientific_name")).orderBy("raw")


_ORACLE_SCI = f"""
    SELECT raw,
           CASE
             WHEN regexp_matches(trim(raw), '^[A-Z][a-z]+ [a-z]+$') THEN trim(raw)
             WHEN len(regexp_split_to_array(trim(raw), '\\s+')) >= 2
                  AND regexp_matches(
                        concat(upper(substr(regexp_split_to_array(trim(raw), '\\s+')[1], 1, 1)),
                               lower(substr(regexp_split_to_array(trim(raw), '\\s+')[1], 2)),
                               ' ',
                               lower(regexp_split_to_array(trim(raw), '\\s+')[2])),
                        '^[A-Z][a-z]+ [a-z]+$')
             THEN concat(upper(substr(regexp_split_to_array(trim(raw), '\\s+')[1], 1, 1)),
                         lower(substr(regexp_split_to_array(trim(raw), '\\s+')[1], 2)),
                         ' ',
                         lower(regexp_split_to_array(trim(raw), '\\s+')[2]))
             ELSE NULL
           END AS scientific_name
    FROM (VALUES {_values_clause(_SCI_INPUTS)}) AS t(raw)
    ORDER BY raw
"""


# ---------------------------------------------------------------------------
# T9 — JSON extraction (events.props)
# ---------------------------------------------------------------------------

def q_events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return (
        events.select(
            "event_id",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        )
        .groupBy()
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.countDistinct("k").alias("distinct_k"),
        )
    )


_ORACLE_JSON = """
    -- CAST wraps the sum: DuckDB sum(INT) yields HUGEINT; Spark yields BIGINT.
    SELECT count(*) AS n_events,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
           count(DISTINCT CAST(json_extract_string(props, '$.k') AS INT)) AS distinct_k
    FROM events
"""


# ---------------------------------------------------------------------------
# BPE-ish token counting (graft requirement: whitespace + BPE-ish regex)
# ---------------------------------------------------------------------------

_BPE_RE = r"\w+|[^\w\s]"


def q_doc_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-pre-tokenizer-style counting: word runs + isolated punctuation,
    vs the reference's len/4 heuristic (openai_client.py:190-192)."""
    docs = load(spark, sf_dir, "documents")
    bpe = F.size(F.regexp_extract_all("text", F.lit(_BPE_RE), 0))
    return (
        docs.select(
            "doc_id",
            bpe.alias("bpe_tokens"),
            F.floor(F.length("text") / 4).cast("long").alias("len4_tokens"),
            F.size(F.split("text", r"\s+")).alias("ws_tokens"),
        )
        .orderBy("doc_id")
    )


# RE2 twin of _BPE_RE with \s pinned to the Java-equivalent class
_BPE_RE_DUCK = r"\w+|[^\w \t\n\x0b\f\r]"

_ORACLE_BPE = f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{_BPE_RE_DUCK}')) AS bpe_tokens,
           CAST(floor(length(text) / 4) AS BIGINT) AS len4_tokens,
           len(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+')) AS ws_tokens
    FROM documents
    ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# F1 — relevance score, dual-dialect generated (exact, overlap-safe)
# ---------------------------------------------------------------------------

def _relevance_sql(dialect: str) -> str:
    def count_re(pattern: str) -> str:
        if dialect == "spark":
            esc = pattern.replace("\\", "\\\\")
            return f"size(regexp_extract_all(text, '{esc}', 0))"
        # RE2's \s lacks \x0B (Java's includes it) — pin the explicit class
        pattern = pattern.replace(
            "\\S", "[^ \\t\\n\\x0b\\f\\r]"
        ).replace("\\s", "[ \\t\\n\\x0b\\f\\r]")
        return f"len(regexp_extract_all(text, '{pattern}'))"

    cats = []
    for cat, kws in rules.RELEVANT_KEYWORDS.items():
        # IGNORECASE via lower(): keywords are lowercase ASCII
        alt = r"\b(?:" + "|".join(re.escape(k) for k in kws) + r")\b"
        if dialect == "spark":
            esc = alt.replace("\\", "\\\\")
            c = f"size(regexp_extract_all(lower(text), '{esc}', 0))"
        else:
            c = f"len(regexp_extract_all(lower(text), '{alt}'))"
        w = rules._KEYWORD_WEIGHTS[cat]
        cats.append(f"least({c} / nw * 100, 1.0) * {w}")
    sci = count_re(r"\b[A-Z][a-z]+ [a-z]+\b")
    # distinct-country count: one boolean per country group (substring
    # containment, overlap-safe — matches helpers.py:233-283 exactly)
    country_terms = []
    for country, variants in rules.COUNTRY_VARIATIONS.items():
        disj = " OR ".join(
            f"contains(lower(text), '{v}')" for v in variants
        )
        country_terms.append(f"(CASE WHEN {disj} THEN 1 ELSE 0 END)")
    for country in sorted(rules.LATAM_COUNTRIES - set(rules.COUNTRY_VARIATIONS)):
        country_terms.append(
            f"(CASE WHEN contains(lower(text), '{country}') THEN 1 ELSE 0 END)"
        )
    n_countries = " + ".join(country_terms)
    tok = count_re(r"\S+")
    return f"""
        SELECT doc_id,
               round(least(
                 {' + '.join(cats)}
                 + (CASE WHEN {sci} > 0 THEN least({sci} / nw * 50, 0.3) ELSE 0.0 END)
                 + (CASE WHEN ({n_countries}) > 0 THEN least(({n_countries}) / 10.0, 0.2) ELSE 0.0 END)
               , 1.0), 4) AS relevance
        FROM (
            SELECT doc_id, text,
                   CAST(greatest({tok}, 1) AS DOUBLE) AS nw,
                   {tok} AS raw_nw
            FROM documents
        )
        WHERE raw_nw >= 0
        ORDER BY doc_id
    """


def q_doc_relevance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("documents_rel_src")
    sql = _relevance_sql("spark").replace("FROM documents", "FROM documents_rel_src")
    return spark.sql(sql)


# ---------------------------------------------------------------------------
# X3 rule half — ProductValidator as pure column expressions
# (validation.py:29-289; scalar twin rules.validate_product_span)
# ---------------------------------------------------------------------------


def _contains_any(col, needles) -> F.Column:
    out = F.lit(False)
    for n in needles:
        out = out | col.contains(F.lit(n))
    return out


def _ascii_trim(col) -> F.Column:
    """Strip the ASCII whitespace class from both ends — matches the
    scalar validator's ``.strip(rules._ASCII_WS)`` (Java ``\\s`` ≡ that
    exact class; ``F.trim`` alone strips only spaces)."""
    return F.regexp_replace(col, r"^\s+|\s+$", "")


def span_validation_columns(name, country, sci, uses) -> dict:
    """Vectorized :func:`rules.validate_product_span` — every check is a
    JVM column expression (no Python), so validation composes into any
    span-producing plan as a narrow map.  Returns the same fields."""
    name_t = _ascii_trim(F.coalesce(name, F.lit("")))
    name_l = F.lower(name_t)
    known_product = _contains_any(name_l, sorted(rules.VALIDATION_KNOWN_PRODUCTS))
    bio_kw = _contains_any(name_l, rules._VALIDATION_BIO_KEYWORDS)
    company = _contains_any(name_l, rules._VALIDATION_COMPANY_PATTERNS)
    name_issue = (F.length(name_t) < 2) | (company & ~(known_product | bio_kw))

    country_t = _ascii_trim(F.coalesce(country, F.lit("")))
    country_l = F.lower(country_t)
    known_country = country_l.isin(*sorted(rules.VALIDATION_KNOWN_COUNTRIES))
    country_issue = F.length(country_t) < 2
    # the casing-correction branch is faithfully unreachable (every
    # COUNTRY_CORRECTIONS key is whitelisted — asserted at import in
    # rules.py), so the column twin is a typed NULL by construction
    country_corrected = F.lit(None).cast("string")

    sci_t = _ascii_trim(F.coalesce(sci, F.lit("")))
    binomial = r"^[A-Z][a-z]+ [a-z]+$"
    sci_words = F.split(sci_t, r"\s+")
    # F.get (0-based, NULL out-of-bounds) — element_at raises under ANSI
    # for the 1-word case
    cand = F.concat(
        F.upper(F.substring(F.get(sci_words, 0), 1, 1)),
        F.lower(F.substring(F.get(sci_words, 0), 2, 1 << 20)),
        F.lit(" "),
        F.lower(F.get(sci_words, 1)),
    )
    needs_fix = (F.length(sci_t) > 0) & ~sci_t.rlike(binomial)
    fixable = needs_fix & (F.size(sci_words) >= 2) & cand.rlike(binomial)
    sci_issue = needs_fix & ~fixable
    scientific_corrected = F.when(fixable, cand)

    uses_arr = F.coalesce(uses, F.array().cast("array<string>"))
    cleaned = F.filter(
        F.transform(uses_arr, lambda x: _ascii_trim(x)), lambda x: x != ""
    )
    uses_issue = F.size(cleaned) == 0
    uses_corrected = ~uses_issue & (cleaned != uses_arr)

    n_issues = (
        name_issue.cast("int") + country_issue.cast("int")
        + sci_issue.cast("int") + uses_issue.cast("int")
    )
    n_corrections = (
        country_corrected.isNotNull().cast("int")
        + scientific_corrected.isNotNull().cast("int")
        + uses_corrected.cast("int")
    )
    score = (
        F.lit(1.0)
        - 0.2 * n_issues
        + F.when(F.length(sci_t) > 0, 0.1).otherwise(0.0)
        + F.when(F.size(cleaned) > 1, 0.1).otherwise(0.0)
        + F.when(known_product, 0.2).otherwise(0.0)
        + F.when(known_country, 0.1).otherwise(0.0)
    )
    confidence = F.round(F.least(F.lit(1.0), F.greatest(F.lit(0.0), score)), 4)
    return {
        "is_valid": (n_issues == 0) & (confidence > 0.6),
        "confidence": confidence,
        "n_issues": n_issues,
        "n_corrections": n_corrections,
        "country_corrected": country_corrected,
        "scientific_corrected": scientific_corrected,
    }


def q_span_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 end-to-end: tag spans over the deterministic transcript corpus
    (seed 42 — the documents table is product-free word soup, so spans
    only exist here), validate each (country = the span's first
    gazetteer country, matching the reference's single-country product
    record), census the outcomes.  Rows-only at the driver gate (spans
    come from the Python tagger); the column expressions are
    pytest-equal to the scalar rules.validate_product_span on
    branch-covering fixtures."""
    from ..operators.extract import explode_spans, extract_turns
    from ..sources.transcripts import synthesize_transcripts

    t = synthesize_transcripts(spark, n_convs=50, seed=42)
    spans = explode_spans(extract_turns(t)).select(
        F.col("nome_popular").alias("name"),
        F.get("paises", 0).alias("country"),
        F.col("nome_cientifico").alias("sci"),
        F.col("tipos_uso").alias("uses"),
    )
    v = span_validation_columns(
        F.col("name"), F.col("country"), F.col("sci"), F.col("uses")
    )
    validated = spans.select(
        v["is_valid"].alias("is_valid"),
        v["confidence"].alias("confidence"),
        v["n_issues"].alias("n_issues"),
        v["n_corrections"].alias("n_corrections"),
    )
    return (
        validated.groupBy("is_valid")
        .agg(
            F.count("*").alias("n_spans"),
            F.round(F.avg("confidence").cast("decimal(18,10)"), 4)
            .cast("double").alias("avg_confidence"),
            F.sum("n_issues").alias("total_issues"),
            F.sum("n_corrections").alias("total_corrections"),
        )
        .orderBy("is_valid")
    )


QUERIES = {
    "normalize_use_types": q_normalize_use_types,
    "correct_countries": q_correct_countries,
    "fix_scientific_names": q_fix_scientific_names,
    "events_json_extract": q_events_json_extract,
    "doc_bpe_tokens": q_doc_bpe_tokens,
    "doc_relevance": q_doc_relevance,
    "span_validation": q_span_validation,
}

# span_validation: intentionally no oracle (spans come from the Python
# tagger; the validation expressions are pytest-equal to the scalar twin)
ORACLE_SQL = {
    "normalize_use_types": _oracle_use_types(),
    "correct_countries": _oracle_countries(),
    "fix_scientific_names": _ORACLE_SCI,
    "events_json_extract": _ORACLE_JSON,
    "doc_bpe_tokens": _ORACLE_BPE,
    "doc_relevance": _relevance_sql("duckdb"),
}
