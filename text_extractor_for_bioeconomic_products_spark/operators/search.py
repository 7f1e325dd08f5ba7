"""Span-level filter/search operators (SURVEY §2.2 F2-F5, §2.6 O1).

The reference's SQLite search surface (database.py:290-364): dynamic
WHERE over extracted products — name LIKE, country membership, minimum
confidence, category — plus confidence-ordered top-k.  Here they compose
as DataFrame predicates over the ``product_spans`` table; Catalyst pushes
them into the parquet scan when the spans are read from storage.
"""

from __future__ import annotations

from typing import Iterable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def filter_by_confidence(spans: DataFrame, min_confidence: float) -> DataFrame:
    """F2 (extraction_result.py:150-169)."""
    return spans.filter(F.col("confianca") >= F.lit(min_confidence))


def filter_by_country(spans: DataFrame, countries: Iterable[str]) -> DataFrame:
    """F3 (extraction_result.py:171-195): case-insensitive membership of
    any of the span's countries in the given list."""
    wanted = F.array(*[F.lit(c.lower()) for c in countries])
    return spans.filter(
        F.exists("paises", lambda p: F.array_contains(wanted, F.lower(p)))
    )


def filter_by_category(spans: DataFrame, use_type: str) -> DataFrame:
    """F4 (extraction_result.py:197-211): spans having ≥1 use of type —
    `exists` over the nested array, no explode+rejoin."""
    return spans.filter(
        F.exists("tipos_uso", lambda u: u == F.lit(use_type))
    )


def search_spans(
    spans: DataFrame,
    name_like: Optional[str] = None,
    country: Optional[str] = None,
    min_confidence: Optional[float] = None,
    use_type: Optional[str] = None,
    limit: int = 50,
) -> DataFrame:
    """F5 + O1 (database.py:290-342): dynamic predicate assembly +
    ORDER BY confianca DESC, name LIMIT k (TakeOrderedAndProject)."""
    out = spans
    if name_like:
        out = out.filter(
            F.lower("nome_popular").contains(name_like.lower())
            | F.lower("nome_canonico").contains(name_like.lower())
        )
    if country:
        out = filter_by_country(out, [country])
    if min_confidence is not None:
        out = filter_by_confidence(out, min_confidence)
    if use_type:
        out = filter_by_category(out, use_type)
    return out.orderBy(
        F.desc("confianca"), F.asc("nome_canonico"),
        F.asc("conv_id"), F.asc("turn_idx"), F.asc("span_seq"),
    ).limit(limit)
