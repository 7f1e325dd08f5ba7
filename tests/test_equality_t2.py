"""t2-tier equality (FIXTURES.md §4): larger corpus, full per-turn check."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from text_extractor_for_bioeconomic_products_spark import rules
from text_extractor_for_bioeconomic_products_spark.operators.extract import (
    extract_turns,
)
from text_extractor_for_bioeconomic_products_spark.sources.transcripts import (
    synthesize_transcripts,
)


def test_equality_at_t2_scale(spark):
    """200 conversations (~9k turns incl. the mega conversation): every
    turn byte-equal to the oracle."""
    df = synthesize_transcripts(spark, n_convs=200, seed=42)
    got = (
        extract_turns(df)
        .select("conv_id", "turn_idx", "clean_text", "lang", "n_spans")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    inp = (
        df.select("conv_id", "turn_idx", "text")
        .toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    exp = rules.oracle_extract_turns(inp)
    assert len(got) == len(exp) > 8000
    assert (got["clean_text"].values == exp["clean_text"].values).all()
    assert (got["lang"].values == exp["lang"].values).all()
    assert (got["n_spans"].values == exp["n_spans"].values).all()


_html_chunks = st.lists(
    st.sampled_from([
        "<div>", "</div>", "<p>", "</p>", "<a href='/x'>", "</a>",
        "<script>var x=1;</script>", "<style>.a{}</style>", "<nav>", "</nav>",
        "<br>", "<unclosed", "&amp;", "&nbsp;", "<!---->", "<!DOCTYPE html>",
        "text with maca and Brazil content here", "short", "\n\n", "  ",
        "Açaí (Euterpe oleracea) is used for food", "<td>cell</td>",
    ]),
    max_size=30,
)


@settings(max_examples=150, deadline=None)
@given(_html_chunks)
def test_strip_boilerplate_never_crashes_and_is_deterministic(chunks):
    text = "".join(chunks)
    a = rules.extract_main_content(text)
    b = rules.extract_main_content(text)
    assert a == b
    assert isinstance(a, str)
    # spans over the result are well-formed
    for sp in rules.tag_product_spans(a):
        assert 0 <= sp["begin"] < sp["end"] <= len(a)
        assert a[sp["begin"]:sp["end"]].lower() in rules.PRODUCT_GAZETTEER


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=300))
def test_extract_main_content_total_function(text):
    out = rules.extract_main_content(text)
    assert isinstance(out, str)
    repaired, _ = rules.parse_pdf_layout(text)
    vec = rules.clean_series_rich(pd.Series([rules.strip_boilerplate(repaired)])).iloc[0]
    assert vec == out
