#!/usr/bin/env python
"""Regenerate PLANS.md — formatted physical plans of flagship operators.

Usage: python jobs/dump_plans.py [> PLANS.md]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.01"


def formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    from text_extractor_for_bioeconomic_products_spark.operators.extract import (
        extract_turns,
    )
    from text_extractor_for_bioeconomic_products_spark.session import get_spark
    from text_extractor_for_bioeconomic_products_spark.sources.transcripts import (
        synthesize_transcripts,
    )
    import __spark_entry__ as entry_mod

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    qs = entry_mod.queries()
    sections = [
        ("extract_turns (the extraction map)",
         "No shuffle exchange: scan → broadcast template join → "
         "ArrowEvalPython → project. At 100 TB this is scan → UDF → sink, "
         "embarrassingly parallel.",
         extract_turns(synthesize_transcripts(spark, n_convs=20, seed=42))),
        ("topk_urgent_orders (O1 top-k search)",
         "Predicates pushed into the parquet scan (PushedFilters), 3-column "
         "ReadSchema, TakeOrderedAndProject instead of global sort.",
         qs["topk_urgent_orders"](spark, SF)),
        ("revenue_by_priority (fact-fact join + agg)",
         "AQE picks broadcast at this scale; at 100 TB both sides are "
         "bucketed on orderkey so the join is co-located (see "
         "sinks.write_turns_parquet).",
         qs["revenue_by_priority"](spark, SF)),
    ]
    out = [
        "# PLANS — formatted physical plans of flagship operators\n",
        "Captured with `.explain('formatted')` at sf0.01 (regenerate with\n"
        "`python jobs/dump_plans.py`; properties are pinned by "
        "`tests/test_plans.py`).\n",
    ]
    for title, note, df in sections:
        out.append(f"## {title}\n")
        out.append(note + "\n")
        out.append("```\n" + formatted_plan(df).rstrip()[:6000] + "\n```\n")
    print("\n".join(out))
    spark.stop()


if __name__ == "__main__":
    main()
