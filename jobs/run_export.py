#!/usr/bin/env python
"""spark-submit entry for the export surface (the reference's
ExportManager workflows, SURVEY §2.1 S8-S11): read a product_spans
parquet dir (as written by run_extraction) and emit the requested
formats.

    python jobs/run_export.py --spans <dir>/product_spans \
        --out <export dir> --formats csv,json,xml,html
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--spans", required=True, help="product_spans parquet dir")
    ap.add_argument("--out", required=True, help="export output dir")
    ap.add_argument("--formats", default="csv,json",
                    help="comma list of csv,json,xml,html,excel")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    known = {"csv", "json", "xml", "html", "excel"}
    formats = [f.strip() for f in args.formats.split(",") if f.strip()]
    bad = [f for f in formats if f not in known]
    if bad:  # fail fast, before anything is written
        ap.error(f"unknown format(s): {', '.join(bad)} (known: {sorted(known)})")

    from text_extractor_for_bioeconomic_products_spark.session import get_spark
    from text_extractor_for_bioeconomic_products_spark.sources import sinks

    spark = get_spark(app_name="export_spans", master=args.master)
    spans = spark.read.parquet(args.spans)
    os.makedirs(args.out, exist_ok=True)
    written = {}
    for fmt in formats:
        if fmt == "csv":
            p = os.path.join(args.out, "spans_csv")
            sinks.write_spans_csv(spans, p)
        elif fmt == "json":
            p = os.path.join(args.out, "spans_json")
            sinks.write_spans_json(spans, p)
        elif fmt == "xml":
            p = os.path.join(args.out, "spans.xml")
            sinks.write_spans_xml(spans, p)
        elif fmt == "html":
            p = os.path.join(args.out, "report.html")
            sinks.write_report_html(spans, p)
        else:  # excel — the only remaining validated format
            p = os.path.join(args.out, "products.xlsx")
            sinks.write_products_excel(spans, p)
        written[fmt] = p
    print(json.dumps({"n_spans": spans.count(), "written": written}))
    spark.stop()


if __name__ == "__main__":
    main()
