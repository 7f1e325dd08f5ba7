#!/usr/bin/env python
"""spark-submit entry for the Iceberg-layout metadata export: take a
versioned table (as written by `plans/versioned.commit_merge`, e.g. the
streaming merge sink's output) and emit its whole snapshot chain in the
Iceberg v2 metadata layout, then read the current snapshot back THROUGH
the exported chain as a self-check.

    python jobs/run_iceberg_export.py --table <versioned table dir> \
        [--out <metadata dir>] [--snapshot N]

Prints one JSON line: the export census plus the chain-read row count.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True, help="versioned table dir")
    ap.add_argument("--out", default=None,
                    help="metadata output dir (default <table>/iceberg/metadata)")
    ap.add_argument("--snapshot", type=int, default=None,
                    help="snapshot id to self-check (default: current)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from text_extractor_for_bioeconomic_products_spark.plans.iceberg_export import (
        export_iceberg_metadata,
        read_iceberg_snapshot,
    )
    from text_extractor_for_bioeconomic_products_spark.session import get_spark

    spark = get_spark(app_name="iceberg_export", master=args.master)
    census = export_iceberg_metadata(args.table, out_dir=args.out)
    n = read_iceberg_snapshot(
        spark, census["metadata_dir"], snapshot_id=args.snapshot
    ).count()
    print(json.dumps({**census, "chain_read_rows": n}))
    spark.stop()


if __name__ == "__main__":
    main()
