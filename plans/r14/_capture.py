"""Capture the EXECUTED (final AQE) formatted plan for declared queries.

Usage: python plans/r14/_capture.py <query> <suffix> [sf_dir] [cpus]

Runs the query once through the noop sink (so AQE finalizes every
subtree), then writes plans/r14/<query>_<suffix>.txt with the formatted
plan and prints scan/exchange/reuse counts. Methodology matches the r13
artifacts: before-plans are generated from a worktree at the pre-change
commit, after-plans from HEAD.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)


def main() -> None:
    query, suffix = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    cpus = sys.argv[4] if len(sys.argv) > 4 else "8"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    df = entry.queries()[query](spark, sf_dir)
    # collect(), not a noop write: the write wraps df in a NEW
    # QueryExecution, leaving df's own AQE plan un-finalized
    # (isFinalPlan=false, no ReusedExchange nodes). Declared queries all
    # have bounded outputs, so collecting is safe and runs every operator.
    df.collect()
    here = os.path.dirname(os.path.abspath(__file__))
    qe = df._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode
    # formatted: operator details (PushedFilters, ReadSchema, keys).
    formatted = qe.explainString(mode.fromString("formatted"))
    with open(os.path.join(here, f"{query}_{suffix}.txt"), "w") as f:
        f.write(formatted)
    # simple, post-execution: the AQE "== Final Plan ==" tree, which is
    # where ReusedExchange / AQEShuffleRead / runtime join strategy show
    # (same artifact style as plans/r13/*_executed.txt).
    executed = qe.explainString(mode.fromString("simple"))
    with open(os.path.join(here, f"{query}_{suffix}_executed.txt"), "w") as f:
        f.write(executed)
    final = executed.split("== Initial Plan ==")[0]
    print(
        f"{query} [{suffix}] final-plan: scans="
        f"{len(re.findall(r'Scan parquet', final))} "
        f"exchanges={len(re.findall(r'[^d] Exchange', final))} "
        f"reused={len(re.findall(r'ReusedExchange', final))} "
        f"bnlj={len(re.findall(r'BroadcastNestedLoopJoin', final))} "
        f"bhj={len(re.findall(r'BroadcastHashJoin', final))} "
        f"smj={len(re.findall(r'SortMergeJoin', final))} "
        f"python={len(re.findall(r'EvalPython|MapInPandas|MapInArrow', final))}"
    )


if __name__ == "__main__":
    main()
