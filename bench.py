"""Benchmark surface for the driver: run every declared query at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Per-query time = full plan build + execution + collect at the driver
(the same surface the correctness gate measures, minus the oracle).

Each query is first run once at sf0.001 (~100x smaller) before being
timed at the target scale: Catalyst analysis, codegen compilation, and
JVM JIT of a query's operators are one-time costs that do not grow
with data, and letting them land arbitrarily on whichever query runs
first made successive bench runs differ by 10x per query. The timed
number is the steady-state, data-proportional cost — the quantity that
scales to the cluster.

Each query is then timed ``$SPARK_GRAFT_BENCH_REPS`` times (default 3)
and the MEDIAN is reported: this container shows real 10-20 s
per-query variance spikes (round-1 bench recorded text_lang_id at
10 s vs a 0.4-0.9 s steady state), and a median of 3 makes a single
GC/compaction/noisy-neighbor event invisible instead of defining the
recorded number.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_SF_DIR = "/root/testdata/sf0.001"
REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))

#: Correctness-gate-only entries excluded from the bench: their wall
#: time measures test-harness fixture work (rewriting the input as
#: time-sliced stream files per run), not operator throughput, which
#: would distort the cross-round non-regression comparison.
BENCH_SKIP = {
    "events_sessionize_stream",
    "events_hourly_agg_stream",
    "events_stream_stream_join",
    "events_sliding_agg_stream",
    "events_stream_static_join",
    "events_incremental_agg_stream",
    "dedup_exact_stream",
    "dedup_exact_stream_wm",
    "docs_accrete_stream",
    # memory-sink MicroBatchExecution harness — measures trigger
    # scheduling, not operator throughput
    "src_python_stream_source",
}


def _sf_from_dir(path: str) -> float:
    tail = os.path.basename(path.rstrip("/"))
    try:
        return float(tail.removeprefix("sf"))
    except ValueError:
        return -1.0


def main() -> None:
    import __spark_entry__ as e
    from sfcrimedatapipeline_spark.session import get_spark

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers so query 1 isn't charged for startup
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    # warm the Python/Arrow workers (pandas+numpy import per worker) so
    # the first mapInPandas query isn't charged for interpreter startup
    import pandas as _pd

    def _noop(batches):
        for b in batches:
            yield b

    spark.range(64, numPartitions=64).mapInPandas(_noop, "id long").count()

    timings: dict[str, float] = {}
    only = set(sys.argv[1:])
    for name, fn in e.queries().items():
        if (only and name not in only) or (not only and name in BENCH_SKIP):
            continue
        if os.path.isdir(WARM_SF_DIR) and WARM_SF_DIR != SF_DIR:
            fn(spark, WARM_SF_DIR).collect()  # compile/JIT warm-up (see module doc)
            spark.catalog.clearCache()
        reps = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).collect()
            reps.append(time.perf_counter() - t0)
            # operators persist reused intermediates (e.g. minhash
            # shingle frames); drop them between runs so storage memory
            # from one run doesn't evict/execute-spill the next
            spark.catalog.clearCache()
        timings[name] = round(statistics.median(reps), 3)

    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "total_query_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_from_dir(SF_DIR),
        "reps": REPS,
    }
    out_path = os.environ.get("SPARK_GRAFT_BENCH_OUT")
    if out_path:
        # self-published complete artifact: the driver's BENCH_r{N} tail
        # truncates (VERDICT r5 #5) — keep the full per-query map in-repo
        with open(out_path, "w") as fh:
            json.dump({**payload, "n_queries": len(timings)}, fh, indent=1, sort_keys=True)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
