"""Isolated, canary-paired measurement of individual catalog queries.

VERDICT r8 ask #1: full-sweep per-query timings of construction-heavy
queries (eager localCheckpoints fire at query CONSTRUCTION) swing 2x+
between canary-clean records — this tool measures a query alone, with
the bench's JVM canary immediately before and after EACH repetition
block, so a number can be attributed to the code instead of to
whatever the sweep was doing around it.

Usage:
    python tools/measure_isolated.py [-n REPS] QUERY [QUERY...]
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/measure_isolated.py ...

Prints one JSON object: per-query list of (construct_s, exec_s,
total_s) per repetition plus the paired canary shots. Construction is
timed separately from the noop-sink execution so eager-checkpoint cost
is visible directly (the nb_train accounting lesson).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    args = [a for a in sys.argv[1:]]
    reps = 3
    if args and args[0] == "-n":
        reps = int(args[1])
        args = args[2:]
    if not args:
        print("usage: measure_isolated.py [-n REPS] QUERY...", file=sys.stderr)
        return 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from data_misc_tools_spark.session import build_session, load_tables

    spark = build_session(
        app_name="measure_isolated",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) if cpus.isdigit() else 32,
    )
    spark.sparkContext.setLogLevel("ERROR")

    from bench import _jvm_canary_point, _jvm_canary_shot
    from data_misc_tools_spark.catalog import QUERIES

    unknown = [q for q in args if q not in QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    # session warm (the bench discipline): parquet footers + codegen
    region = load_tables(spark, sf_dir, ["region"])["region"]
    region.groupBy("r_name").count().collect()
    _jvm_canary_shot(spark, 400_000_000)

    out: dict = {"sf_dir": sf_dir, "reps": reps, "queries": {}}
    for name in args:
        fn = QUERIES[name]
        c_before, _ = _jvm_canary_point(spark)
        runs = []
        for _ in range(reps):
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            runs.append(
                {
                    "construct_s": round(t1 - t0, 3),
                    "exec_s": round(t2 - t1, 3),
                    "total_s": round(t2 - t0, 3),
                }
            )
        c_after, _ = _jvm_canary_point(spark)
        ratio = round(c_after / c_before, 4) if c_before else None
        out["queries"][name] = {
            "runs": runs,
            "canary_before_s": c_before,
            "canary_after_s": c_after,
            "canary_ratio": ratio,
            "clean": ratio is not None and 0.60 <= ratio <= 1.15,
        }
        print(f"# {name}: {runs} canary {c_before}->{c_after}", file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
