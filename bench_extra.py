"""Per-query isolation benchmarks (optimization guide §1.4) — NOT the
driver's frozen bench.py.

Usage:
    python bench_extra.py q1 q2 ...        # time each query, noop sink
    python bench_extra.py --explain DIR q1 # also dump .explain("formatted")
    python bench_extra.py --all            # every BENCH_QUERIES entry

Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
BENCH_EXTRA_REPS (default 2).  Prints one JSON line {name: [sec, ...]}.
Each rep runs the full query (build + noop write) so the numbers are
comparable with bench.py's per-query timings.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("BENCH_EXTRA_REPS", "2"))


def explain_str(df) -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))


def main() -> None:
    args = sys.argv[1:]
    explain_dir = None
    if args and args[0] == "--explain":
        explain_dir = args[1]
        args = args[2:]
        os.makedirs(explain_dir, exist_ok=True)
    from bench import BENCH_QUERIES, COPIES, make_spark
    names = BENCH_QUERIES if (not args or args[0] == "--all") else args

    # mirror run_default's session exactly (shuffle partitions scale with
    # the kg corpus there), so isolation numbers compare 1:1 with bench.py
    spark = make_spark(CPUS, files=494 * COPIES)
    spark.sparkContext.setLogLevel("ERROR")
    from stakgraph_spark.textops.catalog import CATALOG

    out: dict[str, list[float]] = {}
    for name in names:
        fn, _ = CATALOG[name]
        if explain_dir:
            df = fn(spark, SF_DIR)
            with open(os.path.join(explain_dir, f"{name}.txt"), "w") as f:
                f.write(explain_str(df))
        times = []
        for r in range(REPS):
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = times
        print(f"# {name}: {times}", file=sys.stderr)
    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "queries": out}))


if __name__ == "__main__":
    main()
