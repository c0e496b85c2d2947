"""Extra benchmark harness for the optimization round (guide §1.4):
time individual declared queries in isolation with the noop sink.

NOT the driver's bench — bench.py stays frozen.  Usage:

    python bench_extra.py [-r REPS] query [query ...]

Prints one JSON line per query: {"query": name, "reps": [sec, ...],
"min": sec}.  Rep 1 in a fresh session approximates the driver bench's
per-query cost (warmed JVM, cold codegen for this plan); later reps
show the warm-plan floor.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from yadex_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-r", "--reps", type=int, default=3)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench-extra", cpus=cpus, shuffle_partitions=cpus)
    qs = entrymod.queries()
    # same untimed session warm-up as bench.py
    (
        spark.read.parquet(f"{sf_dir}/nation.parquet")
        .groupBy("n_regionkey").count()
        .write.format("noop").mode("overwrite").save()
    )
    for name in args.queries:
        reps = []
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{i}")
            t0 = time.monotonic()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            reps.append(round(time.monotonic() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        print(json.dumps({"query": name, "reps": reps, "min": min(reps)}),
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
