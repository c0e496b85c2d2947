"""Two-parallelism scaling evidence for the north rule.

Runs the SAME CDC replay job (identical pre-generated feed) at N and 4N
local cores and reports throughput at both plus scaling efficiency
= (T_N / T_4N) / 4.  This stands in for the N-executor vs 4N-executor
cluster runs the rule asks for (no real cluster exists in this
sandbox); the job itself is partition-parallel everywhere, so the same
measurement applies per-executor on a cluster.

Each parallelism level runs in its OWN python/JVM process (like a real
spark-submit), with a small warmup feed first so JIT/codegen warmup is
not measured — the steady state is what 10^10-event ingest sees.

Usage: python scripts/scaling_bench.py [n_events] [n_docs]
Writes/updates BENCH/BASELINE.md and prints a JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CORES = (8, 32)


def _run_one(cpus: int, feed: str, warm_feed: str, work: str) -> None:
    """Child-process entry: warmup + timed drain at one parallelism."""
    import time

    from yadex_spark.session import get_spark
    from yadex_spark.streaming.pipeline import CdcPipeline

    spark = get_spark(f"scaling-{cpus}", cpus=cpus, shuffle_partitions=cpus)
    warm = CdcPipeline(
        spark, warm_feed,
        os.path.join(work, f"warm-lake{cpus}"), os.path.join(work, f"warm-ckpt{cpus}"),
        max_files_per_trigger=256,
    )
    warm.run_available_now(timeout_s=600)
    warm.table("seqs").read().count()

    pipe = CdcPipeline(
        spark, feed,
        os.path.join(work, f"lake{cpus}"), os.path.join(work, f"ckpt{cpus}"),
        max_files_per_trigger=256,
    )
    t0 = time.monotonic()
    pipe.run_available_now(timeout_s=3600)
    pipe.table("seqs").read().count()
    dt = time.monotonic() - t0
    spark.stop()
    print(f"RESULT {dt:.3f}")


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--run-one":
        _run_one(int(sys.argv[2]), sys.argv[3], sys.argv[4], sys.argv[5])
        return

    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000

    from yadex_spark.session import get_spark
    from yadex_spark.sources.genlog import gen_oplog, write_oplog_chunks

    work = tempfile.mkdtemp(prefix="scaling-")
    feed = os.path.join(work, "oplog")
    warm_feed = os.path.join(work, "oplog-warm")
    gen = get_spark("scaling-gen", cpus=32)
    write_oplog_chunks(gen_oplog(gen, n_events, n_docs, seed=42), feed, n_chunks=4,
                       bounds=(0, n_events - 1))
    write_oplog_chunks(gen_oplog(gen, 50_000, 5_000, seed=7), warm_feed, n_chunks=1,
                       bounds=(0, 49_999))
    gen.stop()

    results = {}
    for cpus in CORES:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--run-one",
             str(cpus), feed, warm_feed, work],
            capture_output=True, text=True, cwd=REPO, timeout=3600,
            env={**os.environ, "PYTHONPATH": REPO},
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")]
        if not line:
            sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-2000:])
            raise RuntimeError(f"child at {cpus} cores failed")
        dt = float(line[-1].split()[1])
        results[cpus] = {"sec": round(dt, 2), "events_per_sec": round(n_events / dt, 1)}
    shutil.rmtree(work, ignore_errors=True)

    n, n4 = CORES
    speedup = results[n]["sec"] / results[n4]["sec"]
    efficiency = speedup / (n4 / n)
    out = {
        "n_events": n_events,
        "n_docs": n_docs,
        "cores": results,
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
        "target": 0.8,
    }
    print(json.dumps(out))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    stamp = datetime.now(timezone.utc).isoformat(timespec="seconds")
    lines = [
        f"\n## Scaling run {stamp}\n",
        f"Same CDC replay job (streamed exactly-once apply of {n_events:,} change "
        f"events over {n_docs:,} docs, identical on-disk feed) at two parallelism "
        "levels in separate JVMs (spark-submit protocol), JIT-warmed, per the "
        "north rule's in-sandbox evidence protocol:\n",
        "| cores | wall sec | events/sec |",
        "| --- | --- | --- |",
        *[f"| local[{c}] | {r['sec']} | {r['events_per_sec']:,} |" for c, r in results.items()],
        f"\nSpeedup {n}→{n4} cores: **{speedup:.2f}×** of ideal 4×; "
        f"scaling efficiency **{efficiency:.3f}** (target ≥ 0.8).\n",
    ]
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write("\n".join(lines))


if __name__ == "__main__":
    main()
