"""Minor-compaction evidence: read amplification must stay FLAT under
sustained ingest when compact_minor runs at cadence, and grow linearly
without it — the L0→L1 claim behind maintain_minor.

Two arms over the SAME generated feed, committed as E epochs of deltas:

- baseline: never compacts; the active chain grows one delta per epoch;
- minicompact: compact_minor + vacuum every ``cadence`` epochs.

After every cadence boundary both arms measure the two reads a consumer
actually runs: the full-state LWW read (wall) and an 8-probe point
lookup (wall + files_total/files_read from prune_stats — DETERMINISTIC,
the primary metric; walls on a shared box are indicative).  Also
records each compact_minor's own wall and input size, pinning the
O(trailing deltas) cost claim.

Usage: python scripts/minicompact_bench.py [events] [docs] [epochs] [cadence]
Appends a section to BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    n_epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    cadence = int(sys.argv[4]) if len(sys.argv) > 4 else 8

    from pyspark.sql import functions as F

    from yadex_spark.lake.table import LakeTable
    from yadex_spark.operators.collapse import collapse
    from yadex_spark.session import get_spark
    from yadex_spark.sources.genlog import gen_oplog

    spark = get_spark(
        "minicompact-bench",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")),
        shuffle_partitions=16,
    )
    work = tempfile.mkdtemp(prefix="minicompact-bench-")
    oplog = gen_oplog(spark, n_events, n_docs, seed=77).where("op != 'drop'")
    oplog = oplog.withColumn(
        "epoch", (F.col("op_seq") % n_epochs).cast("int")
    ).localCheckpoint()
    probes = [f"doc{i:08d}" for i in range(0, n_docs, max(1, n_docs // 8))][:8]

    def run_arm(name: str, do_mini: bool) -> dict:
        tbl = LakeTable(spark, os.path.join(work, name))
        samples = []
        mini_walls = []
        for e in range(n_epochs):
            batch = collapse(
                oplog.where(F.col("epoch") == e).drop("epoch")
            ).drop("table")
            tbl.commit_delta(batch, batch_id=f"{name}-e{e}")
            if (e + 1) % cadence == 0:
                if do_mini:
                    chain, _ = tbl._active_chain()
                    t0 = time.monotonic()
                    tbl.compact_minor()
                    tbl.vacuum()
                    mini_walls.append({
                        "after_epoch": e + 1,
                        "deltas_merged": len(chain),
                        "sec": round(time.monotonic() - t0, 2),
                    })
                stats: dict = {}
                t0 = time.monotonic()
                tbl.lookup(probes, prune_stats=stats).collect()
                lookup_s = time.monotonic() - t0
                t0 = time.monotonic()
                n_state = tbl.read().count()
                read_s = time.monotonic() - t0
                chain, _ = tbl._active_chain()
                samples.append({
                    "epoch": e + 1,
                    "chain_len": len(chain),
                    "files_total": stats["files_total"],
                    "files_read": stats["files_read"],
                    "lookup_sec": round(lookup_s, 2),
                    "read_sec": round(read_s, 2),
                    "state_rows": n_state,
                })
        return {"samples": samples, "mini_walls": mini_walls}

    base = run_arm("baseline", do_mini=False)
    mini = run_arm("minicompact", do_mini=True)

    b_first, b_last = base["samples"][0], base["samples"][-1]
    m_first, m_last = mini["samples"][0], mini["samples"][-1]
    out = {
        "metric": "read amplification under sustained ingest, with/without compact_minor",
        "events": n_events, "docs": n_docs,
        "epochs": n_epochs, "cadence": cadence,
        "baseline": base, "minicompact": mini,
        "files_read_growth_baseline": round(
            b_last["files_read"] / max(1, b_first["files_read"]), 2),
        "files_read_growth_minicompact": round(
            m_last["files_read"] / max(1, m_first["files_read"]), 2),
    }
    line = json.dumps(out)
    print(line)

    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(md, "a") as f:
        f.write("\n### Minor compaction: read amplification (scripts/minicompact_bench.py)\n\n")
        f.write(f"- feed: {n_events} events / {n_docs} docs, {n_epochs} epochs, "
                f"cadence {cadence}\n")
        f.write("- baseline (no compaction): lookup files_read "
                f"{b_first['files_read']} → {b_last['files_read']} "
                f"({out['files_read_growth_baseline']}×), chain "
                f"{b_first['chain_len']} → {b_last['chain_len']}, full read "
                f"{b_first['read_sec']}s → {b_last['read_sec']}s\n")
        f.write("- with compact_minor every "
                f"{cadence}: lookup files_read {m_first['files_read']} → "
                f"{m_last['files_read']} "
                f"({out['files_read_growth_minicompact']}×), chain "
                f"{m_first['chain_len']} → {m_last['chain_len']}, full read "
                f"{m_first['read_sec']}s → {m_last['read_sec']}s\n")
        f.write(f"- compact_minor walls: {json.dumps(mini['mini_walls'])}\n")
        f.write(f"- raw: `{line}`\n")


if __name__ == "__main__":
    main()
