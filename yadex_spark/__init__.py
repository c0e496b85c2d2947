"""yadex_spark — a from-scratch PySpark-native CDC / incremental-ingest engine.

Re-expresses the capabilities of okharch/yadex (a Go MongoDB oplog-sync
engine, see /root/reference) as an idiomatic Structured Streaming pipeline:

    oplog-style change feed (insert/update/replace/delete/drop keyed by
    doc_id, ordered by (op_ts, op_seq))
      -> namespace filter + collection classification      (F1/F2)
      -> per-micro-batch dedup + last-writer-wins collapse  (T1/T3)
      -> salted repartition for hot keys                    (skew, A-axis)
      -> exactly-once MERGE upsert into a versioned lake table (W1/C1/C2)
      -> checkpointed resume + per-partition lineage rows   (C1-C4)

plus the offline verifier (V1/V2: full-outer diff under token-array
equality) and the initial snapshot clone with anti-join dedup (I1-I3).

Not a port: no channels, no pending linked-list, no per-event regex.
All heavy logic is Spark SQL expressions; Python surfaces are vectorized
pandas/Arrow UDFs only.
"""

__version__ = "0.1.0"
