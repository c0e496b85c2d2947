"""Event-envelope and payload schemas.

The reference is schemaless (``bson.Raw`` end-to-end,
/root/reference/msync/msync.go:24); the engine itself only ever touches
``ns.coll``, ``operationType``, ``_id._data`` (resume token),
``clusterTime`` and ``fullDocument``
(/root/reference/msync/oploggetters.go:14-46,89-112).  The Spark target
is schema-first: the payload is the tokenized-sequence row from
BASELINE.json input_hint and the envelope carries the change-stream
fields as typed columns.

Mapping (reference -> here):
  _id._data  resume token (opaque, lexicographically ordered)  -> op_seq:long
  clusterTime (ts, increment)                                  -> op_ts + op_seq tiebreak
  operationType                                                -> op
  ns.coll                                                      -> table
  documentKey._id                                              -> doc_id
  fullDocument (post-image, UpdateLookup)                      -> after struct
"""

from __future__ import annotations

from pyspark.sql import types as T

# ops understood by the decoder, mirroring msync/oploggetters.go:94-112
OP_INSERT = "insert"
OP_UPDATE = "update"
OP_REPLACE = "replace"
OP_DELETE = "delete"
OP_DROP = "drop"  # collection drop: a table-wide barrier (msync/input.go:113-123)
UPSERT_OPS = (OP_INSERT, OP_UPDATE, OP_REPLACE)
ALL_OPS = (OP_INSERT, OP_UPDATE, OP_REPLACE, OP_DELETE, OP_DROP)

VOCAB_SIZE = 50257  # GPT-2-ish vocab for synthetic token ids
MAX_TOKENS = 512

# Payload: exactly BASELINE.json input_hint.
PAYLOAD_FIELDS = [
    T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
    T.StructField("n_tok", T.IntegerType(), True),
    T.StructField("source", T.StringType(), True),
]
PAYLOAD_SCHEMA = T.StructType(PAYLOAD_FIELDS)

# Evolved payload (FIXTURES.md §4): events past EVOLVE_AT carry source_meta.
PAYLOAD_SCHEMA_EVOLVED = T.StructType(
    PAYLOAD_FIELDS + [T.StructField("source_meta", T.StringType(), True)]
)


def target_schema(evolved: bool = False) -> T.StructType:
    """Schema of the sink table (payload + key)."""
    payload = PAYLOAD_SCHEMA_EVOLVED if evolved else PAYLOAD_SCHEMA
    return T.StructType(
        [T.StructField("doc_id", T.StringType(), False)] + list(payload.fields)
    )


def oplog_schema(evolved: bool = False) -> T.StructType:
    """Schema of the change-event stream (FIXTURES.md §2)."""
    payload = PAYLOAD_SCHEMA_EVOLVED if evolved else PAYLOAD_SCHEMA
    return T.StructType(
        [
            T.StructField("op_seq", T.LongType(), False),
            T.StructField("op_ts", T.TimestampType(), False),
            T.StructField("op", T.StringType(), False),
            T.StructField("table", T.StringType(), True),
            T.StructField("doc_id", T.StringType(), True),
            T.StructField("after", payload, True),
        ]
    )


def oplog_read_schema(evolved: bool = False) -> T.StructType:
    """All-nullable copy of :func:`oplog_schema` for READING a feed.
    The canonical schema declares the producer contract (op_seq/op_ts/op
    non-null); the reader must not TRUST it — a malformed chunk with a
    null in a required field would otherwise fail row materialization
    instead of reaching the pipeline's quarantine classifier."""
    return T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in oplog_schema(evolved).fields]
    )


LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.LongType(), False),
        T.StructField("table", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("offset_lo", T.LongType(), True),
        T.StructField("offset_hi", T.LongType(), True),
        T.StructField("n_insert", T.LongType(), False),
        T.StructField("n_update", T.LongType(), False),
        T.StructField("n_delete", T.LongType(), False),
        T.StructField("n_dropped_late", T.LongType(), False),
        T.StructField("apply_ms", T.DoubleType(), False),
        # epoch seconds: lineage is driver-written JSON (no Spark job per
        # epoch), so the stamp is a plain double
        T.StructField("committed_at", T.DoubleType(), False),
        # checkpoint scope (nullable: legacy rows predate it) — epoch
        # ids restart at 0 under a fresh checkpoint, so (scope,
        # batch_id) is the true epoch identity across runs
        T.StructField("scope", T.StringType(), True),
    ]
)
