"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded/feature-extracted through Arrow-batched ``mapInPandas``.

The image/audio/video codecs are NOT present in this environment, so
the decode step is a deterministic fake (`_fake_decode`) behind the
same batch interface a real decoder would use — the Spark-side
plumbing (schema, partitioning, UDF signature, Arrow batch shape) is
real and oracle-tested.  Swap ``_fake_decode`` for PIL/ffmpeg calls in
production; raise NotImplementedError for codecs you don't ship.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = "doc_id bigint, n_bytes int, feat0 int, feat1 int, feat2 int, feat3 int"


def to_binary_assets(docs: DataFrame) -> DataFrame:
    """Model a multimodal asset table: payload as opaque binary plus
    typed metadata columns (here the utf-8 text bytes stand in for an
    image blob)."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.lit("fake/blob").alias("mime"),
        F.octet_length(F.encode("text", "utf-8")).alias("n_bytes_meta"),
    )


def _fake_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in for an image/audio decoder.

    A real implementation would do e.g. ``PIL.Image.open(io.BytesIO(b))``
    / resample / frame-sample here — per Arrow batch, vectorized, never
    per-row Python over Spark rows.
    """
    for pdf in batches:
        payload = pdf["payload"]
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payload.map(len).astype("int32"),
                **{
                    f"feat{i}": payload.map(
                        lambda b, i=i: int(b[i]) if len(b) > i else -1
                    ).astype("int32")
                    for i in range(4)
                },
            }
        )
        yield out


def decode_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature-extract over the binary column."""
    return assets.select("doc_id", "payload").mapInPandas(_fake_decode, DECODE_SCHEMA)


BYTE_FEATURES_SCHEMA = (
    "doc_id bigint, n_bytes int, n_distinct int, max_bin_bp int, "
    + ", ".join(f"h{i} int" for i in range(16))
)


def _byte_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL vectorized byte-level feature extraction (numpy per Arrow
    batch): coarse 16-bin histogram of high nibbles, distinct-byte
    count, and the dominant bin's share in basis points.  Unlike the
    decode step this needs NO codec — it is the triage a binary-asset
    lake actually runs before decoding (truncated/corrupt/low-entropy
    blob detection, cheap pre-dedup signature), and it is exact."""
    import numpy as np

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = np.frombuffer(payload, dtype=np.uint8)
            n = int(b.size)
            hist = np.bincount(b >> 4, minlength=16).astype("int64")
            rows.append(
                (doc_id, n, int((np.bincount(b, minlength=256) > 0).sum()),
                 int(10_000 * hist.max() // n) if n else 0, *map(int, hist))
            )
        yield pd.DataFrame(
            rows, columns=["doc_id", "n_bytes", "n_distinct", "max_bin_bp"]
            + [f"h{i}" for i in range(16)]
        ).astype({c: "int32" for c in ["n_bytes", "n_distinct", "max_bin_bp"]
                  + [f"h{i}" for i in range(16)]})


def byte_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched byte-level features over the binary column — all
    integer, so the gate oracle matches exactly (the stand-in payloads
    are ASCII text bytes, which a SQL engine can re-derive from
    codepoints; real blobs keep the identical plumbing)."""
    return assets.select("doc_id", "payload").mapInPandas(
        _byte_features, BYTE_FEATURES_SCHEMA
    )
