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
