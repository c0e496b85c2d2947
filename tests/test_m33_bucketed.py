"""Bucketed co-located joins: the layout pays the shuffle once at
write time, and every later equi-join on the bucket key plans with
ZERO shuffle Exchange nodes (vs >= 1 for the identical join over plain
parquet).  Results are byte-identical either way."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from yadex_spark.lake.bucketed import colocated_join, save_bucketed, shuffle_count
from yadex_spark.operators.text import token_count

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_bucketed_join_is_shuffle_free_and_equal(spark):
    d = _docs(spark)
    base = tempfile.mkdtemp(prefix="bkt-test-")
    left = save_bucketed(
        d.select("doc_id", "source"), "t_bkt_docs", f"{base}/docs", n_buckets=8
    )
    right = save_bucketed(
        token_count(d).select("doc_id", "n_ws_tokens"),
        "t_bkt_tok",
        f"{base}/tok",
        n_buckets=8,
    )
    joined = colocated_join(left, right, "doc_id")
    assert shuffle_count(joined) == 0

    # identical join over plain (unbucketed) parquet shuffles both sides
    plain = colocated_join(
        d.select("doc_id", "source"),
        token_count(d).select("doc_id", "n_ws_tokens"),
        "doc_id",
    )
    assert shuffle_count(plain) >= 1

    # same answer either way
    a = sorted(map(tuple, joined.collect()))
    b = sorted(map(tuple, plain.collect()))
    assert a == b and len(a) == d.count()


def test_bucketed_groupby_on_key_avoids_shuffle(spark):
    """Aggregation on the bucket key also satisfies its required
    distribution from the scan — no Exchange below the final agg."""
    d = _docs(spark)
    base = tempfile.mkdtemp(prefix="bkt-test-")
    t = save_bucketed(
        d.select("doc_id", "text"), "t_bkt_agg", f"{base}/agg", n_buckets=8
    )
    agg = t.groupBy("doc_id").agg(F.count("*").alias("n"))
    assert shuffle_count(agg) == 0
    plain_agg = d.select("doc_id", "text").groupBy("doc_id").agg(
        F.count("*").alias("n")
    )
    assert shuffle_count(plain_agg) >= 1
    assert agg.where(F.col("n") != 1).count() == 0
