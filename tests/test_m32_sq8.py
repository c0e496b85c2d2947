"""SQ8 int8 embedding quantization: reconstruction law, code range
(the tinyint storage claim), recall vs the brute baseline, and
partitioning invariance.

Reference analogue: none (beyond-reference similarity suite) — SQ8 +
exact rerank is the standard compressed-ANN pattern (e.g. FAISS
ScalarQuantizer), re-expressed as Spark HOF projections + one
broadcast join."""

from __future__ import annotations

from pyspark.sql import functions as F

from yadex_spark.operators.similarity import (
    _prepared,
    _sq8,
    cosine_topk,
    sq8_quantize,
    sq8_topk,
)

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_sq8_reconstruction_law(spark):
    """Half-up rounding bound: 2*|q_i - c_i*scale| <= scale, scale >= 1."""
    rows = sq8_quantize(_emb(spark)).collect()
    assert rows
    for r in rows:
        assert r.scale >= 1
        assert 2 * r.max_abs_err <= r.scale


def test_sq8_codes_fit_tinyint(spark):
    """|c_i| <= 127 by construction — the array<tinyint> storage cast
    (4x smaller than float32) is lossless: casting down and back
    changes nothing."""
    p = _sq8(_prepared(_emb(spark)))
    bad = p.where(
        F.exists("c", lambda x: (F.abs(x) > 127))
    ).count()
    assert bad == 0
    roundtrip = p.withColumn(
        "c8", F.col("c").cast("array<tinyint>").cast("array<bigint>")
    ).where(F.expr("c8 <> c"))
    assert roundtrip.count() == 0


def test_sq8_topk_recall_vs_brute(spark):
    """refine=4 shortlist recovers the brute top-3 (measured 1.00 at
    both SFs; pinned at >= 0.9 to absorb fixture drift)."""
    emb = _emb(spark)
    brute = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(emb, n_queries=8, k=3).collect()
    }
    sq = {
        (r.query_id, r.neighbor_id)
        for r in sq8_topk(emb, n_queries=8, topk=3, refine=4).collect()
    }
    assert brute and len(sq) == len(brute)
    assert len(brute & sq) / len(brute) >= 0.9


def test_sq8_partitioning_invariance(spark):
    """Same codes and same top-k regardless of input partitioning —
    nothing in the operator depends on row placement."""
    emb = _emb(spark)
    base = sorted(map(tuple, sq8_topk(emb).collect()))
    rep = sorted(map(tuple, sq8_topk(emb.repartition(7, "vec_id")).collect()))
    assert base == rep
    cb = sorted(map(tuple, sq8_quantize(emb).collect()))
    cr = sorted(map(tuple, sq8_quantize(emb.repartition(5)).collect()))
    assert cb == cr
