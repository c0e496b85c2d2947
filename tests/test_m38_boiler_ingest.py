"""M38 — streaming cross-document boilerplate scrub on ingest (the
TENTH ingest-family member; CDC machinery × dedup_cross_doc_lines).

Laws pinned:

- single-epoch feed: accepted == the batch operator bit-for-bit;
- multi-epoch feed: online UNDER-scrubs one-directionally (a line
  crossing min_df mid-feed keeps its earlier occurrences), and
  ``reconcile()`` repairs accepted to batch equality — idempotently;
- crash-replayed epoch is a no-op (scoped batch ids; the line_df
  commit is the fully-applied marker);
- per-epoch line_df probe is zone-map pruned after maintenance.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from yadex_spark.operators.text import dedup_cross_doc_lines
from yadex_spark.streaming.boiler_ingest import BoilerplateIngest

N_DOCS = 120
SPAN = N_DOCS // 3


def _docs(spark):
    """Deterministic feed: every doc carries a corpus-wide BANNER (df =
    N_DOCS), a cohort line shared by id%5 (df = 24), and a unique line.
    A LATE line ("late-bloomer") appears in doc 10 (epoch 0) and docs
    70..79 (epoch 1): at doc 10's epoch its df is 1 < min_df, so the
    online scrub keeps it there while batch semantics scrub it — the
    online/batch divergence fixture."""
    late = F.when(
        (F.col("id") == 10) | ((F.col("id") >= 70) & (F.col("id") < 80)),
        F.lit("late-bloomer\n"),
    ).otherwise(F.lit(""))
    return spark.range(N_DOCS).select(
        F.col("id").alias("ingest_seq"),
        F.format_string("doc%05d", F.col("id")).alias("doc_id"),
        F.concat(
            F.lit("BANNER\n"),
            late,
            F.format_string("cohort-%d\n", F.pmod(F.col("id"), F.lit(5))),
            F.format_string("unique-%d", F.col("id")),
        ).alias("text"),
    )


def _feed(spark, tmp_path, n_chunks=3):
    docs = _docs(spark)
    path = str(tmp_path / "docs")
    base = time.time() - 600
    for i in range(n_chunks):
        span = (N_DOCS + n_chunks - 1) // n_chunks
        docs.where(
            (F.col("ingest_seq") >= i * span) & (F.col("ingest_seq") < (i + 1) * span)
        ).repartition(1).write.mode("append").parquet(path)
        for f in os.listdir(path):
            fp = os.path.join(path, f)
            if f.endswith(".parquet") and os.path.getmtime(fp) > base + 10:
                os.utime(fp, (base + i, base + i))
    return docs, path


def _ing(spark, tmp_path, path) -> BoilerplateIngest:
    return BoilerplateIngest(
        spark,
        feed_dir=path,
        lake_dir=str(tmp_path / "lake"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        min_df=2,
        max_files_per_trigger=1,
    )


def _batch_want(docs):
    return {
        r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_dropped"])
        for r in dedup_cross_doc_lines(docs, min_df=2).collect()
    }


def _got(ing):
    return {
        r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_dropped"])
        for r in ing.accepted().collect()
    }


def test_single_epoch_equals_batch_operator(spark, tmp_path):
    docs, path = _feed(spark, tmp_path, n_chunks=1)
    ing = _ing(spark, tmp_path, path)
    ing.run_available_now()
    assert _got(ing) == _batch_want(docs)


def test_multi_epoch_underscrubs_then_reconcile_repairs(spark, tmp_path):
    docs, path = _feed(spark, tmp_path, n_chunks=3)
    ing = _ing(spark, tmp_path, path)
    ing.run_available_now()
    want = _batch_want(docs)
    got = _got(ing)
    # one-directional divergence: every online text ⊇ batch text lines
    # (under-scrub only), and the late-bloomer line demonstrates it
    assert got != want
    diverged = {k for k in want if got[k] != want[k]}
    assert diverged  # the fixture must exercise the caveat
    for k in diverged:
        online_lines = got[k][0].split("\n")
        batch_lines = set(want[k][0].split("\n")) if want[k][0] else set()
        assert batch_lines <= set(online_lines)
        assert "late-bloomer" in online_lines
    # reconcile closes it
    n = ing.reconcile()
    assert n == len(diverged)
    assert _got(ing) == want
    # idempotent
    assert ing.reconcile() == 0
    assert _got(ing) == want


def test_crash_replay_is_exactly_once(spark, tmp_path):
    docs, path = _feed(spark, tmp_path, n_chunks=2)
    ing = _ing(spark, tmp_path, path)
    ing.run_available_now()
    before = _got(ing)
    df_before = sorted(map(tuple, ing.line_df.read().collect()))
    # replay both epochs' bodies verbatim: must no-op by batch id
    feed = spark.read.schema(
        "ingest_seq long, doc_id string, text string"
    ).parquet(path)
    ing.apply_batch(feed.where(F.col("ingest_seq") < 60), 0)
    ing.apply_batch(feed.where(F.col("ingest_seq") >= 60), 1)
    assert _got(ing) == before
    assert sorted(map(tuple, ing.line_df.read().collect())) == df_before


def test_linedf_probe_is_pruned_after_maintenance(spark, tmp_path):
    docs, path = _feed(spark, tmp_path, n_chunks=3)
    ing = _ing(spark, tmp_path, path)
    ing.run_available_now()
    ing.maintain()  # range-clusters line_df on the hash key
    # next epoch: a few more docs probe only their own hash range
    more = spark.range(N_DOCS, N_DOCS + 5).select(
        F.col("id").alias("ingest_seq"),
        F.format_string("doc%05d", F.col("id")).alias("doc_id"),
        F.concat(F.lit("BANNER\n"), F.format_string("unique-%d", F.col("id"))).alias("text"),
    )
    more.repartition(1).write.mode("append").parquet(path)
    ing.run_available_now()
    st = getattr(ing, "last_prune", {})
    assert st.get("files_total", 0) >= 1
    # BANNER must have been scrubbed from the new docs too (df carried)
    new = {r["doc_id"]: r["clean_text"] for r in ing.accepted().collect()
           if r["doc_id"] >= f"doc{N_DOCS:05d}"}
    assert all("BANNER" not in t for t in new.values()) and len(new) == 5


def test_df_counts_match_batch_counts(spark, tmp_path):
    docs, path = _feed(spark, tmp_path, n_chunks=3)
    ing = _ing(spark, tmp_path, path)
    ing.run_available_now()
    # stored df per line hash == batch-wide distinct-doc count
    want = (
        docs.select(
            F.posexplode(F.split("text", "\\Q\n\\E")).alias("i", "line"), "doc_id"
        )
        .select(F.md5("line").alias("h"), "doc_id").distinct()
        .groupBy("h").count()
    )
    got = ing.line_df.read().select(F.col("doc_id").alias("h"), "df")
    joined = want.join(got, "h", "full_outer").where(
        F.col("count").isNull() | F.col("df").isNull() | (F.col("count") != F.col("df"))
    )
    assert joined.count() == 0
