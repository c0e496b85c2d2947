"""The composed corpus-preparation pass: ONE declarative plan running
the whole batch training-data pipeline end-to-end —

    quality filter  →  exact dedup  →  benchmark decontamination
                    →  domain-mixture downsampling  →  deterministic
                       training-order shuffle

i.e. the sequence every LLM pretraining corpus actually goes through
(Gopher rules → dedup → GPT-3 overlap decontamination → LLaMA mixture
weights → global shuffle), expressed as a single Spark SQL plan built
from the suite's own operators (:func:`~yadex_spark.operators.text.
filter_corpus`, :func:`~yadex_spark.operators.dedup.exact_dups`,
:func:`~yadex_spark.operators.text.decontaminate`,
:func:`~yadex_spark.operators.packing.mix_rates`,
:func:`~yadex_spark.operators.packing.shuffle_corpus`).

Stage-barrier design: two stage outputs fan out to TWO consumers each
(the dedup survivors feed both the decontamination probe and its
anti-join; the clean corpus feeds both the mixture stats and the
mixture filter).  Left as one lazy plan, Spark recomputes the shared
subtree per consumer — runtime exchange reuse recovers the shuffles
but NOT the scan+shingle work above them (measured: 17 parquet scans
survive AQE reuse at sf0.1, single-plan 11.9 s vs 9.8 s with
barriers; at 100 TB the recomputed corpus scans dominate).  So by
default the two fan-out points are ``localCheckpoint(eager=False)``
barriers: each stage computes exactly ONCE, its output lands on
executor-local storage, and lineage truncates (exactly what a
production pipeline does by writing each stage to a LakeTable /
Iceberg snapshot — the in-engine analogue, traded against
restartability).  ``stage_barrier=False`` keeps the fully declarative
single plan — Catalyst sees the whole pipeline (column pruning into
one scan, filter pushdown, exchange reuse), which is the form the plan
audit inspects and small corpora prefer.  Both forms are
deterministic and oracle-equal.

Scale notes per stage (100 TB):

- filter: pure per-row HOFs, no shuffle (filter_corpus's own shape);
- exact dedup: one hash agg on md5(text) + a left-semi join back on
  doc_id — the winner set is corpus-scale, so this is the one
  unavoidable corpus shuffle (same cost as ``dedup_exact`` itself);
- decontamination: the flagged set is eval-driven (tiny) — AQE
  broadcasts it into the anti-join; the corpus side never shuffles
  for the join (decontaminate's own shape, corpus ``spread`` before
  the CPU-heavy shingle/md5 stages);
- mixture: rates are #sources rows (broadcast); keep/drop is a pure
  per-row salted-hash filter;
- shuffle: per-shard windows at ``defaultParallelism`` shards — never
  a single-partition global sort (shuffle_corpus's own shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from yadex_spark.operators.dedup import exact_dups
from yadex_spark.operators.packing import mix_rates, token_estimate, shuffle_corpus
from yadex_spark.operators.text import decontaminate, filter_corpus


def prepare_corpus(
    docs: DataFrame,
    bench: DataFrame,
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_wlen_c: int = 300,
    max_wlen_c: int = 1_000,
    min_stop: int = 2,
    max_top_word_bp: int = 2_000,
    max_dup_2gram_bp: int = 2_000,
    decontam_n: int = 8,
    max_bench_df: int | None = None,
    target_bp: dict[str, int] | None = None,
    shuffle_salt: str = "shuf",
    n_shards: int | None = None,
    stage_barrier: bool = True,
) -> DataFrame:
    """Run the full corpus-preparation pipeline over ``docs`` (columns
    ``doc_id, text, source``) against evaluation set ``bench``
    (``doc_id, text``), returning the cleaned, mixed corpus in
    deterministic training order.

    Stage semantics (each stage sees only the previous stage's
    survivors — mixture rates, in particular, are computed over the
    POST-dedup/decontamination token composition, which is what makes
    the output mixture actually hit the target):

    1. **quality filter** — Gopher rule set, ``keep = 1`` survivors;
    2. **exact dedup** — canonical (min doc_id) survivor per md5(text);
    3. **decontamination** — drop docs sharing any word
       ``decontam_n``-gram with ``bench`` (``max_bench_df`` stop-gram
       cap as in :func:`~yadex_spark.operators.text.decontaminate`);
    4. **mixture** — waterfilling downsample to ``target_bp`` token
       shares (skipped when ``target_bp`` is None);
    5. **shuffle** — salted-hash interleaved global order.

    ``stage_barrier`` (default True) materializes the two fan-out
    stage outputs via lazy ``localCheckpoint`` so each stage computes
    exactly once (module docstring); False keeps one declarative plan.

    Output: (doc_id, source, n_tok, shard, pos) — the training-order
    corpus manifest (pos is dense-unique; readers consume in pos
    order).
    """
    flags = filter_corpus(
        docs,
        min_words=min_words,
        max_words=max_words,
        min_wlen_c=min_wlen_c,
        max_wlen_c=max_wlen_c,
        min_stop=min_stop,
        max_top_word_bp=max_top_word_bp,
        max_dup_2gram_bp=max_dup_2gram_bp,
        carry=("text", "source"),
    )
    if stage_barrier:
        # barrier BELOW the keep-filter: pushing `keep = 1` into the
        # signal projection substitutes every flag's expression tree
        # into the Filter (split/sort/shingle per conjunct — measured
        # ~25× the projection's own cost); against the materialized
        # flags it is a cheap column predicate
        flags = flags.localCheckpoint(eager=False)
    k1 = flags.where(F.col("keep") == 1).select("doc_id", "text", "source")
    # exact dedup: survivors are the canonical (min doc_id) of each
    # text-hash group — a left-semi join back on doc_id (the winner set
    # is exactly exact_dups' canonical_doc_id column)
    winners = exact_dups(k1).select(F.col("canonical_doc_id").alias("doc_id"))
    k2 = k1.join(winners, "doc_id", "left_semi")
    if stage_barrier:
        # fan-out point: k2 feeds the decontamination probe AND its
        # anti-join — barrier so the filter+dedup work runs once
        k2 = k2.localCheckpoint(eager=False)
    # decontamination: anti-join the survivors against the flagged set
    # (eval-driven, tiny -> AQE broadcasts it)
    flagged = decontaminate(
        k2, bench, n=decontam_n, max_bench_df=max_bench_df
    ).select("doc_id")
    k3 = k2.join(flagged, "doc_id", "left_anti")
    if stage_barrier:
        # fan-out point: k3 feeds the mixture stats AND the mixture
        # filter — barrier so decontamination runs once
        k3 = k3.localCheckpoint(eager=False)
    # mixture: per-source rates over the POST-clean corpus, applied as
    # the salted content-stable bucket filter (mix_corpus semantics,
    # inlined so survivors keep their columns)
    if target_bp is not None:
        rates = mix_rates(k3, target_bp).select("source", "rate_bp")
        bucket = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("mix|"), F.col("doc_id").cast("string"))), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % 10_000
        )
        k4 = (
            k3.withColumn("bucket", bucket)
            .join(rates, "source")
            .where(F.col("bucket") < F.col("rate_bp"))
            .select("doc_id", "text", "source")
        )
    else:
        k4 = k3
    # deterministic training order over the final corpus
    final = k4.select(
        "doc_id", "source", token_estimate(F.col("text")).alias("n_tok")
    )
    return shuffle_corpus(
        final, salt=shuffle_salt, n_shards=n_shards, carry=("source", "n_tok")
    ).select("doc_id", "source", "n_tok", "shard", "pos")
