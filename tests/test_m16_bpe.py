"""M16 — distributed BPE vocabulary training (operators/bpe.py).

Pins:
- the exact merge sequence on the classic Sennrich-style toy corpus
  (freq ordering + lexicographic tie-break + greedy left-to-right
  non-overlapping merges within a word);
- the adjacent-overlap law (``a a a a`` with pair (a,a) merges
  left-to-right into two ``aa``, never three overlapping);
- early stop when the corpus runs out of adjacent pairs;
- oracle parity: the unrolled DuckDB SQL replays the Spark training
  bit-for-bit on the sf0.001 fixture (the gate's own check, run here
  so a regression fails in pytest before the driver sees it);
- the train -> vocab -> wordpiece_tokenize -> apply_span_mask
  composition: a learned vocab drives the token-domain suite
  end-to-end and reconstruction law still holds.
"""

from __future__ import annotations

import duckdb
import pytest

from yadex_spark.operators.bpe import (
    bpe_train,
    bpe_train_merges,
    bpe_vocab,
    bpe_word_freq,
)

SF = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_toy_merge_sequence(spark):
    # 5x low, 2x lower, 6x newer/new-ish: merge order is fully
    # determined by integer frequencies + (lhs, rhs) tie-break
    docs = _docs(spark, [
        (1, "low low low low low"),
        (2, "lower lower newer newer newer"),
        (3, "newest widest"),
        (4, "new new newer"),
    ])
    merges = bpe_train_merges(docs, n_merges=5)
    assert merges == [
        # four pairs tie at f=7 ((e,w), (l,o), (n,e), (o,w)) — the
        # lexicographic tie-break resolves every step deterministically
        (0, "e", "w", 7),       # newer x4 + new x2 + newest x1
        (1, "l", "o", 7),       # low x5 + lower x2
        (2, "lo", "w", 7),
        (3, "n", "ew", 7),
        (4, "e", "r", 6),       # lower x2 + newer x4
    ]


def test_adjacent_overlap_law(spark):
    # BPE merges non-overlapping left-to-right: 'aaaa' -> (aa)(aa),
    # 'aaa' -> (aa)(a); the double-delimiter replace must not chain
    # through shared boundaries
    docs = _docs(spark, [(1, "aaaa aaa")])
    merges = bpe_train_merges(docs, n_merges=2)
    assert merges[0][1:3] == ("a", "a")
    assert merges[0][3] == 5  # 3 adjacent pairs in aaaa + 2 in aaa
    # after merge 0: aaaa -> (aa)(aa), aaa -> (aa)(a) — the overlap
    # law; all four next pairs have f=1, lexicographic tie-break picks
    # lhs 'a' < 'aa', i.e. ('a', '</w>') from the trailing a of aaa
    assert merges[1][1:4] == ("a", "</w>", 1)


def test_early_stop_no_pairs(spark):
    # single-symbol words only: after char+</w> merges nothing remains
    docs = _docs(spark, [(1, "x y")])
    merges = bpe_train_merges(docs, n_merges=50)
    assert len(merges) < 50  # stopped early, did not loop to n_merges


def test_word_freq_is_exact(spark):
    docs = _docs(spark, [(1, "a b a"), (2, "b  c")])  # double space
    got = {r["word"]: r["freq"] for r in bpe_word_freq(docs).collect()}
    assert got == {"a": 2, "b": 2, "c": 1}


def test_gate_oracle_parity_sf0001(spark):
    import __spark_entry__ as e

    sdf = e.queries()["bpe_train"](spark, SF)
    srows = sorted(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    drows = sorted(
        tuple(r) for r in con.execute(e.oracle_sql()["bpe_train"]).fetchall()
    )
    assert srows == drows
    assert len(srows) == 12


def test_train_tokenize_mask_composition(spark):
    """The full text->tokens chain with a LEARNED vocab: BPE merges ->
    inference vocab -> wordpiece_tokenize -> apply_span_mask, and the
    span-corruption reconstruction law holds on the learned ids."""
    from pyspark.sql import functions as F

    from yadex_spark.operators.packing import apply_span_mask
    from yadex_spark.operators.text import wordpiece_tokenize

    docs = _docs(spark, [
        (1, "the cat sat on the mat"),
        (2, "the cats sat"),
        (3, "a cat and a mat"),
    ])
    merges = bpe_train_merges(docs, n_merges=6)
    vocab = bpe_vocab(docs, merges)
    assert all("</w>" not in v for v in vocab)

    toks = wordpiece_tokenize(docs, vocab)
    rows = {r["doc_id"]: r for r in toks.collect()}
    # learned single chars cover the corpus: no [UNK] (id 0) anywhere
    assert all(0 not in r["tokens"] for r in rows.values())
    assert rows[1]["n_tok"] == len(rows[1]["tokens"]) > 0

    masked = apply_span_mask(
        toks.select("doc_id", "tokens"), mask_rate_bp=3_000, salt="m16"
    )
    for r in masked.collect():
        orig = rows[r["doc_id"]]["tokens"]
        # reconstruction law: non-sentinel input ids + target spans
        # reproduce the original sequence length
        kept = [t for t in r["input_tokens"] if t >= 0]
        tgt = [t for t in r["target_tokens"] if t >= 0]
        assert len(kept) + len(tgt) == len(orig)


def test_vocab_is_deterministic_and_sorted_base(spark):
    docs = _docs(spark, [(1, "ba ab")])
    m1 = bpe_train_merges(docs, n_merges=3)
    m2 = bpe_train_merges(docs, n_merges=3)
    assert m1 == m2
    v = bpe_vocab(docs, m1)
    base = [t for t in v if len(t) == 1]
    assert base == sorted(base)
