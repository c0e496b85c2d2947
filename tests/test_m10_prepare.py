"""prepare_corpus: the composed filter -> dedup -> decontaminate ->
mixture -> shuffle pass, cross-checked against an independent pure-
python replay of every stage's exact integer/hash arithmetic (the
full-scale DuckDB oracle runs through __spark_entry__)."""

from __future__ import annotations

import hashlib

import pytest

STOP = ("the", "a", "of", "and", "in", "to")

#: (doc_id, text, source) — every stage has at least one casualty:
#: 2 fails the quality filter (too short), 3 is an exact dup of 1,
#: 4 shares a 3-gram with bench doc 100, and source "c" is absent
#: from the mixture target (rate 0).
DOCS = [
    (1, "the quick brown fox jumps over the lazy dog today", "a"),
    (2, "tiny", "a"),
    (3, "the quick brown fox jumps over the lazy dog today", "a"),
    (4, "we hold these truths to be self evident clearly", "b"),
    (5, "a completely different sentence with other words here now", "b"),
    (6, "yet another unique document the corpus keeps around for now", "b"),
    (7, "the mixture should drop this source entirely and silently", "c"),
    (8, "one more accepted document in the first source bucket here", "a"),
]
BENCH = [(100, "we hold these truths to be self evident")]

PARAMS = dict(
    min_words=3, max_words=100, min_wlen_c=100, max_wlen_c=2_000,
    min_stop=1, max_top_word_bp=10_000, max_dup_2gram_bp=10_000,
    decontam_n=3, max_bench_df=None,
    target_bp={"a": 5_000, "b": 5_000}, shuffle_salt="shuf", n_shards=4,
)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _shingles(text: str, n: int) -> set[str]:
    w = text.split(" ")
    return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)} if len(w) >= n else set()


def _py_prepare(docs, bench, p):
    # stage 1: quality filter
    k1 = []
    for doc_id, text, source in docs:
        ws = text.split(" ")
        nw, nc = len(ws), len(text)
        wl = 100 * nc // nw
        nstop = sum(1 for x in ws if x in STOP)
        topbp = 10_000 * max(ws.count(x) for x in set(ws)) // nw
        n2g = nw - 1 if nw >= 2 else 0
        dup2 = (
            10_000 * (n2g - len({" ".join(ws[i:i + 2]) for i in range(n2g)})) // n2g
            if n2g > 0 else 0
        )
        if (p["min_words"] <= nw <= p["max_words"]
                and p["min_wlen_c"] <= wl <= p["max_wlen_c"]
                and nstop >= p["min_stop"] and topbp <= p["max_top_word_bp"]
                and dup2 <= p["max_dup_2gram_bp"]):
            k1.append((doc_id, text, source))
    # stage 2: exact dedup, canonical = min doc_id per text
    canon = {}
    for doc_id, text, _ in k1:
        canon.setdefault(text, doc_id)
    k2 = [d for d in k1 if canon[d[1]] == d[0]]
    # stage 3: decontamination (any shared n-gram with any bench doc)
    bench_sh = set()
    for _, text in bench:
        bench_sh |= _shingles(text, p["decontam_n"])
    k3 = [d for d in k2 if not (_shingles(d[1], p["decontam_n"]) & bench_sh)]
    # stage 4: mixture waterfilling over the POST-clean composition
    tokens = {}
    for _, text, source in k3:
        tokens[source] = tokens.get(source, 0) + (len(text) + 3) // 4
    targeted = {s: bp for s, bp in p["target_bp"].items() if bp > 0 and s in tokens}
    k = min((10_000 * tokens[s]) // bp for s, bp in targeted.items())
    rates = {
        s: (min(10_000, (p["target_bp"][s] * k) // tokens[s])
            if s in targeted else 0)
        for s in tokens
    }
    k4 = [
        d for d in k3
        if int(_md5(f"mix|{d[0]}")[:8], 16) % 10_000 < rates[d[2]]
    ]
    # stage 5: interleaved deterministic shuffle
    n_shards = p["n_shards"]
    rows = []
    for doc_id, text, source in k4:
        h = _md5(f"{p['shuffle_salt']}|{doc_id}")
        rows.append((int(h[:4], 16) % n_shards, h, doc_id, source, (len(text) + 3) // 4))
    out = {}
    by_shard = {}
    for r in sorted(rows, key=lambda r: (r[0], r[1], r[2])):
        shard = r[0]
        rank = by_shard.get(shard, 0)
        by_shard[shard] = rank + 1
        out[r[2]] = (r[3], r[4], shard, rank * n_shards + shard)
    return out  # doc_id -> (source, n_tok, shard, pos)


@pytest.fixture(scope="module")
def prepared(spark):
    from yadex_spark.operators.prepare import prepare_corpus

    docs = spark.createDataFrame(DOCS, "doc_id long, text string, source string")
    bench = spark.createDataFrame(BENCH, "doc_id long, text string")
    return prepare_corpus(docs, bench, **PARAMS).collect()


def test_prepare_corpus_matches_python_replay(prepared):
    expect = _py_prepare(DOCS, BENCH, PARAMS)
    got = {r["doc_id"]: (r["source"], r["n_tok"], r["shard"], r["pos"]) for r in prepared}
    assert got == expect


def test_prepare_corpus_every_stage_drops_its_casualty(prepared):
    survivors = {r["doc_id"] for r in prepared}
    assert 2 not in survivors      # quality filter
    assert 3 not in survivors      # exact dup of 1 (min doc_id wins)
    assert 1 in survivors          # ... and the canonical stays
    assert 4 not in survivors      # decontaminated (bench 3-gram)
    assert 7 not in survivors      # source "c": mixture rate 0
    assert survivors               # something survives end-to-end


def test_prepare_corpus_positions_are_interleaved_unique(prepared):
    n = PARAMS["n_shards"]
    positions = [r["pos"] for r in prepared]
    assert len(set(positions)) == len(positions)
    for r in prepared:
        assert r["pos"] % n == r["shard"]
