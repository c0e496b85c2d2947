"""M13 — property-based tests over the dataops algebra.

Companion to test_m12_property: these pin the *laws* of the iterative /
compositional operators on arbitrary small inputs, where the
fixed-corpus gates pin one instance each.

- dedup_clusters: equals union-find (min-label connected components)
  for ANY pair list — chains, cycles, self-pairs, singletons-via-
  all_docs; the gate corpus cannot cover arbitrary graph shapes, and
  the pointer-jumping loop is exactly the kind of code a graph edge
  case breaks.
- winnow_fingerprint: equals a literal Python transcription of
  Schleimer winnowing (same split/concat_ws/md5-prefix conventions), so
  the HOF pipeline and the algorithm agree on all window/boundary
  cases.
- mix_rates: equals the integer waterfilling definition (K = min over
  targeted sources of (10000*T) div w; rate = (w*K) div T capped at
  10000), and rates never exceed 10000 / untargeted sources get 0.
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings, strategies as st

from yadex_spark.operators.dedup import dedup_clusters
from yadex_spark.operators.packing import mix_rates
from yadex_spark.operators.text import winnow_fingerprint

SETTINGS = dict(
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
    print_blob=True,
)

DOCS = [f"d{i}" for i in range(12)]

pair_lists = st.lists(
    st.tuples(st.sampled_from(DOCS), st.sampled_from(DOCS)),
    max_size=25,
)


def _uf_clusters(pairs, extra_docs=()):
    parent: dict[str, str] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in pairs:
        union(a, b)
    members: dict[str, list] = {}
    for x in parent:
        members.setdefault(find(x), []).append(x)
    out = {}
    for root, ms in members.items():
        lo = min(ms)
        for x in ms:
            out[x] = lo
    for d in extra_docs:
        out.setdefault(d, d)
    return sorted(out.items())


@settings(max_examples=6, **SETTINGS)
@given(pairs=pair_lists)
def test_dedup_clusters_equals_union_find(spark, pairs):
    pdf = spark.createDataFrame(pairs, "doc_a string, doc_b string")
    all_docs = spark.createDataFrame([(d,) for d in DOCS], "doc_id string")
    got = sorted(
        (r.doc_id, r.cluster_id)
        for r in dedup_clusters(pdf, all_docs=all_docs).collect()
    )
    assert got == _uf_clusters(pairs, extra_docs=DOCS)


def _py_winnow(doc_id, text, k, w):
    words = text.split(" ")
    grams = (
        [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
        if len(words) >= k
        else []
    )
    h = [
        int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams
    ]
    if len(h) < w:
        return None
    wins = sorted({min(h[i : i + w]) for i in range(len(h) - w + 1)})
    return (doc_id, len(wins), min(wins), max(wins))


texts = st.text(
    st.sampled_from("ab x yz "), max_size=60
)  # tiny alphabet with spaces: empty words, repeats, short docs


@settings(max_examples=8, **SETTINGS)
@given(
    docs=st.dictionaries(
        st.sampled_from(DOCS), texts, min_size=1, max_size=8
    ).map(lambda d: sorted(d.items())),
    k=st.integers(1, 3),
    w=st.integers(1, 4),
)
def test_winnow_equals_schleimer_reference(spark, docs, k, w):
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = sorted(
        (r.doc_id, r.n_fp, r.fp_min, r.fp_max)
        for r in winnow_fingerprint(df, k=k, w=w).collect()
    )
    exp = sorted(
        r for r in (_py_winnow(d, t, k, w) for d, t in docs) if r is not None
    )
    assert got == exp


@st.composite
def embedding_corpora(draw):
    dim = draw(st.integers(1, 4))
    n = draw(st.integers(3, 12))
    comp = st.integers(-2000, 2000)
    vecs = []
    for _ in range(n):
        v = [draw(comp) for _ in range(dim)]
        if not any(v):
            v[0] = 1  # zero vectors make cosine undefined — exclude
        vecs.append(v)
    return vecs, draw(st.integers(1, 5))


@settings(max_examples=8, **SETTINGS)
@given(c=embedding_corpora())
def test_cosine_topk_equals_exact_oracle(spark, c):
    """cosine_topk == brute-force float64 oracle, bit-exact: the
    1/1000-grid quantization makes dot/norms exact BIGINTs (components
    here are exact milli-units, so float32 storage round-trips), and
    the final divide/sqrt are correctly-rounded IEEE ops identical
    across engines — similarity.py's portable-math contract."""
    import math

    from yadex_spark.operators.similarity import cosine_topk

    vecs, k = c
    n_q = 2
    df = spark.createDataFrame(
        [(i, [x / 1000.0 for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = sorted(
        (r.query_id, r.neighbor_id, r.rnk, r.cos)
        for r in cosine_topk(df, n_queries=n_q, k=k).collect()
    )
    exp = []
    for qid in range(n_q):
        q = vecs[qid]
        na2 = sum(x * x for x in q)
        scored = []
        for nid in range(n_q, len(vecs)):
            v = vecs[nid]
            dot = sum(x * y for x, y in zip(q, v))
            nb2 = sum(x * x for x in v)
            scored.append((nid, float(dot) / math.sqrt(float(na2 * nb2))))
        scored.sort(key=lambda t: (-t[1], t[0]))
        exp += [
            (qid, nid, rnk + 1, cos) for rnk, (nid, cos) in enumerate(scored[:k])
        ]
    assert got == sorted(exp)


def _py_mix_rates(docs, target_bp):
    toks: dict[str, int] = {}
    for _, src, text in docs:
        toks[src] = toks.get(src, 0) + (len(text) + 3) // 4
    k = min(
        (10000 * toks[s]) // w
        for s, w in target_bp.items()
        if w > 0 and s in toks
    )
    out = []
    for s, t in toks.items():
        w = target_bp.get(s, 0)
        rate = min(10000, (w * k) // t) if w > 0 else 0
        out.append((s, t, w, rate))
    return sorted(out)


@settings(max_examples=8, **SETTINGS)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(0, 99),
            st.sampled_from(["web", "books", "code"]),
            st.text(st.sampled_from("abc "), min_size=1, max_size=30),
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda r: r[0],
    ),
    target_bp=st.fixed_dictionaries(
        {},
        optional={
            "web": st.integers(1, 9000),
            "books": st.integers(1, 9000),
            "code": st.integers(1, 9000),
        },
    ),
)
def test_mix_rates_equals_waterfilling_oracle(spark, docs, target_bp):
    sources = {src for _, src, _ in docs}
    if not any(target_bp.get(s, 0) > 0 for s in sources):
        return  # K undefined when no present source is targeted
    df = spark.createDataFrame(
        [(f"d{i}", s, t) for i, s, t in docs],
        "doc_id string, source string, text string",
    )
    got = sorted(
        (r.source, r.n_tokens, r.share_target_bp, r.rate_bp)
        for r in mix_rates(df, target_bp).collect()
    )
    exp = _py_mix_rates(docs, target_bp)
    assert got == exp
    for _, _, w, rate in got:
        assert 0 <= rate <= 10000 and (w > 0 or rate == 0)
