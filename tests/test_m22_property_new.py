"""M22 — property-based laws for the round-5 relational/sketch operators.

The fixed-corpus gates pin one instance each; these pin the LAWS on
arbitrary small inputs:

- asof_join == the brute-force inequality-join + argmax definition for
  ANY (left, right) frames, any direction, any bucket width — ties,
  boundary-equal timestamps, empty sides, keys present on one side only;
- range_join == the literal double loop, at any bin width;
- the KMV union law: merging the sketches of ANY 2-way split of the
  rows equals the single-pass sketch (the mergeability contract the
  streaming ingest member relies on);
- funnel == the per-key chained-min replica with the strict-order NULL
  cascade, for ANY event multiset (repeated timestamps included).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from yadex_spark.operators.asof import asof_join
from yadex_spark.operators.funnel import funnel
from yadex_spark.operators.rangejoin import range_join
from yadex_spark.operators.sketch import distinct_kmv, kmv_estimate, kmv_merge, kmv_state

SETTINGS = dict(
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
    print_blob=True,
)

ts_vals = st.integers(0, 50)  # tight domain to force equal-ts collisions

left_rows = st.lists(
    st.tuples(st.integers(0, 3), ts_vals), min_size=0, max_size=15
)
right_rows = st.lists(
    st.tuples(st.integers(0, 3), ts_vals, st.integers(0, 99)),
    min_size=0, max_size=15,
)


def _brute_asof(lrows, rrows, direction):
    out = []
    for i, (k, t) in enumerate(lrows):
        if direction == "backward":
            cand = [(rt, rid) for rk, rt, rid in rrows if rk == k and rt <= t]
            best = max(cand) if cand else None
        else:
            cand = [(-rt, rid) for rk, rt, rid in rrows if rk == k and rt >= t]
            best = max(cand) if cand else None
        out.append((i, best[1] if best else None))
    return sorted(out)


@settings(max_examples=8, **SETTINGS)
@given(
    lrows=left_rows,
    rrows=right_rows,
    direction=st.sampled_from(["backward", "forward"]),
    width=st.sampled_from([None, 3.0, 13.0, 1000.0]),
)
def test_asof_law(spark, lrows, rrows, direction, width):
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lrows)] or [(None, None, None)],
        "lid long, k long, ts long",
    ).where(F.col("lid").isNotNull())
    rdf = spark.createDataFrame(
        [(i, k, t, v) for i, (k, t, v) in enumerate(rrows)] or [(None, None, None, None)],
        "rid long, k long, ts long, v long",
    ).where(F.col("rid").isNotNull())
    # the brute-force tie rule is (ts, rid)-max, i.e. tiebreak=rid
    rdf = rdf.select("k", "ts", F.col("rid").alias("tie"),
                     F.col("rid").alias("m_rid"), "v")
    got = sorted(
        (r.lid, r.m_rid)
        for r in asof_join(
            ldf, rdf, "k", "k", "ts", "ts", ["m_rid"],
            direction=direction, tiebreak="tie", bucket_width=width,
        ).collect()
    )
    want = _brute_asof(lrows, [(k, t, i) for i, (k, t, v) in enumerate(rrows)], direction)
    assert got == want


@settings(max_examples=8, **SETTINGS)
@given(
    pts=st.lists(st.tuples(st.integers(0, 40)), min_size=0, max_size=12),
    ivs=st.lists(
        st.tuples(st.integers(-5, 40), st.integers(0, 15)), min_size=0, max_size=8
    ),
    width=st.sampled_from([1.0, 4.0, 50.0]),
)
def test_range_join_law(spark, pts, ivs, width):
    pdf = spark.createDataFrame(
        [(i, float(v)) for i, (v,) in enumerate(pts)] or [(None, None)],
        "pid long, v double",
    ).where(F.col("pid").isNotNull())
    idf = spark.createDataFrame(
        [(j, float(lo), float(lo + span)) for j, (lo, span) in enumerate(ivs)]
        or [(None, None, None)],
        "iid long, lo double, hi double",
    ).where(F.col("iid").isNotNull())
    got = sorted(
        (r.pid, r.iid)
        for r in range_join(pdf, idf, "v", "lo", "hi", bin_width=width).collect()
    )
    want = sorted(
        (i, j)
        for i, (v,) in enumerate(pts)
        for j, (lo, span) in enumerate(ivs)
        if lo <= v <= lo + span
    )
    assert got == want


@settings(max_examples=6, **SETTINGS)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.text("abcde", min_size=1, max_size=3)),
        min_size=1, max_size=40,
    ),
    split_mod=st.integers(2, 4),
)
def test_kmv_union_law(spark, rows, split_mod):
    df = spark.createDataFrame(
        [(f"g{g}", w) for g, w in rows], "grp string, w string"
    )
    a = kmv_state(df.where(F.crc32("w") % split_mod == 0), "grp", F.col("w"), k=8)
    b = kmv_state(df.where(F.crc32("w") % split_mod != 0), "grp", F.col("w"), k=8)
    merged = sorted(
        map(tuple, kmv_estimate(kmv_merge(a, b, "grp", k=8), "grp", k=8).collect())
    )
    single = sorted(map(tuple, distinct_kmv(df, "grp", F.col("w"), k=8).collect()))
    assert merged == single


@settings(max_examples=6, **SETTINGS)
@given(
    evs=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 30), st.sampled_from(["a", "b", "c"])),
        min_size=1, max_size=40,
    )
)
def test_funnel_law(spark, evs):
    df = spark.createDataFrame(evs, "uid long, ts long, et string")
    got = {
        r.uid: (r.t_a, r.t_b, r.t_c)
        for r in funnel(df, "uid", "ts", "et", ["a", "b", "c"]).collect()
    }
    want = {}
    for uid in {u for u, _, _ in evs}:
        prev, out = None, []
        for stage in ("a", "b", "c"):
            cand = [
                t for u, t, e in evs
                if u == uid and e == stage and (prev is None or t > prev)
            ]
            prev = min(cand) if cand else None
            out.append(prev)
            if prev is None:
                break
        want[uid] = tuple((out + [None, None, None])[:3])
    assert got == want
