"""As-of join (asof.py) and KMV distinct sketch (sketch.py).

The as-of tests compare the scalable union-merge implementation
against a brute-force per-row oracle (inequality join + argmax) on
seeded random data, which is exactly the plan shape the operator
exists to avoid.  The sketch tests pin exactness below k, the
estimator's error envelope above it, and partitioning invariance.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from yadex_spark.operators.asof import asof_join
from yadex_spark.operators.sketch import distinct_kmv


def _mk_frames(spark, seed=7, n_left=300, n_right=120, n_keys=12):
    rng = random.Random(seed)
    left = [
        (i, rng.randrange(n_keys), rng.randrange(0, 10_000))
        for i in range(n_left)
    ]
    right = [
        (1000 + j, rng.randrange(n_keys), rng.randrange(0, 10_000), float(j) * 1.5)
        for j in range(n_right)
    ]
    ldf = spark.createDataFrame(left, "lid long, k long, ts long")
    rdf = spark.createDataFrame(right, "rid long, k long, ts long, val double")
    return left, right, ldf, rdf


def _brute_backward(left, right, tolerance=None):
    out = {}
    for lid, k, ts in left:
        best = None
        for rid, rk, rts, val in right:
            if rk != k or rts > ts:
                continue
            if tolerance is not None and ts - rts > tolerance:
                continue
            # greatest rts wins; tie on rts -> greatest rid (tiebreak col)
            if best is None or (rts, rid) > (best[0], best[1]):
                best = (rts, rid, val)
        out[lid] = (best[1], best[2]) if best else (None, None)
    return out


def test_asof_backward_matches_bruteforce(spark):
    left, right, ldf, rdf = _mk_frames(spark)
    res = asof_join(
        ldf, rdf, "k", "k", "ts", "ts", ["rid", "val"], tiebreak="rid"
    ).collect()
    want = _brute_backward(left, right)
    assert len(res) == len(left)
    for row in res:
        assert (row.rid, row.val) == want[row.lid], row


def test_asof_tolerance_nulls_stale_matches(spark):
    left, right, ldf, rdf = _mk_frames(spark, seed=11)
    res = asof_join(
        ldf, rdf, "k", "k", "ts", "ts", ["rid", "val"],
        tolerance=500, tiebreak="rid",
    ).collect()
    want = _brute_backward(left, right, tolerance=500)
    hits = sum(1 for r in res if r.rid is not None)
    assert 0 < hits < len(res)  # both paths exercised
    for row in res:
        assert (row.rid, row.val) == want[row.lid]


def test_asof_forward_direction(spark):
    left, right, ldf, rdf = _mk_frames(spark, seed=13)
    res = asof_join(
        ldf, rdf, "k", "k", "ts", "ts", ["rid"],
        direction="forward", tiebreak="rid",
    ).collect()
    want = {}
    for lid, k, ts in left:
        cands = [(rts, rid) for rid, rk, rts, _ in right if rk == k and rts >= ts]
        # least rts wins; equal-ts ties resolve to the LAST in tiebreak
        # order (max rid), same contract as backward
        want[lid] = (
            max(r for t, r in cands if t == min(c[0] for c in cands))
            if cands
            else None
        )
    for row in res:
        assert row.rid == want[row.lid]


def test_asof_struct_carry_does_not_tear_null_payload(spark):
    # right row B is later than A but carries a NULL val; a column-wise
    # carry would pair B's rid with A's val — the struct carry must not.
    ldf = spark.createDataFrame([(1, 0, 100)], "lid long, k long, ts long")
    rdf = spark.createDataFrame(
        [(10, 0, 10, 5.0), (20, 0, 20, None)],
        "rid long, k long, ts long, val double",
    )
    row = asof_join(ldf, rdf, "k", "k", "ts", "ts", ["rid", "val"]).collect()[0]
    assert row.rid == 20 and row.val is None


def test_asof_bucketed_equals_unbucketed(spark):
    # the hot-key mitigation must be a pure physical rewrite: same
    # matches at any bucket width, both directions, ties included
    left, right, ldf, rdf = _mk_frames(spark, seed=23, n_keys=4)
    # force equal-(key, ts) right ties so the seed's tiebreak matters
    rdf = rdf.unionByName(
        rdf.limit(10).withColumn("rid", F.col("rid") + 5000)
    )
    for direction in ("backward", "forward"):
        base = sorted(
            map(
                tuple,
                asof_join(
                    ldf, rdf, "k", "k", "ts", "ts", ["rid", "val"],
                    direction=direction, tiebreak="rid",
                ).collect(),
            )
        )
        for w in (97.0, 1000.0, 1e9):
            got = sorted(
                map(
                    tuple,
                    asof_join(
                        ldf, rdf, "k", "k", "ts", "ts", ["rid", "val"],
                        direction=direction, tiebreak="rid", bucket_width=w,
                    ).collect(),
                )
            )
            assert got == base, (direction, w)


def test_asof_bucketed_with_tolerance(spark):
    left, right, ldf, rdf = _mk_frames(spark, seed=29)
    base = sorted(
        map(
            tuple,
            asof_join(
                ldf, rdf, "k", "k", "ts", "ts", ["rid"],
                tolerance=700, tiebreak="rid",
            ).collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            asof_join(
                ldf, rdf, "k", "k", "ts", "ts", ["rid"],
                tolerance=700, tiebreak="rid", bucket_width=150.0,
            ).collect(),
        )
    )
    assert got == base


def test_asof_payload_collision_rejected(spark):
    _, _, ldf, rdf = _mk_frames(spark)
    try:
        asof_join(ldf.withColumnRenamed("lid", "rid"), rdf, "k", "k", "ts", "ts", ["rid"])
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame(
        [("a", f"w{i}") for i in range(40)] * 3, "grp string, w string"
    )
    row = distinct_kmv(df, "grp", F.col("w"), k=64).collect()[0]
    assert row.n_kept == 40 and row.est_distinct == 40


def test_kmv_estimate_within_error_envelope(spark):
    # 5000 distinct values, k=64: relative std error ~ 1/sqrt(k-2) ~= 13%;
    # assert a 3-sigma envelope.
    n = 5000
    df = spark.createDataFrame(
        [("a", f"value-{i}") for i in range(n)], "grp string, w string"
    )
    row = distinct_kmv(df, "grp", F.col("w"), k=64).collect()[0]
    assert row.n_kept == 64
    assert abs(row.est_distinct - n) / n < 0.4, row.est_distinct


def test_kmv_state_merge_equals_single_pass(spark):
    # the union law: merging half-corpus sketches == sketching the whole
    from yadex_spark.operators.sketch import distinct_kmv, kmv_estimate, kmv_merge, kmv_state

    df = spark.createDataFrame(
        [(f"g{i % 2}", f"word-{i % 700}") for i in range(3000)], "grp string, w string"
    )
    a = kmv_state(df.where(F.crc32("w") % 2 == 0), "grp", F.col("w"))
    b = kmv_state(df.where(F.crc32("w") % 2 == 1), "grp", F.col("w"))
    merged = sorted(map(tuple, kmv_estimate(kmv_merge(a, b, "grp"), "grp").collect()))
    single = sorted(map(tuple, distinct_kmv(df, "grp", F.col("w")).collect()))
    assert merged == single


def test_kmv_merge_disjoint_group(spark):
    # a group present on only one side must pass through unchanged
    from yadex_spark.operators.sketch import kmv_merge, kmv_state

    a = kmv_state(
        spark.createDataFrame([("only_a", "x"), ("both", "y")], "grp string, w string"),
        "grp", F.col("w"),
    )
    b = kmv_state(
        spark.createDataFrame([("both", "z")], "grp string, w string"),
        "grp", F.col("w"),
    )
    rows = {r.grp: r.hs for r in kmv_merge(a, b, "grp").collect()}
    assert len(rows["only_a"]) == 1 and len(rows["both"]) == 2


def test_range_join_matches_bruteforce(spark):
    from yadex_spark.operators.rangejoin import range_join

    rng = random.Random(3)
    pts = [(i, rng.uniform(-100.0, 100.0)) for i in range(400)]
    ivs = []
    for j in range(60):
        lo = rng.uniform(-120.0, 90.0)
        ivs.append((j, lo, lo + rng.uniform(0.0, 40.0)))
    pdf = spark.createDataFrame(pts, "pid long, v double")
    idf = spark.createDataFrame(ivs, "iid long, lo double, hi double")
    got = sorted(
        (r.pid, r.iid)
        for r in range_join(pdf, idf, "v", "lo", "hi", bin_width=10.0).collect()
    )
    want = sorted(
        (pid, iid)
        for pid, v in pts
        for iid, lo, hi in ivs
        if lo <= v <= hi
    )
    assert got == want and len(want) > 0


def test_range_join_bin_width_invariant(spark):
    from yadex_spark.operators.rangejoin import range_join

    rng = random.Random(5)
    pts = [(i, rng.uniform(0.0, 50.0)) for i in range(200)]
    ivs = [(j, rng.uniform(0.0, 45.0), rng.uniform(0.0, 50.0)) for j in range(30)]
    pdf = spark.createDataFrame(pts, "pid long, v double")
    idf = spark.createDataFrame(ivs, "iid long, lo double, hi double")
    outs = [
        sorted(
            (r.pid, r.iid)
            for r in range_join(pdf, idf, "v", "lo", "hi", bin_width=w).collect()
        )
        for w in (1.0, 7.0, 100.0)
    ]
    assert outs[0] == outs[1] == outs[2]


def test_range_join_max_bins_guard(spark):
    from yadex_spark.operators.rangejoin import range_join

    pdf = spark.createDataFrame([(1, 5.0)], "pid long, v double")
    idf = spark.createDataFrame([(1, 0.0, 1e9)], "iid long, lo double, hi double")
    try:
        range_join(pdf, idf, "v", "lo", "hi", bin_width=1.0, max_bins=100).collect()
        raise AssertionError("expected runtime guard to fire")
    except Exception as e:  # noqa: BLE001 — engine wraps the raise_error
        assert "range_join" in str(e)


def test_kmv_partitioning_invariant(spark):
    df = spark.createDataFrame(
        [(f"g{i % 3}", f"w{i % 900}") for i in range(4000)], "grp string, w string"
    )
    a = sorted(map(tuple, distinct_kmv(df.repartition(1), "grp", F.col("w")).collect()))
    b = sorted(map(tuple, distinct_kmv(df.repartition(16, "w"), "grp", F.col("w")).collect()))
    assert a == b


def test_cms_overestimates_and_is_tight_when_sparse(spark):
    from yadex_spark.operators.sketch import cms_estimate, cms_sketch

    random.seed(5)
    rows = [(f"w{random.randrange(200)}",) for _ in range(5_000)]
    df = spark.createDataFrame(rows, "w string")
    exact = {r["w"]: r["n"] for r in df.groupBy("w").agg(F.count("*").alias("n")).collect()}
    sk = cms_sketch(df, "w", depth=3, width=2048)
    probes = spark.createDataFrame([(w,) for w in exact], "w string")
    est = {r["w"]: r["est"] for r in cms_estimate(sk, probes, "w", 3, 2048).collect()}
    assert set(est) == set(exact)
    assert all(est[w] >= exact[w] for w in exact)  # one-sided error, always
    # 200 distinct into 2048 cells: collisions are rare, most are exact
    assert sum(est[w] == exact[w] for w in exact) >= 150


def test_cms_merge_equals_single_pass_and_unseen_is_zero(spark):
    from yadex_spark.operators.sketch import cms_estimate, cms_merge, cms_sketch

    df = spark.createDataFrame(
        [(f"t{i % 97}", i) for i in range(3_000)], "w string, i long"
    )
    single = cms_sketch(df, "w", depth=3, width=512)
    merged = cms_merge(
        cms_sketch(df.where("i % 2 = 0"), "w", depth=3, width=512),
        cms_sketch(df.where("i % 2 = 1"), "w", depth=3, width=512),
    )
    assert sorted(map(tuple, single.collect())) == sorted(map(tuple, merged.collect()))

    probes = spark.createDataFrame([("never-seen-token",)], "w string")
    got = cms_estimate(single, probes, "w", 3, 512).collect()
    # an unseen value may collide into occupied cells; with 97 distinct
    # in 512 cells its min cell is overwhelmingly empty => 0 here
    assert got[0]["est"] == 0


def test_cms_partitioning_invariant_and_size_cap(spark):
    from yadex_spark.operators.sketch import cms_sketch

    df = spark.createDataFrame([(f"w{i % 50}",) for i in range(2_000)], "w string")
    a = sorted(map(tuple, cms_sketch(df.repartition(1), "w").collect()))
    b = sorted(map(tuple, cms_sketch(df.repartition(16, "w"), "w").collect()))
    assert a == b
    try:
        cms_sketch(df, "w", depth=8, width=1 << 22)
        raise AssertionError("expected size-cap ValueError")
    except ValueError as e:
        assert "cap" in str(e)
