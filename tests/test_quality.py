"""FK-edge profiling (operators/quality.py): orphan detection on a
frame that HAS orphans (clean testdata can't exercise the counting),
NULL-FK convention, and coverage arithmetic."""

from __future__ import annotations

from streaming_recommendation_spark.operators.quality import (
    fk_profile,
    fk_profile_suite,
)


def test_fk_profile_counts_orphans_and_coverage(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20), (4, 99), (5, 99), (6, None)],
        "row_id bigint, fk bigint",
    )
    parent = spark.createDataFrame(
        [(10,), (20,), (30,)], "pk bigint"
    )  # 30 never referenced; 99 and NULL are orphans
    r = fk_profile(child, "fk", parent, "pk", "child.fk->parent.pk").collect()[0]
    assert r.edge == "child.fk->parent.pk"
    assert r.child_rows == 6
    assert r.distinct_fk == 4  # 10, 20, 99, NULL
    assert r.orphan_rows == 3  # two 99s + one NULL
    assert r.orphan_keys == 2  # 99 and NULL
    assert r.parents == 3
    assert r.coverage == 2 / 3  # 10 and 20 referenced, 30 not


def test_fk_profile_suite_unions_edges(spark):
    c = spark.createDataFrame([(1, 1)], "row_id bigint, fk bigint")
    p = spark.createDataFrame([(1,)], "pk bigint")
    got = {r.edge for r in fk_profile_suite(
        [(c, "fk", p, "pk", "a"), (c, "fk", p, "pk", "b")]
    ).collect()}
    assert got == {"a", "b"}


def test_fk_profile_testdata_coverage_discriminates(spark):
    """On the synthetic TPC-H-ish data the orders edge must show
    genuine under-coverage (orders with no lineitems exist) while
    the part edge is fully covered — the non-degeneracy pin for
    q170: coverage discriminates between edges even on orphan-free
    data."""
    from streaming_recommendation_spark.queries import registry

    from .conftest import SF_DIR

    rows = {r.edge: r for r in registry()["q170_fk_profile"].fn(spark, SF_DIR).collect()}
    okey = rows["lineitem.l_orderkey->orders.o_orderkey"]
    part = rows["lineitem.l_partkey->part.p_partkey"]
    assert 0 < okey.coverage < 1
    assert part.coverage == 1.0
    assert all(r.orphan_rows == 0 for r in rows.values())


def test_fk_profile_duplicate_parent_keys_do_not_inflate(spark):
    """A parent with DUPLICATE primary keys — the corrupt-snapshot
    condition the audit exists to catch — must not multiply the join:
    child counts stay exact and parents counts distinct keys
    (review-pass regression)."""
    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20)], "row_id bigint, fk bigint"
    )
    parent = spark.createDataFrame([(10,), (10,), (30,)], "pk bigint")
    r = fk_profile(child, "fk", parent, "pk", "e").collect()[0]
    assert r.child_rows == 3  # NOT 5 (the dup-join inflation)
    assert r.distinct_fk == 2
    assert r.orphan_rows == 1 and r.orphan_keys == 1  # fk=20
    assert r.parents == 2  # distinct {10, 30}
    assert r.coverage == 1 / 2


def test_snapshot_audit_all_three_check_families(spark):
    """One synthetic snapshot exercising a NULL cell, a duplicated
    composite PK, and an orphaned FK — every check family reports a
    non-zero bad_rows somewhere and exact metrics everywhere."""
    from streaming_recommendation_spark.operators.quality import (
        snapshot_audit,
    )

    users = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c")], "uid bigint, name string"
    )
    # composite PK (uid, day): (1, 5) appears twice
    visits = spark.createDataFrame(
        [(1, 5, 10), (1, 5, 11), (2, 6, 12), (9, 7, 13)],
        "uid bigint, day bigint, visit bigint",
    )  # uid=9 is an FK orphan
    out = {
        (r.check_type, r.target): r
        for r in snapshot_audit(
            {"users": users, "visits": visits},
            {"users": ["uid"], "visits": ["uid", "day"]},
            [(visits, "uid", users, "uid", "visits.uid->users.uid")],
        ).collect()
    }
    # 2 + 3 columns + 2 pks + 1 edge = 8 checks
    assert len(out) == 8

    nn = out[("null_rate", "users.name")]
    assert (nn.n_rows, nn.bad_rows, nn.metric) == (3, 1, 2 / 3)
    clean = out[("null_rate", "visits.visit")]
    assert (clean.n_rows, clean.bad_rows, clean.metric) == (4, 0, 1.0)

    dp = out[("dup_pk", "visits.uid+day")]
    assert (dp.n_rows, dp.bad_rows, dp.metric) == (4, 1, 3 / 4)
    ok = out[("dup_pk", "users.uid")]
    assert (ok.n_rows, ok.bad_rows, ok.metric) == (3, 0, 1.0)

    fk = out[("fk_orphans", "visits.uid->users.uid")]
    assert (fk.n_rows, fk.bad_rows) == (4, 1)
    assert fk.metric == 2 / 3  # uids 1,2 referenced of 3 parents


def _vals(spark, xs):
    return spark.createDataFrame([(float(v),) for v in xs], "v double")


def test_drift_report_zero_for_identical_distributions(spark):
    from streaming_recommendation_spark.operators.quality import drift_report

    ref = _vals(spark, [i / 10 for i in range(100)])
    out = drift_report(ref, ref, "v", nbins=10).collect()
    assert len(out) == 10
    assert all(r.drift_term == 0 for r in out)
    assert all(r.c_ref == r.c_cur for r in out)


def test_drift_report_matches_python_reference_on_planted_shift(spark):
    """All current mass moved into the top reference bin: every term
    equals the integer formula recomputed in pure Python, and the
    summed distance is large."""
    from streaming_recommendation_spark.operators.quality import drift_report

    ref_xs = [i / 10 for i in range(100)]        # uniform over 10 bins
    cur_xs = [9.9] * 50                          # all in the last bin
    out = {r.bin: r for r in drift_report(
        _vals(spark, ref_xs), _vals(spark, cur_xs), "v", nbins=10
    ).collect()}

    # python reference: cents grid fixed by ref min/max
    cents_r = [int(v * 100) for v in ref_xs]
    cents_c = [int(v * 100) for v in cur_xs]
    lo, hi = min(cents_r), max(cents_r)

    def b(c):
        return min(9, max(0, ((c - lo) * 10) // (hi - lo + 1)))

    cr = [0] * 10
    for c in cents_r:
        cr[b(c)] += 1
    cc = [0] * 10
    for c in cents_c:
        cc[b(c)] += 1
    n_r, n_c = sum(cr), sum(cc)
    for i in range(10):
        if cr[i] + cc[i] == 0:
            want = 0
        else:
            d = cr[i] * n_c - cc[i] * n_r
            want = (d * d * 1_000_000) // (
                n_r * n_c * (cr[i] * n_c + cc[i] * n_r)
            )
        assert out[i].drift_term == want, i
        assert (out[i].c_ref, out[i].c_cur) == (cr[i], cc[i]), i
    total = sum(r.drift_term for r in out.values())
    assert total > 1_000_000  # a gross shift reads as major drift


def test_drift_report_clamps_out_of_range_current_values(spark):
    from streaming_recommendation_spark.operators.quality import drift_report

    ref = _vals(spark, [1.0, 2.0, 3.0, 4.0])
    cur = _vals(spark, [-50.0, 999.0])
    out = {r.bin: r for r in drift_report(ref, cur, "v", nbins=4).collect()}
    assert out[0].c_cur == 1 and out[3].c_cur == 1
    assert sum(r.c_cur for r in out.values()) == 2


def _cats(spark, xs):
    return spark.createDataFrame([(x,) for x in xs], "k string")


def test_categorical_drift_appearing_category_is_exact(spark):
    """A category present only in the current snapshot contributes
    its full one-sided mass (the PSI log(0) alarm case, exact here),
    and identical mixes read zero."""
    from streaming_recommendation_spark.operators.quality import (
        categorical_drift,
    )

    ref = _cats(spark, ["a"] * 60 + ["b"] * 40)
    cur = _cats(spark, ["a"] * 30 + ["b"] * 20 + ["NEW"] * 50)
    out = {r.category: r for r in
           categorical_drift(ref, cur, "k").collect()}
    assert set(out) == {"a", "b", "NEW"}
    n_r, n_c = 100, 100

    def term(cr, cc):
        d = cr * n_c - cc * n_r
        return (d * d * 1_000_000) // (n_r * n_c * (cr * n_c + cc * n_r))

    assert out["NEW"].drift_term == term(0, 50)
    assert out["a"].drift_term == term(60, 30)
    assert out["b"].drift_term == term(40, 20)
    same = {r.category: r.drift_term for r in
            categorical_drift(ref, ref, "k").collect()}
    assert all(v == 0 for v in same.values())


def test_categorical_drift_drops_nulls_both_sides(spark):
    from streaming_recommendation_spark.operators.quality import (
        categorical_drift,
    )

    ref = _cats(spark, ["a", "a", None])
    cur = _cats(spark, ["a", None, None])
    out = categorical_drift(ref, cur, "k").collect()
    assert [r.category for r in out] == ["a"]
    assert (out[0].c_ref, out[0].c_cur) == (2, 1)
    # both sides all-'a' after null drop -> identical mix, zero drift
    assert out[0].drift_term == 0
