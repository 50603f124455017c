"""Randomized model-based tests: each operator runs ONCE over a few
hundred seeded-random cases (heavy tie/duplicate density) and is
compared row-for-row against an independent pure-Python model — the
reference's own algorithm (e.g. bisect_right for as-of lookups)."""

from __future__ import annotations

import bisect
import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from streaming_recommendation_spark.operators.asof import asof_join
from streaming_recommendation_spark.operators.history import (
    sliding_window_samples,
)

SEED = 20260813


@pytest.fixture(scope="module")
def random_events_probes():
    rng = random.Random(SEED)
    events, probes = [], []
    for u in range(25):
        n = rng.randint(0, 12)
        # small ts domain => many exact ties and probe==event collisions
        tss = sorted(rng.randint(0, 30) for _ in range(n))
        for i, ts in enumerate(tss):
            events.append(Row(user_id=u, ts=ts, event_id=u * 100 + i))
        for _ in range(rng.randint(1, 6)):
            probes.append(Row(user_id=u, ts=rng.randint(-5, 35)))
    return events, probes


def model_asof(events, probes, tolerance=None):
    """The reference's algorithm: per-user sorted list + bisect_right
    (behavior_lookup.py:34-41), with our documented tie-break (max
    event_id among equal ts)."""
    by_user = {}
    for e in events:
        by_user.setdefault(e.user_id, []).append((e.ts, e.event_id))
    for lst in by_user.values():
        lst.sort()
    out = {}
    for p in probes:
        lst = by_user.get(p.user_id, [])
        idx = bisect.bisect_right([t for t, _ in lst], p.ts)
        if idx == 0:
            out[(p.user_id, p.ts)] = None
            continue
        best_ts = lst[idx - 1][0]
        if tolerance is not None and p.ts - best_ts > tolerance:
            out[(p.user_id, p.ts)] = None
            continue
        out[(p.user_id, p.ts)] = max(eid for t, eid in lst if t == best_ts)
    return out


@pytest.mark.parametrize("tolerance", [None, 7])
def test_asof_matches_bisect_model(spark, random_events_probes, tolerance):
    events, probes = random_events_probes
    edf = spark.createDataFrame(events)
    pdf = spark.createDataFrame(list({(p.user_id, p.ts) for p in probes}))
    pdf = pdf.toDF("user_id", "ts")
    got = {
        (r.user_id, r.ts): r.event_id
        for r in asof_join(
            pdf, edf, value_cols=["event_id"], tiebreak="event_id",
            tolerance=tolerance,
        ).collect()
    }
    expected = model_asof(events, [Row(user_id=u, ts=t) for u, t in got], tolerance)
    assert got == expected


def test_sliding_samples_match_reference_loop(spark):
    """Model: the reference's generate_training_data.py:163-178 loop
    — for idx in range(start, len, stride): prefix = history[:idx],
    candidate = history[idx], prefix tail-truncated."""
    rng = random.Random(SEED + 1)
    rows = []
    for u in range(15):
        n = rng.randint(0, 10)
        tss = sorted(rng.sample(range(100), n))
        for i, ts in enumerate(tss):
            rows.append(Row(user_id=u, ts=ts, item_id=u * 100 + i))
    df = spark.createDataFrame(rows, schema="user_id int, ts int, item_id int")

    start, stride, max_h = 1, 2, 4
    got = {
        (r.user_id, r.pos): (tuple(r.history), r.candidate)
        for r in sliding_window_samples(
            df, start=start, stride=stride, max_history=max_h
        ).collect()
    }

    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.ts, r.item_id))
    expected = {}
    for u, lst in by_user.items():
        lst.sort()
        items = [i for _, i in lst]
        for idx in range(start, len(items), stride):
            expected[(u, idx)] = (tuple(items[:idx][-max_h:]), items[idx])
    assert got == expected


def test_det_unit_range_and_uniformity(spark):
    from streaming_recommendation_spark.functions.hashing import det_unit

    df = spark.range(0, 50_000).select(
        det_unit("id").alias("u_int"),
        det_unit(F.concat(F.lit("k"), F.col("id")), string=True).alias("u_str"),
    )
    stats = df.agg(
        F.min("u_int"), F.max("u_int"), F.avg("u_int"),
        F.min("u_str"), F.max("u_str"), F.avg("u_str"),
    ).collect()[0]
    assert 0.0 <= stats[0] and stats[1] < 1.0
    assert 0.0 <= stats[3] and stats[4] < 1.0
    assert abs(stats[2] - 0.5) < 0.02  # uniform-ish mean
    assert abs(stats[5] - 0.5) < 0.02
    # decile balance for the string hash (the sampling workhorse)
    deciles = (
        df.groupBy(F.floor(F.col("u_str") * 10).alias("d")).count().collect()
    )
    for r in deciles:
        assert abs(r["count"] - 5000) < 350, r


def test_tail_slice_all_lengths(spark):
    from streaming_recommendation_spark.operators.history import tail_slice

    df = spark.range(0, 12).select(
        F.sequence(F.lit(1), F.col("id").cast("int")).alias("arr")
    )
    out = df.select("arr", tail_slice(F.col("arr"), 5).alias("t")).collect()
    for r in out:
        assert r.t == r.arr[-5:]


def test_dict_encode_matches_dense_rank(spark):
    """The distributed per-partition-offset encoder must equal the
    single-partition dense_rank spec (q27) exactly."""
    from pyspark.sql import Window

    from streaming_recommendation_spark.operators.encode import dict_encode
    from streaming_recommendation_spark.sources.testdata import load_table

    ev = load_table(spark, "events", "/root/testdata/sf0.001")
    got = {
        r.user_id: r.idx for r in dict_encode(ev, "user_id", num_partitions=7).collect()
    }
    spec = {
        r.user_id: r.idx
        for r in ev.select("user_id")
        .distinct()
        .withColumn("idx", F.dense_rank().over(Window.orderBy("user_id")) - 1)
        .collect()
    }
    assert got == spec


def test_sliding_samples_window_strategy_equals_array(spark):
    """The whale-safe window-frame variant must produce byte-identical
    samples to the array variant on the events table."""
    from streaming_recommendation_spark.sources.testdata import load_table

    ev = load_table(spark, "events", "/root/testdata/sf0.001")
    kw = dict(
        user_col="user_id", ts_col="ts", item_col="event_id",
        start=1, stride=2, max_history=7,
    )
    a = {
        (r.user_id, r.pos): (tuple(r.history), r.candidate)
        for r in sliding_window_samples(ev, strategy="array", **kw).collect()
    }
    b = {
        (r.user_id, r.pos): (tuple(r.history), r.candidate)
        for r in sliding_window_samples(ev, strategy="window", **kw).collect()
    }
    assert a == b and len(a) > 100


def test_sliding_window_reference_parity_knobs(spark):
    """truncate + active_start reproduce generate_training_data.py's
    loop exactly (truncate to last max_history BEFORE windowing;
    start index = min_history_len for users at/above it) — and both
    strategies agree."""
    from pyspark.sql import Row

    rows = []
    # heavy user: 12 events -> truncated to last 8, start at 4 (active)
    rows += [Row(user_id="heavy", ts=100 + i, item_id=f"h{i:02d}") for i in range(12)]
    # light user: 3 events -> start at 1
    rows += [Row(user_id="light", ts=200 + i, item_id=f"l{i}") for i in range(3)]
    df = spark.createDataFrame(rows)

    def python_reference(seq, truncate, active_start, start, stride, max_history):
        out = []
        cnt = len(seq)
        st = active_start if cnt >= active_start else start
        trunc = seq[-truncate:] if cnt > truncate else seq
        for idx in range(st, len(trunc), stride):
            hist = trunc[:idx][-max_history:]
            if hist:
                out.append((tuple(hist), trunc[idx], idx))
        return sorted(out)

    expect = {
        "heavy": python_reference([f"h{i:02d}" for i in range(12)], 8, 4, 1, 2, 8),
        "light": python_reference(["l0", "l1", "l2"], 8, 4, 1, 2, 8),
    }
    for strategy in ("array", "window"):
        got = {}
        res = sliding_window_samples(
            df, "user_id", "ts", "item_id", start=1, stride=2,
            max_history=8, strategy=strategy, truncate=8, active_start=4,
        ).collect()
        for r in res:
            got.setdefault(r.user_id, []).append(
                (tuple(r.history), r.candidate, r.pos)
            )
        for u in expect:
            assert sorted(got.get(u, [])) == expect[u], (strategy, u)


@pytest.mark.parametrize("how", ["inner", "left", "left_semi", "left_anti"])
def test_salted_join_equals_plain_join_randomized(spark, how):
    """Property: salting is pure physical redistribution — for every
    supported join type, salted_join == plain join on random data
    with hot keys, unmatched keys on both sides, and NULL keys."""
    from streaming_recommendation_spark.operators.skew import salted_join

    rng = random.Random(42 + len(how))
    big_rows = [
        (
            rng.choice([0, 0, 0, 1, 2, 3, 4, 5, 99, None]),  # 0 is hot; 99 unmatched
            rng.randint(0, 1000),
        )
        for _ in range(400)
    ]
    small_rows = [(k, f"dim{k}") for k in [0, 1, 2, 3, 4, 5, 77]]
    big = spark.createDataFrame(big_rows, "k int, payload int")
    small = spark.createDataFrame(small_rows, "k int, tag string")

    got = sorted(map(tuple, salted_join(big, small, "k", 4, how).collect()), key=repr)
    want = sorted(map(tuple, big.join(small, "k", how).collect()), key=repr)
    assert got == want


def test_hll_register_merge_exact_on_random_splits(spark):
    """Property: merging per-split register tables (any split count)
    equals the single-pass registers — the invariant the streaming
    sketch pipeline relies on."""
    from streaming_recommendation_spark.operators.sketch import (
        hll_distinct,
        hll_from_registers,
        hll_registers,
        merge_hll_registers,
    )

    rng = random.Random(7)
    rows = [(f"g{rng.randint(0, 2)}", rng.randint(0, 5000)) for _ in range(3000)]
    df = spark.createDataFrame(rows, "g string, k long")
    # random 3-way split by a hash nobody else uses
    parts = [
        df.where(F.abs(F.xxhash64("k", "g") % 3) == i) for i in range(3)
    ]
    merged = hll_registers(parts[0], "k", ["g"])
    for p in parts[1:]:
        merged = merge_hll_registers(merged, hll_registers(p, "k", ["g"]), ["g"])
    got = sorted(map(tuple, hll_from_registers(merged, ["g"]).collect()))
    want = sorted(map(tuple, hll_distinct(df, "k", ["g"]).collect()))
    assert got == want


def test_cms_counter_merge_exact_on_random_splits(spark):
    from streaming_recommendation_spark.operators.sketch import cms_counts

    rng = random.Random(11)
    rows = [(rng.randint(0, 300),) for _ in range(4000)]
    df = spark.createDataFrame(rows, "k long")
    parts = [df.where(F.abs(F.xxhash64("k") % 4) == i) for i in range(4)]
    merged = None
    for p in parts:
        c = cms_counts(p, "k")
        merged = c if merged is None else (
            merged.unionByName(c).groupBy("row", "slot").agg(
                F.sum("c").alias("c")
            )
        )
    got = sorted(map(tuple, merged.collect()))
    want = sorted(map(tuple, cms_counts(df, "k").collect()))
    assert got == want
