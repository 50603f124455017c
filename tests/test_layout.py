"""Physical layout: partition pruning and bucketed shuffle
elimination, verified against the actual physical plans."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from streaming_recommendation_spark.sources.layout import (
    read_table,
    write_bucketed,
    write_partitioned,
)
from streaming_recommendation_spark.sources.testdata import load_table

from .conftest import SF_DIR


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def n_exchanges(plan: str) -> int:
    import re

    return len(re.findall(r"\(\d+\) Exchange", plan))


def test_partition_pruning(spark, tmp_path):
    ev = load_table(spark, "events", SF_DIR)
    out = str(tmp_path / "events_by_type")
    write_partitioned(ev, out, ["event_type"])

    back = spark.read.parquet(out).where(F.col("event_type") == "purchase")
    plan = plan_of(back)
    assert "PartitionFilters" in plan
    # pruned scan returns exactly the purchases
    expected = ev.where(F.col("event_type") == "purchase").count()
    assert back.count() == expected


def test_bucketed_join_skips_shuffle(spark):
    ev = load_table(spark, "events", SF_DIR)
    users = ev.select("user_id").distinct().withColumn(
        "segment", (F.col("user_id") % 5).cast("int")
    )
    write_bucketed(ev, "ev_bucketed", "user_id", num_buckets=8, sort_col="user_id")
    write_bucketed(users, "users_bucketed", "user_id", num_buckets=8)

    a = read_table(spark, "ev_bucketed")
    b = read_table(spark, "users_bucketed")
    joined = a.join(b.hint("merge"), "user_id")
    plan = plan_of(joined)
    # both sides bucketed on the join key with equal bucket counts:
    # the sort-merge join must run without any Exchange node
    assert n_exchanges(plan) == 0, plan
    assert joined.count() == ev.count()

    # aggregation on the bucket key also skips its shuffle
    agg = a.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    agg_plan = plan_of(agg)
    assert n_exchanges(agg_plan) == 0, agg_plan
    assert agg.count() == ev.select("user_id").distinct().count()


def test_unbucketed_join_does_shuffle(spark):
    """Control: the same join without bucketing has Exchanges — proves
    the assertion above is meaningful."""
    ev = load_table(spark, "events", SF_DIR)
    users = ev.select("user_id").distinct()
    joined = ev.join(users.hint("merge"), "user_id")
    assert n_exchanges(plan_of(joined)) >= 2


def test_bucketed_window_query_skips_shuffle(spark):
    """The repeat-query story for per-user operators (SURVEY M2):
    last-N / as-of windows partition by user_id, so over a table
    bucketed by user_id they run with no Exchange at all."""
    from streaming_recommendation_spark.operators.history import last_n_events

    ev = load_table(spark, "events", SF_DIR).withColumn(
        "ts_sec", F.unix_timestamp("ts")
    )
    write_bucketed(ev, "ev_by_user", "user_id", num_buckets=8, sort_col="user_id")
    bucketed = read_table(spark, "ev_by_user")

    last5 = last_n_events(bucketed, 5, "user_id", "ts_sec", "event_id")
    plan = plan_of(last5)
    assert n_exchanges(plan) == 0, plan
    # and the control: same query on the raw parquet shuffles
    raw5 = last_n_events(ev, 5, "user_id", "ts_sec", "event_id")
    assert n_exchanges(plan_of(raw5)) >= 1


def test_ivf_cells_partition_pruned(spark, tmp_path):
    """The ANN-at-rest story: persist the corpus partitioned by IVF
    cell id; a probe read filtering on the probed cells must prune
    partitions at the scan (PartitionFilters), and scoring over the
    pruned scan must equal the all-in-memory ivf_knn."""
    from streaming_recommendation_spark.functions.vectors import (
        cosine_similarity,
    )
    from streaming_recommendation_spark.operators.similarity import (
        ivf_assign,
        ivf_knn,
        ivf_landmarks,
    )
    from streaming_recommendation_spark.operators.topk import top_k_per_group

    emb = load_table(spark, "embeddings", SF_DIR)
    landmarks = ivf_landmarks(emb, num_landmarks=8)
    cells = ivf_assign(
        emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cvec")),
        landmarks, "neighbor_id", "cvec", 1,
    )
    path = str(tmp_path / "ivf_cells")
    write_partitioned(cells, path, ["__lid"])

    qdf = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    probes = ivf_assign(qdf, landmarks, "query_id", "qvec", 2)
    probed_cells = sorted({r[0] for r in probes.select("__lid").collect()})
    assert len(probed_cells) < 8, "probe set must prune at least one cell"

    at_rest = spark.read.parquet(path).where(F.col("__lid").isin(probed_cells))
    plan = plan_of(at_rest)
    assert "PartitionFilters" in plan and "__lid" in plan

    scored = at_rest.join(probes, "__lid").select(
        "query_id", "neighbor_id",
        cosine_similarity("qvec", "cvec").alias("score"),
    )
    got = {
        (r.query_id, r.rank): r.neighbor_id
        for r in top_k_per_group(
            scored, 5, ["query_id"],
            F.col("score").desc(), F.col("neighbor_id").asc(), rank_col="rank",
        ).collect()
    }
    expect = {
        (r.query_id, r.rank): r.neighbor_id
        for r in ivf_knn(emb, qdf.select("query_id", F.col("qvec").alias("embedding")),
                         k=5, num_landmarks=8, n_probe=2).collect()
    }
    assert got == expect


def test_write_compacted_bounds_file_counts(spark, tmp_path):
    """Partitioned write without compaction sprays a file per
    (task, partition); write_compacted bounds files per directory to
    ceil(rows / target) while still splitting oversized partitions."""
    import glob

    from pyspark.sql import functions as F

    from streaming_recommendation_spark.sources.layout import (
        write_compacted,
    )

    df = (
        spark.range(0, 4000, 1, 16)
        .select(
            (F.col("id") % 4).alias("part"),
            F.col("id").alias("v"),
        )
    )
    naive = str(tmp_path / "naive")
    df.write.partitionBy("part").parquet(naive)
    naive_files = glob.glob(f"{naive}/part=*/*.parquet")
    # every writing task touches every directory: 16 tasks x 4 dirs
    assert len(naive_files) > 16

    packed = str(tmp_path / "packed")
    write_compacted(df, packed, target_rows_per_file=600,
                    partition_cols=["part"])
    for p in range(4):
        files = glob.glob(f"{packed}/part={p}/*.parquet")
        # 1000 rows / 600 cap -> exactly 2 files per directory
        assert len(files) == 2, files
    # round-trip intact
    assert spark.read.parquet(packed).count() == 4000


# ---------------------------------------------------------------------------
# Z-order clustering
# ---------------------------------------------------------------------------


def _per_file_span_fraction(spark, path, cols, domains):
    """Mean fraction of each column's domain covered per output file —
    the file-skipping proxy: a predicate on the column prunes a file
    whose [min,max] misses it, so smaller spans = more pruning."""
    import glob
    import os

    fracs = {c: [] for c in cols}
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    assert len(files) > 1
    for f in files:
        one = spark.read.parquet(f)
        row = one.agg(
            *[F.min(c).alias(f"lo_{c}") for c in cols],
            *[F.max(c).alias(f"hi_{c}") for c in cols],
        ).collect()[0]
        for c, dom in zip(cols, domains):
            fracs[c].append((row[f"hi_{c}"] - row[f"lo_{c}"]) / dom)
    return {c: sum(v) / len(v) for c, v in fracs.items()}


def test_zorder_value_bit_layout(spark):
    from streaming_recommendation_spark.sources.layout import zorder_value

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535), (65536, 0)],
        "x long, y long",
    )
    got = [r.z for r in df.select(zorder_value(["x", "y"]).alias("z")).collect()]

    def ref(x, y):
        z = 0
        for b in range(16):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    assert got == [ref(x % 65536, y % 65536) for x, y in
                   [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535), (65536, 0)]]


def test_zorder_overflow_guard():
    from streaming_recommendation_spark.sources.layout import zorder_value

    with pytest.raises(ValueError):
        zorder_value(["a", "b", "c", "d"], bits=16)


def test_write_zordered_prunes_both_columns(spark, tmp_path):
    """Z-order clustering must tighten per-file min/max for BOTH
    interleaved columns vs single-column range clustering (which is
    perfect on its own column and useless on the other)."""
    from streaming_recommendation_spark.sources.layout import write_zordered

    li = load_table(spark, "lineitem", SF_DIR).select("l_partkey", "l_suppkey")
    dom = li.agg(
        (F.max("l_partkey") - F.min("l_partkey")).alias("dp"),
        (F.max("l_suppkey") - F.min("l_suppkey")).alias("ds"),
    ).collect()[0]
    n_files = 16

    z_path = str(tmp_path / "zordered")
    write_zordered(li, z_path, ["l_partkey", "l_suppkey"], num_files=n_files)
    z = _per_file_span_fraction(
        spark, z_path, ["l_partkey", "l_suppkey"], [dom.dp, dom.ds]
    )

    r_path = str(tmp_path / "by_partkey")
    (
        li.repartitionByRange(n_files, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(r_path)
    )
    r = _per_file_span_fraction(
        spark, r_path, ["l_partkey", "l_suppkey"], [dom.dp, dom.ds]
    )

    # single-column clustering: near-total span on the OTHER column
    assert r["l_suppkey"] > 0.9
    # z-order: materially tighter than 1.0 on BOTH columns
    assert z["l_partkey"] < 0.5
    assert z["l_suppkey"] < 0.5


def test_write_zordered_null_column_handling(spark, tmp_path):
    """ADVICE r3: an all-NULL z-order column raises (no ordering
    info); partially-NULL columns map NULL rows to cell 0 instead of
    producing NULL Morton keys."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from streaming_recommendation_spark.sources.layout import write_zordered

    df = spark.range(100).select(
        F.col("id").alias("x"),
        F.lit(None).cast("long").alias("all_null"),
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id")).alias("some_null"),
    )
    with _pytest.raises(ValueError, match="entirely NULL"):
        write_zordered(df, str(tmp_path / "z1"), ["x", "all_null"], num_files=2)

    # partial NULLs: write succeeds and every row survives round-trip
    write_zordered(df, str(tmp_path / "z2"), ["x", "some_null"], num_files=2)
    back = spark.read.parquet(str(tmp_path / "z2"))
    assert back.count() == 100
    assert back.where(F.col("some_null").isNull()).count() == 10


def test_bucketed_write_explicit_path(spark):
    """path= pins the storage location (external bucketed table) so
    callers never depend on the session's warehouse config — q185's
    contract under the driver's own SparkSession."""
    import os

    ev = load_table(spark, "events", SF_DIR).limit(100)
    loc = "/tmp/spark_graft_state/test_bucketed_explicit_path"
    write_bucketed(ev, "ev_explicit_path", "user_id", num_buckets=4, path=loc)
    assert os.path.isdir(loc) and any(
        f.endswith(".parquet") for f in os.listdir(loc)
    )
    back = read_table(spark, "ev_explicit_path")
    assert back.count() == 100
    # overwrite works on the external location too (the stale-location
    # guard clears the pinned path, not the warehouse)
    write_bucketed(ev, "ev_explicit_path", "user_id", num_buckets=4, path=loc)
    assert read_table(spark, "ev_explicit_path").count() == 100
