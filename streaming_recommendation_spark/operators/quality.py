"""Data-quality audits a production training pipeline runs before it
trusts a snapshot: foreign-key edge profiling (orphan detection +
parent coverage — the dbt ``relationships`` test plus the coverage
statistic that tells you whether a dimension is actually exercised).
An orphan count of zero is the PASS state; the profile's information
lives in the varying columns around it (row counts, distinct keys,
coverage — e.g. the testdata generator leaves a few percent of
orders with no lineitems, so coverage discriminates between edges
even on orphan-free data).

Determinism: counts are exact int64; coverage is ONE IEEE division
of two exact counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fk_profile(
    child: DataFrame,
    fk: str,
    parent: DataFrame,
    pk: str,
    edge: str,
) -> DataFrame:
    """One-row profile of a foreign-key edge: (edge, child_rows,
    distinct_fk, orphan_rows, orphan_keys, parents, coverage) where
    ``orphan_*`` counts child rows/keys whose FK has no parent and
    ``coverage`` = referenced parents / all parents.

    Scale shape: the child reduces to per-FK counts FIRST (one
    groupBy with map-side partials — the join then ships |distinct
    fk| rows, not |child|); the parent side ships only its DISTINCT
    key column (a parent with duplicate primary keys — exactly the
    corrupt-snapshot condition this audit exists to catch — must not
    multiply the join and inflate the child counts; ``parents``
    counts distinct keys for the same reason); parent totals ride as
    a broadcast singleton. NULL FKs count as orphans (a NULL never
    equi-joins its parent — the usual DQ convention)."""
    per_key = child.groupBy(F.col(fk).alias("__fk")).agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    parent_keys = parent.select(F.col(pk).alias("__fk")).distinct()
    joined = per_key.join(
        parent_keys.withColumn("__hit", F.lit(1)),
        "__fk",
        "left",
    )
    stats = joined.agg(
        F.sum("__cnt").alias("child_rows"),
        F.count(F.lit(1)).alias("distinct_fk"),
        F.sum(F.when(F.col("__hit").isNull(), F.col("__cnt")).otherwise(0)).alias(
            "orphan_rows"
        ),
        F.sum(F.when(F.col("__hit").isNull(), 1).otherwise(0)).alias(
            "orphan_keys"
        ),
    )
    parents = parent_keys.agg(F.count(F.lit(1)).alias("parents"))
    return stats.crossJoin(F.broadcast(parents)).select(
        F.lit(edge).alias("edge"),
        "child_rows",
        "distinct_fk",
        "orphan_rows",
        "orphan_keys",
        "parents",
        (
            (F.col("distinct_fk") - F.col("orphan_keys"))
            / F.col("parents")
        ).alias("coverage"),
    )


def fk_profile_suite(edges) -> DataFrame:
    """Union the per-edge profiles of ``edges`` — an iterable of
    (child, fk, parent, pk, name) tuples — into one audit relation.
    Each edge is an independent subplan; Spark runs them as parallel
    stages of one job."""
    out = None
    for child, fk, parent, pk, name in edges:
        row = fk_profile(child, fk, parent, pk, name)
        out = row if out is None else out.unionByName(row)
    return out


def _unified(check_type, target, n_rows, bad_rows, metric):
    return [
        F.lit(check_type).alias("check_type"),
        F.lit(target).alias("target") if isinstance(target, str) else target.alias("target"),
        n_rows.cast("long").alias("n_rows"),
        bad_rows.cast("long").alias("bad_rows"),
        metric.alias("metric"),
    ]


def snapshot_audit(
    tables: dict[str, DataFrame],
    pks: dict[str, list[str]],
    edges,
) -> DataFrame:
    """The full pre-training snapshot audit (VERDICT r7 #9) — every
    check a pipeline runs before trusting a snapshot, as ONE relation
    of (check_type, target, n_rows, bad_rows, metric):

    - ``null_rate``: per column of every table — n_rows = table rows,
      bad_rows = NULLs, metric = non-null rate. ALL of a table's
      columns come from ONE aggregation over ONE scan (a per-column
      loop of count queries would scan the table |columns| times);
      the single wide row unpivots via explode.
    - ``dup_pk``: per declared (possibly composite) primary key —
      bad_rows = rows beyond the first per key, metric = uniqueness
      ratio (distinct/rows). One groupBy(pk) with map-side partials;
      NULL keys group like SQL GROUP BY on both engines.
    - ``fk_orphans``: every foreign-key edge through
      :func:`fk_profile` (child pre-reduced to per-FK counts, parent
      deduped, NULL FKs orphan) — bad_rows = orphan child rows,
      metric = parent coverage.

    Exactness: every count is an exact int64; each metric is ONE
    IEEE division of two exact counts (NULL on an empty target).
    bad_rows == 0 everywhere is the PASS state; the audit still
    discriminates on clean data via row counts, uniqueness (the
    testdata generator reuses l_linenumber within orders), and
    coverage (~2% of orders are lineitem-less).

    Scale shape: each check is an independent map-side-partial
    subplan over one scan of its target (unioned checks run as
    parallel stages of one job); nothing joins anything bigger than
    |distinct key| rows, and the output is O(columns + pks + edges)
    rows total."""
    parts = []
    for tname, df in tables.items():
        cols = df.columns
        aggd = df.agg(
            F.count(F.lit(1)).alias("__rows"),
            *[
                F.coalesce(
                    F.sum(F.col(c).isNull().cast("long")), F.lit(0)
                ).alias(f"__n_{i}")
                for i, c in enumerate(cols)
            ],
        )
        arr = F.array(
            *[
                F.struct(
                    F.lit(f"{tname}.{c}").alias("t"),
                    F.col(f"__n_{i}").alias("b"),
                )
                for i, c in enumerate(cols)
            ]
        )
        parts.append(
            aggd.select(F.col("__rows"), F.explode(arr).alias("r")).select(
                *_unified(
                    "null_rate",
                    F.col("r.t"),
                    F.col("__rows"),
                    F.col("r.b"),
                    F.when(
                        F.col("__rows") > 0,
                        (F.col("__rows") - F.col("r.b")) / F.col("__rows"),
                    ),
                )
            )
        )
    for tname, pk in pks.items():
        g = tables[tname].groupBy(*[F.col(c) for c in pk]).agg(
            F.count(F.lit(1)).alias("__c")
        )
        s = g.agg(
            F.coalesce(F.sum("__c"), F.lit(0)).alias("__s"),
            F.count(F.lit(1)).alias("__d"),
        )
        parts.append(
            s.select(
                *_unified(
                    "dup_pk",
                    f"{tname}.{'+'.join(pk)}",
                    F.col("__s"),
                    F.col("__s") - F.col("__d"),
                    F.when(
                        F.col("__s") > 0, F.col("__d") / F.col("__s")
                    ),
                )
            )
        )
    for child, fk, parent, pk, name in edges:
        prof = fk_profile(child, fk, parent, pk, name)
        parts.append(
            prof.select(
                *_unified(
                    "fk_orphans",
                    F.col("edge"),
                    F.col("child_rows"),
                    F.col("orphan_rows"),
                    F.col("coverage"),
                )
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def drift_report(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    nbins: int = 10,
    scale: int = 1_000_000,
) -> DataFrame:
    """Distribution-drift report between two snapshots of a numeric
    column — the production data monitor run before a model retrain
    (the PSI dashboard slot). The reference snapshot fixes the
    binning (equi-width over ITS min/max, in integer cents so the
    grid is exact; out-of-range current values clamp to the edge
    bins, the standard convention), and each bin contributes one
    term of the discrete chi-square distance

        D = sum_i (p_i - q_i)^2 / (p_i + q_i),
        p_i = c_ref_i / n_ref,  q_i = c_cur_i / n_cur

    which algebraically clears to the all-integer form

        term = (c_ref*n_cur - c_cur*n_ref)^2
               / (n_ref*n_cur*(c_ref*n_cur + c_cur*n_ref)).

    Chi-square distance instead of PSI because PSI's log term would
    hang the cross-engine twin on libm ULPs (the same reason the
    tf-idf/BM25 leg uses linear idf); D is bounded in [0, 2], 0 iff
    identical, and moves monotonically with the same shifts a PSI
    alarm watches. Each term is quantized to int64 units of
    1/``scale`` with ONE truncating division of two decimal(38,0)
    products (operands cast to decimal(38,0) DIRECTLY — the q176
    convention), so the total drift is an exact int64 SUM of the
    returned terms: order-free, bit-identical on any engine. Empty
    bins on both sides contribute exactly 0 (guarded — the division
    never sees a zero denominator).

    Returns one row per bin: (bin, c_ref, c_cur, drift_term).
    Scale shape: two map-side binning scans + two nbins-row
    aggregates joined on a literal grid — no shuffle touches more
    than nbins rows after the per-bin counts.
    """
    lohi = ref_grid(ref, value_col)
    rc = bin_counts(ref, value_col, lohi, nbins).withColumnRenamed(
        "c", "c_ref"
    )
    cc = bin_counts(cur, value_col, lohi, nbins).withColumnRenamed(
        "c", "c_cur"
    )
    return drift_from_counts(rc, cc, ref.sparkSession, nbins, scale)


def ref_grid(ref: DataFrame, value_col: str) -> DataFrame:
    """The reference snapshot's 1-row (lo, hi) cent grid — computed
    ONCE and frozen; the streaming monitor (streaming/drift.py) bins
    every arrival batch against it (re-deriving the grid per batch
    would make bins incomparable across time)."""
    cents = F.floor(F.col(value_col) * 100).cast("long")
    return ref.agg(F.min(cents).alias("__lo"), F.max(cents).alias("__hi"))


def bin_counts(
    df: DataFrame,
    value_col: str,
    lohi: DataFrame,
    nbins: int = 10,
) -> DataFrame:
    """(bin, c) counts of ``df`` on the frozen grid — the MERGEABLE
    unit of the drift monitor: counts are int64 sums, so per-batch
    count frames union+sum to exactly the one-shot counts (the
    q132/q133 mergeable-state property, which is what makes the
    streaming twin exact)."""
    cents = F.floor(F.col(value_col) * 100).cast("long")
    b = F.least(
        F.lit(nbins - 1),
        F.greatest(
            F.lit(0),
            F.expr(
                f"((__c - __lo) * {nbins}) div (__hi - __lo + 1)"
            ).cast("int"),
        ),
    )
    return (
        df.select(cents.alias("__c"))
        .where(F.col("__c").isNotNull())
        .crossJoin(F.broadcast(lohi))
        .groupBy(b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def drift_from_counts(
    rc: DataFrame,
    cc: DataFrame,
    spark,
    nbins: int = 10,
    scale: int = 1_000_000,
) -> DataFrame:
    """The drift arithmetic over pre-binned (bin, c_ref)/(bin, c_cur)
    frames — shared by the batch report and the streaming monitor's
    read path (which feeds it MERGED per-batch counts)."""
    grid = spark.range(nbins).select(F.col("id").cast("int").alias("bin"))
    totals = rc.agg(F.sum("c_ref").alias("n_ref")).crossJoin(
        cc.agg(F.sum("c_cur").alias("n_cur"))
    )
    joined = (
        grid.join(F.broadcast(rc), "bin", "left")
        .join(F.broadcast(cc), "bin", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bin",
            F.coalesce("c_ref", F.lit(0).cast("long")).alias("c_ref"),
            F.coalesce("c_cur", F.lit(0).cast("long")).alias("c_cur"),
            "n_ref",
            "n_cur",
        )
    )
    # ADVICE r9: every product runs in DECIMAL(38,0) from the FIRST
    # multiply (the q176 convention) — the inner difference used to be
    # BIGINT arithmetic, which for c*n >= 2^63 wraps silently in Spark
    # (ANSI off) while DuckDB errors, breaking the bit-identical-twin
    # claim asymmetrically. Past ~1e38 the decimal product is NULL
    # (row dropped, not an error) — the same bound class as the
    # oracle's HUGEINT ceiling.
    diff = (
        "(CAST(c_ref AS DECIMAL(38,0)) * n_cur"
        " - CAST(c_cur AS DECIMAL(38,0)) * n_ref)"
    )
    num = f"{diff} * {diff} * {scale}"
    den = (
        "CAST(n_ref AS DECIMAL(38,0)) * n_cur"
        " * (CAST(c_ref AS DECIMAL(38,0)) * n_cur"
        "    + CAST(c_cur AS DECIMAL(38,0)) * n_ref)"
    )
    return joined.select(
        "bin",
        "c_ref",
        "c_cur",
        F.expr(
            f"CASE WHEN n_ref IS NULL OR n_cur IS NULL OR n_ref = 0 OR n_cur = 0 THEN CAST(raise_error('drift: empty reference or current snapshot (n_ref/n_cur = 0) — a degenerate monitor state, not zero drift') AS BIGINT) WHEN c_ref + c_cur = 0 THEN CAST(0 AS BIGINT) "
            f"ELSE CAST(({num}) div ({den}) AS BIGINT) END"
        ).alias("drift_term"),
    )


def categorical_drift(
    ref: DataFrame,
    cur: DataFrame,
    cat_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Categorical counterpart of :func:`drift_report` — the other
    half of a production drift dashboard (numeric columns bin on a
    grid; categorical columns ARE their own bins). Per category
    present in EITHER snapshot, one term of the same all-integer
    discrete chi-square distance; a category that appears or
    disappears contributes its full one-sided mass (the alarm case
    — with PSI that term would be log(0)-undefined and need an
    epsilon fudge; here it is exact). NULLs are dropped on both
    sides: the null-RATE audit is snapshot_audit's job, and mixing
    the two would conflate missingness drift with value drift.

    Returns (category, c_ref, c_cur, drift_term) with the same int64
    ppm quantization as drift_report, so total drift is an exact
    order-free sum. Scale: two map-side count aggregates merged by
    one |categories|-keyed union+sum (no join — the q199 full-outer
    rewrite), then the nbins... |categories|-row arithmetic.
    """
    return categorical_drift_from_counts(
        category_counts(ref, cat_col), category_counts(cur, cat_col), scale
    )


def category_counts(df: DataFrame, cat_col: str) -> DataFrame:
    """(category, c) counts of one snapshot/batch — the MERGEABLE
    unit of the categorical drift monitor (streaming/drift.py):
    counts are int64 sums, so per-batch count frames union+sum to
    exactly the one-shot counts (the q132/q133 property, which is
    what makes the streaming categorical twin q224 exact). NULL
    categories dropped — missingness drift is snapshot_audit's job."""
    return (
        df.where(F.col(cat_col).isNotNull())
        .groupBy(F.col(cat_col).alias("category"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def categorical_drift_from_counts(
    rc: DataFrame,
    cc: DataFrame,
    scale: int = 1_000_000,
) -> DataFrame:
    """The categorical chi-square arithmetic over pre-counted
    (category, c) frames — shared by the batch report
    (categorical_drift) and the streaming monitor's read path, which
    feeds it MERGED per-batch counts (streaming/drift.py, q224)."""
    lit0 = F.lit(0).cast("long")
    merged = (
        rc.select("category", F.col("c").alias("c_ref"), lit0.alias("c_cur"))
        .unionByName(
            cc.select(
                "category", lit0.alias("c_ref"), F.col("c").alias("c_cur")
            )
        )
        .groupBy("category")
        .agg(F.sum("c_ref").alias("c_ref"), F.sum("c_cur").alias("c_cur"))
    )
    totals = merged.agg(
        F.sum("c_ref").alias("n_ref"), F.sum("c_cur").alias("n_cur")
    )
    # ADVICE r9: every product runs in DECIMAL(38,0) from the FIRST
    # multiply (the q176 convention) — the inner difference used to be
    # BIGINT arithmetic, which for c*n >= 2^63 wraps silently in Spark
    # (ANSI off) while DuckDB errors, breaking the bit-identical-twin
    # claim asymmetrically. Past ~1e38 the decimal product is NULL
    # (row dropped, not an error) — the same bound class as the
    # oracle's HUGEINT ceiling.
    diff = (
        "(CAST(c_ref AS DECIMAL(38,0)) * n_cur"
        " - CAST(c_cur AS DECIMAL(38,0)) * n_ref)"
    )
    num = f"{diff} * {diff} * {scale}"
    den = (
        "CAST(n_ref AS DECIMAL(38,0)) * n_cur"
        " * (CAST(c_ref AS DECIMAL(38,0)) * n_cur"
        "    + CAST(c_cur AS DECIMAL(38,0)) * n_ref)"
    )
    return (
        merged.crossJoin(F.broadcast(totals))
        .select(
            "category",
            "c_ref",
            "c_cur",
            F.expr(
                f"CASE WHEN n_ref IS NULL OR n_cur IS NULL OR n_ref = 0 OR n_cur = 0 THEN CAST(raise_error('drift: empty reference or current snapshot (n_ref/n_cur = 0) — a degenerate monitor state, not zero drift') AS BIGINT) WHEN c_ref + c_cur = 0 THEN CAST(0 AS BIGINT) "
                f"ELSE CAST(({num}) div ({den}) AS BIGINT) END"
            ).alias("drift_term"),
        )
    )
