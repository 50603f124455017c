"""Deterministic cardinality sketches.

Spark's native ``approx_count_distinct`` (q57) is a HyperLogLog++
whose register hashes are engine-private — the sketch can never be
replayed by another engine, so q57 is the registry's one rows-only
entry. ``hll_distinct`` here is a from-scratch HyperLogLog built on
the cross-engine md5 hash (functions/hashing.det_hash_str), with the
register sum kept in SCALED INTEGERS:

    Z_scaled = sum over registers of 2^(W + 1 - M_j)    (exact int64)

instead of the float ``sum(2^-M_j)`` whose addition order varies —
so registers, Z, and the final single-division estimate are
bit-identical on any engine and the whole sketch is oracle-checkable
(q118). Accuracy is standard HLL: ~1.04/sqrt(m) relative error
(~6.5% at p=8); the small-range linear-counting
correction stays client-side (it needs ln(); see hll_distinct).

This is the mergeable-cardinality shape at 100 TB: each executor
ships at most m= 2^p (group, register, max-rho) partials per group;
sketches merge by register-wise max.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import det_hash_long, det_hash_str

HASH_BITS = 32


def hll_constants(p: int) -> tuple[int, float]:
    """(m, alpha_m) for 2^p registers (Flajolet et al. 2007)."""
    m = 1 << p
    if m >= 128:
        alpha = 0.7213 / (1 + 1.079 / m)
    elif m == 64:
        alpha = 0.709
    elif m == 32:
        alpha = 0.697
    else:
        alpha = 0.673
    return m, alpha


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    p: int = 8,
) -> DataFrame:
    """The HLL STATE: (group..., __bucket, __mj) sparse register
    table — <= 2^p rows per group regardless of input size, and
    MERGEABLE: union two register tables and take the per-(group,
    bucket) max to get the registers of the concatenated inputs
    (max(max(A), max(B)) == max(A ++ B)). This is what a streaming
    pipeline persists between micro-batches (streaming/sketches.py);
    :func:`hll_from_registers` finalizes it into the estimate."""
    m, _alpha = hll_constants(p)
    W = HASH_BITS - p
    h = det_hash_str(F.col(key_col).cast("string"))
    gks = [F.col(c) for c in group_cols]
    hashed = df.select(
        *gks,
        (h % F.lit(m)).alias("__bucket"),
        # h < 2^32 so the double division is exact; cast truncates = div
        (h / F.lit(m)).cast("long").alias("__w"),
    )
    rho = (
        F.when(F.col("__w") == 0, F.lit(W + 1))
        .otherwise(F.instr(F.lpad(F.bin(F.col("__w")), W, "0"), "1"))
        .cast("int")
    )
    return (
        hashed.withColumn("__rho", rho)
        .groupBy(*gks, F.col("__bucket"))
        .agg(F.max("__rho").alias("__mj"))
    )


def merge_hll_registers(a: DataFrame, b: DataFrame, group_cols: list[str]) -> DataFrame:
    """Register-wise max merge — exact: the merged registers equal
    the registers of the concatenated inputs."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "__bucket")
        .agg(F.max("__mj").alias("__mj"))
    )


def hll_from_registers(
    regs: DataFrame,
    group_cols: list[str],
    p: int = 8,
) -> DataFrame:
    """Finalize a (merged) register table into the estimate row(s):
    (group..., nonzero_registers, z_scaled, hll_estimate)."""
    m, alpha = hll_constants(p)
    W = HASH_BITS - p
    gks = [F.col(c) for c in group_cols]
    # every group needs all m registers (empty ones contribute
    # 2^(W+1)); group keys come from the m-bounded register table,
    # not a second scan of the corpus
    full = (
        regs.select(*group_cols)
        .distinct()
        .crossJoin(
            F.broadcast(
                regs.sparkSession.range(m).select(F.col("id").alias("__bucket"))
            )
        )
        .join(regs, group_cols + ["__bucket"], "left")
        .withColumn("__mj", F.coalesce(F.col("__mj"), F.lit(0)))
    )
    z = F.sum(
        F.expr(f"shiftleft(CAST(1 AS BIGINT), {W + 1} - __mj)")
    ).alias("z_scaled")
    nonzero = F.sum((F.col("__mj") > 0).cast("int")).alias("nonzero_registers")
    scaled = float(alpha * m * m * (1 << (W + 1)))
    est = F.lit(scaled) / F.col("z_scaled")
    return (
        full.groupBy(*gks)
        .agg(z, nonzero)
        .select(
            *group_cols,
            "nonzero_registers",
            "z_scaled",
            F.round(est, 4).alias("hll_estimate"),
        )
    )


def hll_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    p: int = 8,
) -> DataFrame:
    """Per-group deterministic-HLL distinct estimate.

    Returns (group..., nonzero_registers, z_scaled, hll_estimate)
    where ``z_scaled`` is the exact integer register sum and
    ``hll_estimate`` rounds the single IEEE division to 4 decimals.
    Composition of :func:`hll_registers` (the mergeable state) and
    :func:`hll_from_registers` (the finalizer).

    The estimate is RAW HLL. The standard small-range correction
    (linear counting, m * ln(m / empty) below 2.5m) needs ln(),
    which this repo's determinism policy bans from oracle-checked
    paths (libm ULP drift); it is a client-side fix on two of the
    returned integers — applied and accuracy-tested in
    tests/test_sketch.py, NOT inside the oracle-checked plan.
    """
    return hll_from_registers(
        hll_registers(df, key_col, group_cols, p), group_cols, p
    )


def _cms_slots(key_col: str, width: int, depth: int):
    """array<struct<row,slot>> of a key's depth deterministic slots —
    ONE pass over the input builds every sketch row (a depth-way
    unionAll would rescan the stream per row)."""
    return F.array(*[
        F.struct(
            F.lit(d).alias("row"),
            (det_hash_str(
                F.concat(F.col(key_col).cast("string"), F.lit(f"@{d}"))
            ) % F.lit(width)).cast("long").alias("slot"),
        )
        for d in range(depth)
    ])


def cms_counts(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    width: int = 256,
    depth: int = 3,
) -> DataFrame:
    """Count-Min sketch (Cormode-Muthukrishnan 2005) with
    deterministic md5-derived row hashes — frequency estimates with
    one-sided error (estimate >= true count, overshoot <= N/width
    w.p. 1 - (1/2)^depth), built as ``depth * width`` integer
    counters per group.

    Returns the sketch TABLE (group..., row, slot, c) — mergeable by
    addition, the shape that ships between executors. Pair with
    :func:`cms_estimate` to probe it. Every counter is an integer
    sum over deterministic slots, so the full sketch replays
    bit-for-bit in SQL (q124).
    """
    gks = list(group_cols or [])
    return (
        df.select(*gks, F.explode(_cms_slots(key_col, width, depth)).alias("p"))
        .select(*gks, F.col("p.row"), F.col("p.slot"))
        .groupBy(*gks, "row", "slot")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    width: int = 256,
    depth: int = 3,
) -> DataFrame:
    """Probe a :func:`cms_counts` sketch: for each key (x group),
    estimate = min over rows of the counter at that row's slot.
    Missing counters are 0 (the key never hashed there)."""
    gks = list(group_cols or [])
    all_probes = (
        keys.select(key_col, *gks,
                    F.explode(_cms_slots(key_col, width, depth)).alias("p"))
        .select(key_col, *gks, F.col("p.row"), F.col("p.slot"))
    )
    return (
        all_probes.join(sketch, gks + ["row", "slot"], "left")
        .groupBy(key_col, *gks)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cms_count"))
    )


def kmv_set_stats(
    a: DataFrame,
    b: DataFrame,
    key_col: str,
    k: int = 64,
) -> DataFrame:
    """K-Minimum-Values sketch comparison of two key sets (Bar-Yossef
    et al. 2002 / Beyer et al. SIGMOD'07): distinct-count estimates
    for A, B, A|B plus a Jaccard/intersection estimate, all from the
    k smallest deterministic hash values of each side.

    Where HLL (hll_distinct) only counts, KMV supports SET ALGEBRA:
    the union sketch is the k smallest of the merged minima, and the
    fraction of merged minima present in both sketches estimates
    Jaccard — so intersection size falls out without ever joining
    the raw sets. Sketches are k int64s regardless of set size.

    Determinism: the Knuth multiplicative hash is a BIJECTION on
    [0, 2^32) (odd multiplier mod 2^32), so distinct keys never
    collide, minima are unique, and every estimate is one IEEE
    division over exact integers — bit-identical on any engine
    (q126 replays it in SQL).

    PRECONDITION: keys must lie in [0, 2^32) — the bijection (and
    with it every claim above) breaks for keys congruent mod 2^32,
    which would silently merge in the sketch. ENFORCED in-plan: an
    out-of-range or non-castable (cast-to-NULL) key raises at
    execution (map-side ``raise_error``, no extra scan) instead of
    silently biasing every estimate (ADVICE r3, r4). NULL keys are
    EXCLUDED before sketching — COUNT(DISTINCT) semantics — so they
    can neither raise nor enter the minima. For 64-bit id spaces
    (snowflake ids, >4B users) swap det_hash_long for a 64-bit
    cross-engine hash.

    Estimator: ndv ~ (k-1) * 2^32 / kth_min; exact count when a side
    has fewer than k distinct keys (the sketch IS the set).
    """
    def sketch(df, name):
        # NULLs excluded up front (COUNT(DISTINCT) semantics); after
        # the filter a NULL cast can only mean a non-castable key, so
        # the guard covers it — previously a non-numeric string cast
        # to NULL, made the range predicate NULL, and fell through to
        # the otherwise branch into the sketch (ADVICE r4).
        df = df.where(F.col(key_col).isNotNull())
        # try_cast (not cast): under ANSI mode a malformed string
        # would throw inside cast itself with a generic message;
        # try_cast -> NULL routes it into the guard's raise_error so
        # the failure names the operator and the offending value.
        cast_key = F.col(key_col).try_cast("long")
        checked = F.when(
            cast_key.isNull()
            | (cast_key < 0)
            | (cast_key >= F.lit(1 << 32)),
            F.raise_error(
                F.concat(
                    F.lit(
                        f"kmv_set_stats: {key_col} non-castable or "
                        "outside [0, 2^32) breaks the hash bijection: "
                    ),
                    F.col(key_col).cast("string"),
                )
            ).cast("long"),
        ).otherwise(cast_key)
        return (
            df.select(det_hash_long(checked).alias("hv"))
            .distinct()
            .orderBy("hv")
            .limit(k)
            .select(F.col("hv").alias(name))
        )

    ska, skb = sketch(a, "ha"), sketch(b, "hb")
    merged = (
        ska.select(F.col("ha").alias("hv"))
        .unionAll(skb.select(F.col("hb").alias("hv")))
        .distinct()
        .orderBy("hv")
        .limit(k)
    )
    in_both = (
        merged.join(ska, merged["hv"] == ska["ha"], "left_semi")
        .join(skb, F.col("hv") == skb["hb"], "left_semi")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    M = float(1 << 32)

    def est(cnt, mx):
        return F.when(cnt < k, cnt.cast("double")).otherwise(
            F.lit(float(k - 1)) * F.lit(M) / mx
        )

    stats_a = ska.agg(F.count(F.lit(1)).alias("ca"), F.max("ha").alias("ma"))
    stats_b = skb.agg(F.count(F.lit(1)).alias("cb"), F.max("hb").alias("mb"))
    stats_m = merged.agg(
        F.count(F.lit(1)).alias("cm"), F.max("hv").alias("mm")
    )
    return (
        stats_a.crossJoin(stats_b)
        .crossJoin(stats_m)
        .crossJoin(in_both)
        .select(
            F.round(est(F.col("ca"), F.col("ma")), 4).alias("ndv_a_est"),
            F.round(est(F.col("cb"), F.col("mb")), 4).alias("ndv_b_est"),
            F.round(est(F.col("cm"), F.col("mm")), 4).alias("union_est"),
            F.round(F.col("n_both") / F.col("cm"), 4).alias("jaccard_est"),
            F.round(
                (F.col("n_both") / F.col("cm")) * est(F.col("cm"), F.col("mm")),
                4,
            ).alias("intersection_est"),
        )
    )
