"""Triangle counting: exact counts on handmade graphs, brute-force
parity on a random graph, and the degree-orientation wedge bound."""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from streaming_recommendation_spark.operators.graph import triangle_counts


def _counts(spark, edges):
    df = spark.createDataFrame(edges, "a long, b long")
    return {r.node: r.n_triangles for r in triangle_counts(df).collect()}


def test_triangle_counts_k4(spark):
    # K4: every vertex is in C(3,2)=3 triangles
    edges = [(a, b) for a in range(4) for b in range(4) if a < b]
    assert _counts(spark, edges) == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_counts_handles_dups_loops_direction(spark):
    edges = [(0, 1), (1, 0), (1, 2), (2, 0), (2, 2), (0, 1), (3, 0)]
    # one triangle {0,1,2}; node 3 dangles, loop (2,2) ignored
    assert _counts(spark, edges) == {0: 1, 1: 1, 2: 1}


def test_triangle_counts_no_triangles(spark):
    # a path and a star have no triangles -> empty result
    edges = [(0, 1), (1, 2), (2, 3), (10, 11), (10, 12), (10, 13)]
    assert _counts(spark, edges) == {}


def test_triangle_counts_random_parity(spark):
    rng = random.Random(7)
    n = 30
    edges = [(a, b) for a in range(n) for b in range(a + 1, n) if rng.random() < 0.25]
    eset = set(edges)
    expect = {}
    for x, y, z in itertools.combinations(range(n), 3):
        if (x, y) in eset and (y, z) in eset and (x, z) in eset:
            for v in (x, y, z):
                expect[v] = expect.get(v, 0) + 1
    assert _counts(spark, edges) == expect


def test_triangle_counts_star_skew_wedge_bound(spark):
    """A hub of degree h with a pendant triangle: orientation must
    point every spoke INTO the hub, so the hub contributes zero
    wedges (the naive center-join would generate C(h,2))."""
    h = 200
    edges = [(0, i) for i in range(1, h + 1)] + [(1, 2)]
    df = spark.createDataFrame(edges, "a long, b long")
    assert {r.node: r.n_triangles for r in triangle_counts(df).collect()} == {
        0: 1, 1: 1, 2: 1
    }


def test_random_walks_deterministic_and_valid(spark):
    """Every emitted transition is a real edge, replicas of a node
    walk independently, and two invocations draw identical walks
    (hash-driven — no RNG state)."""
    from streaming_recommendation_spark.operators.graph import random_walks

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 1), (2, 3), (3, 1), (3, 2)],
        "src bigint, dst bigint",
    )
    out = random_walks(edges, walk_length=3, walks_per_node=2)
    rows = sorted(map(tuple, out.collect()))
    assert rows == sorted(map(tuple, random_walks(
        edges, walk_length=3, walks_per_node=2
    ).collect()))
    by_walk = {}
    for wid, step, node in rows:
        by_walk.setdefault(wid, {})[step] = node
    assert len(by_walk) == 6  # 3 start nodes x 2 replicas
    eset = {(r.src, r.dst) for r in edges.collect()}
    for wid, steps in by_walk.items():
        assert sorted(steps) == [0, 1, 2, 3]  # no dead ends here
        assert steps[0] == wid // 2  # walk_id encodes the start
        for t in range(1, 4):
            assert (steps[t - 1], steps[t]) in eset


def test_random_walks_dead_end_terminates(spark):
    from streaming_recommendation_spark.operators.graph import random_walks

    edges = spark.createDataFrame([(1, 2)], "src bigint, dst bigint")
    out = sorted(map(tuple, random_walks(edges, walk_length=5).collect()))
    # one start (node 1, which has out-edges); the walk reaches the
    # sink 2 at step 1 and stops — no successor rows, no nulls
    assert out == [(1, 0, 1), (1, 1, 2)]


def test_random_walks_max_degree_cap(spark):
    """The hub cap keeps the max_degree smallest neighbor ids — a
    capped hub only ever transitions into its retained slice."""
    from streaming_recommendation_spark.operators.graph import random_walks

    hub = [(0, d) for d in range(1, 50)] + [(d, 0) for d in range(1, 50)]
    edges = spark.createDataFrame(hub, "src bigint, dst bigint")
    out = random_walks(
        edges, walk_length=4, walks_per_node=4, max_degree=5
    )
    from pyspark.sql import functions as F

    visited = {
        r.node
        for r in out.where(F.col("step") > 0).distinct().collect()
    }
    assert visited <= {0, 1, 2, 3, 4, 5}  # hub slice + the hub itself


def test_random_walks_64bit_ids_do_not_alias(spark):
    """Walk ids congruent mod 2^31 must NOT draw identical step
    sequences: both 31-bit halves of walk_id feed the hash. Two
    start nodes 2^31 apart share an identical neighbor list — an
    aliasing hash would walk them in lockstep forever."""
    from pyspark.sql import functions as F

    from streaming_recommendation_spark.operators.graph import random_walks

    lo, hi = 5, 5 + (1 << 31)
    edges = spark.createDataFrame(
        [(s, d) for s in (lo, hi) + tuple(range(1, 5)) for d in range(1, 5)],
        "src bigint, dst bigint",
    )
    starts = spark.createDataFrame([(lo,), (hi,)], "node bigint")
    out = random_walks(
        edges, walk_length=6, walks_per_node=1, start_nodes=starts
    )
    seqs = {}
    for r in out.collect():
        seqs.setdefault(r.walk_id, {})[r.step] = r.node
    a = [seqs[lo][t] for t in range(1, 7)]
    b = [seqs[hi][t] for t in range(1, 7)]
    assert a != b


def test_bfs_distances_layers_and_bound(spark):
    """Min-hop distances on a path graph with a shortcut: the
    SHORTEST route wins, unreached nodes are absent, max_hops caps
    the expansion."""
    from streaming_recommendation_spark.operators.graph import bfs_distances

    # 1-2-3-4-5 chain plus shortcut 1-4; symmetric edges
    und = [(1, 2), (2, 3), (3, 4), (4, 5), (1, 4)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src bigint, dst bigint"
    )
    seeds = spark.createDataFrame([(1,)], "node bigint")
    got = {
        r.node: r.distance
        for r in bfs_distances(edges, seeds, max_hops=2).collect()
    }
    # 4 via the shortcut (1 hop), 3 via either side (2 hops), 5 via 4
    assert got == {1: 0, 2: 1, 4: 1, 3: 2, 5: 2}
    capped = {
        r.node: r.distance
        for r in bfs_distances(edges, seeds, max_hops=1).collect()
    }
    assert capped == {1: 0, 2: 1, 4: 1}


def test_bfs_distances_multi_seed_and_isolated_seed(spark):
    """Every seed is distance 0 even with no edges; overlapping
    frontiers keep the minimum."""
    from streaming_recommendation_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2)], "src bigint, dst bigint"
    )
    seeds = spark.createDataFrame([(1,), (3,), (99,)], "node bigint")
    got = {
        r.node: r.distance
        for r in bfs_distances(edges, seeds, max_hops=3).collect()
    }
    assert got == {1: 0, 3: 0, 99: 0, 2: 1}


def test_skipgram_pairs_window_and_counts(spark):
    """Hand-checked pairs from one 4-step walk: window=2 pairs each
    position with the next <=2 positions, both orientations, counted
    with multiplicity."""
    from streaming_recommendation_spark.operators.graph import skipgram_pairs

    walk = [(7, t, n) for t, n in enumerate([10, 20, 10, 30])]
    walks = spark.createDataFrame(walk, "walk_id long, step int, node long")
    got = {
        (r.center, r.context): r.n_pairs
        for r in skipgram_pairs(walks, window=2).collect()
    }
    # ordered within-window pairs: (10,20),(10,10),(20,10),(20,30),
    # (10,30); reversed copies double everything; (10,20)+(20,10)
    # both directions accumulate
    assert got[(10, 20)] == 2 and got[(20, 10)] == 2
    assert got[(10, 30)] == 1 and got[(30, 10)] == 1
    assert got[(20, 30)] == 1 and got[(10, 10)] == 2
    assert sum(got.values()) == 10


def test_skipgram_pairs_matches_self_join(spark):
    """Array-expansion pairs == naive self-join pairs on a random
    multi-walk corpus (independent derivation)."""
    from pyspark.sql import functions as F

    from streaming_recommendation_spark.operators.graph import skipgram_pairs

    import random

    rng = random.Random(7)
    rows = [
        (w, t, rng.randrange(5))
        for w in range(20)
        for t in range(rng.randrange(1, 6))
    ]
    walks = spark.createDataFrame(rows, "walk_id long, step int, node long")
    got = {
        (r.center, r.context): r.n_pairs
        for r in skipgram_pairs(walks, window=2).collect()
    }
    a, b = walks.alias("a"), walks.alias("b")
    j = a.join(
        b,
        (F.col("a.walk_id") == F.col("b.walk_id"))
        & (F.col("b.step") > F.col("a.step"))
        & (F.col("b.step") - F.col("a.step") <= 2),
    ).select(F.col("a.node").alias("center"), F.col("b.node").alias("context"))
    both = j.unionByName(
        j.select(
            F.col("context").alias("center"), F.col("center").alias("context")
        )
    )
    want = {
        (r.center, r.context): r["count"]
        for r in both.groupBy("center", "context").count().collect()
    }
    assert got == want


def test_ppr_support_is_hop_neighborhood_and_seeds_hold_mass(spark):
    """Personalized PageRank: rank support after r rounds is exactly
    the r-hop neighborhood of the seeds; teleport mass returns to
    seeds every round."""
    from streaming_recommendation_spark.operators.graph import (
        pagerank_quantized,
    )

    # chain 1-2-3-4-5 (symmetric); seed {1}
    und = [(i, i + 1) for i in range(1, 5)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src bigint, dst bigint"
    )
    seeds = spark.createDataFrame([(1,)], "node bigint")
    got = {
        r.node: r.rank
        for r in pagerank_quantized(edges, rounds=2, seeds=seeds).collect()
    }
    # 2 rounds from node 1 reach nodes 1..3; 4 and 5 stay at 0
    assert got[4] == 0 and got[5] == 0
    assert got[1] > 0 and got[2] > 0 and got[3] > 0
    # the seed keeps the largest rank (teleport + returning mass)
    assert got[1] == max(got.values())


def test_ppr_seeds_all_equals_uniform_pagerank(spark):
    """seeds = every graph node reproduces the uniform PageRank
    bit-for-bit (the personalized path is a strict generalization)."""
    from pyspark.sql import functions as F

    from streaming_recommendation_spark.operators.graph import (
        pagerank_quantized,
    )

    und = [(1, 2), (2, 3), (3, 1), (3, 4)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src bigint, dst bigint"
    )
    all_nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    uni = {
        r.node: r.rank
        for r in pagerank_quantized(edges, rounds=3).collect()
    }
    per = {
        r.node: r.rank
        for r in pagerank_quantized(edges, rounds=3, seeds=all_nodes).collect()
    }
    assert uni == per


def test_ppr_seeds_outside_graph_are_ignored(spark):
    """Seeds absent from the edge set neither receive mass nor dilute
    the seed count N."""
    from streaming_recommendation_spark.operators.graph import (
        pagerank_quantized,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 1)], "src bigint, dst bigint"
    )
    with_ghost = spark.createDataFrame([(1,), (99,)], "node bigint")
    just_one = spark.createDataFrame([(1,)], "node bigint")
    a = {
        r.node: r.rank
        for r in pagerank_quantized(edges, rounds=2, seeds=with_ghost).collect()
    }
    b = {
        r.node: r.rank
        for r in pagerank_quantized(edges, rounds=2, seeds=just_one).collect()
    }
    assert a == b and 99 not in a


def test_bfs_distances_duplicate_seed_rows_dedup(spark):
    """A repeated seed row must not produce duplicate output rows."""
    from streaming_recommendation_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame([(1, 2), (2, 1)], "src bigint, dst bigint")
    seeds = spark.createDataFrame([(1,), (1,), (1,)], "node bigint")
    rows = bfs_distances(edges, seeds, max_hops=1).collect()
    assert sorted((r.node, r.distance) for r in rows) == [(1, 0), (2, 1)]


def test_indexed_vocab_dense_bijection(spark):
    """idx is exactly the set 0..N-1 (a dense bijection) and the
    assignment is deterministic across invocations."""
    from streaming_recommendation_spark.operators.graph import indexed_vocab

    nodes = spark.createDataFrame(
        [(n,) for n in [5, 99, 12345678901, 0, 7, 7]], "node bigint"
    )
    a = {r.node: r.idx for r in indexed_vocab(nodes).collect()}
    b = {r.node: r.idx for r in indexed_vocab(nodes).collect()}
    assert a == b
    assert sorted(a.values()) == list(range(5))  # 5 distinct nodes


def test_skipgram_negatives_deterministic_and_complete(spark):
    """k draws per pair, every negative comes from the vocab, and the
    draws replay the integer hash exactly (Python reference)."""
    from streaming_recommendation_spark.operators.graph import (
        indexed_vocab,
        skipgram_negatives,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (3, 4), (1, 4)], "center bigint, context bigint"
    )
    vocab = spark.createDataFrame([(n,) for n in range(10, 30)], "node bigint")
    out = skipgram_negatives(pairs, vocab, k=3).collect()
    assert len(out) == 9
    vset = set(range(10, 30))
    assert all(r.neg_id in vset for r in out)
    # replay the draw in Python against the operator's own index
    idx = {r.idx: r.node for r in indexed_vocab(vocab).collect()}
    K, M32, T31 = 2654435761, 1 << 32, 1 << 31

    def kh(x):
        return ((x % T31) * K) % M32

    for r in out:
        h = kh((kh(r.center) + kh(r.context) + r.j * 1000003 + 7) % T31)
        assert r.neg_id == idx[h % len(idx)], (r.center, r.context, r.j)


def test_kcore_cascade_and_fixpoint(spark):
    """A tail hanging off a triangle peels away over MULTIPLE rounds
    (the cascade), the triangle itself survives as the 2-core, and an
    extra round is idempotent."""
    from streaming_recommendation_spark.operators.graph import kcore

    # triangle 1-2-3 with a path tail 3-4-5
    und = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src bigint, dst bigint"
    )
    r1 = {r.node: r.degree for r in kcore(edges, 2, rounds=1).collect()}
    # round 1 peels only 5 (deg 1); 4 survives with deg 2 -> 1 after
    assert set(r1) == {1, 2, 3, 4}
    r2 = {r.node: r.degree for r in kcore(edges, 2, rounds=2).collect()}
    assert set(r2) == {1, 2, 3}
    r3 = {r.node: r.degree for r in kcore(edges, 2, rounds=3).collect()}
    assert r3 == {1: 2, 2: 2, 3: 2} == r2  # fixpoint reached


def test_kcore_dataframe_threshold_and_empty_core(spark):
    """k as a 1-row frame joins as a broadcast scalar; a k above the
    max degree empties the graph."""
    from streaming_recommendation_spark.operators.graph import kcore

    und = [(1, 2), (2, 3), (1, 3)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src bigint, dst bigint"
    )
    kf = spark.createDataFrame([(2,)], "k bigint")
    got = {r.node: r.degree for r in kcore(edges, kf, rounds=2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}
    assert kcore(edges, 5, rounds=2).count() == 0


def test_q152_nondegenerate(spark):
    """The registered peel must actually remove something AND keep
    something at every SF (the derived-median threshold guarantees
    both — a fixed k would go vacuous or empty as degrees shift)."""
    from pyspark.sql import functions as F

    from streaming_recommendation_spark.queries import registry

    from .conftest import SF_DIR
    from streaming_recommendation_spark.sources.testdata import load_table

    spark_df = registry()["q152_kcore_peeling"].fn(spark, SF_DIR)
    surviving = spark_df.count()
    li = load_table(spark, "lineitem", SF_DIR)
    n_nodes = (
        li.select((F.col("l_suppkey") * 2).alias("n")).unionByName(
            li.select((F.col("l_partkey") * 2 + 1).alias("n"))
        ).distinct().count()
    )
    assert 0 < surviving < n_nodes


def test_weighted_indexed_vocab_tiles_total_weight(spark):
    """Ranges are disjoint, cover [0, W) exactly, and each node's
    width equals its weight."""
    from streaming_recommendation_spark.operators.graph import (
        weighted_indexed_vocab,
    )

    wts = [(10, 3), (11, 1), (12, 5), (99, 2)]
    df = spark.createDataFrame(wts, "node bigint, weight bigint")
    rows = weighted_indexed_vocab(df).collect()
    widths = {r.node: r.hi - r.lo for r in rows}
    assert widths == dict(wts)
    ivs = sorted((r.lo, r.hi) for r in rows)
    assert ivs[0][0] == 0 and ivs[-1][1] == 11  # W = 3+1+5+2
    for (a, b), (c, d) in zip(ivs, ivs[1:]):
        assert b == c  # gapless, disjoint


def test_weighted_negatives_match_direct_range_lookup(spark):
    """Granule-join draws equal a Python replay of hash -> range
    lookup; zero-weight nodes are never drawn; heavier nodes are
    drawn more often across many pairs."""
    from streaming_recommendation_spark.operators.graph import (
        skipgram_negatives_weighted,
        weighted_indexed_vocab,
    )

    wts = [(1, 1), (2, 50), (3, 1), (4, 0)]
    wdf = spark.createDataFrame(wts, "node bigint, weight bigint")
    pairs = spark.createDataFrame(
        [(a, b) for a in range(30) for b in (100, 200)],
        "center bigint, context bigint",
    )
    out = skipgram_negatives_weighted(pairs, wdf, k=2).collect()
    assert len(out) == 120  # 60 pairs x 2 draws, every draw resolved
    ranges = {
        (r.lo, r.hi): r.node for r in weighted_indexed_vocab(wdf).collect()
    }
    K, M32, T31 = 2654435761, 1 << 32, 1 << 31

    def kh(x):
        return ((x % T31) * K) % M32

    W = sum(w for _, w in wts)
    counts = {}
    for r in out:
        d = kh((kh(r.center) + kh(r.context) + r.j * 1000003 + 7) % T31) % W
        owner = next(n for (lo, hi), n in ranges.items() if lo <= d < hi)
        assert r.neg_id == owner
        counts[r.neg_id] = counts.get(r.neg_id, 0) + 1
    assert 4 not in counts  # zero weight never drawn
    assert counts.get(2, 0) > counts.get(1, 0) + counts.get(3, 0)


def test_skipgram_negatives_reject_k_below_one(spark):
    """sequence(1, 0) auto-steps -1 and would emit junk draws [1, 0];
    both samplers must refuse k < 1 (review-pass regression)."""
    import pytest
    from pyspark.sql import functions as F

    from streaming_recommendation_spark.operators.graph import (
        skipgram_negatives,
        skipgram_negatives_weighted,
    )

    pairs = spark.createDataFrame([(1, 2)], "center bigint, context bigint")
    vocab = spark.createDataFrame([(1,), (2,)], "node bigint")
    weights = vocab.select("node", F.lit(1).cast("long").alias("w"))
    with pytest.raises(ValueError, match="k >= 1"):
        skipgram_negatives(pairs, vocab, k=0)
    with pytest.raises(ValueError, match="k >= 1"):
        skipgram_negatives_weighted(pairs, weights, k=0)
