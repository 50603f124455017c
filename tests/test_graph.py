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
