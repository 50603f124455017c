"""Plan-shape regression pins: the physical properties that make the
headline queries scale are asserted, not assumed."""

from __future__ import annotations

import pytest

from streaming_recommendation_spark.plans import audit
from streaming_recommendation_spark.queries import registry

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def run(spark):
    qs = registry()

    def _run(name):
        return audit(qs[name].fn(spark, SF_DIR))

    return _run


def test_q01_scan_shape(run):
    a = run("q01_pricing_summary")
    # the shipdate predicate reaches the parquet reader
    assert any("l_shipdate" in p for p in a["pushed_filters"])
    # single shuffle (the groupBy); everything else stays in-stage
    assert a["n_exchanges"] == 1


def test_q02_star_join_broadcasts(run):
    a = run("q02_revenue_by_nation")
    assert a["n_broadcast_joins"] >= 2  # customer + nation stay broadcast
    assert a["bnl_joins"] == 0


def test_q03_take_ordered(run):
    assert run("q03_top_orders")["has_take_ordered"]


def test_q11_window_group_limit(run):
    assert run("q11_last5_events")["has_window_group_limit"]


def test_q12_asof_single_shuffle(run):
    a = run("q12_asof_last_event")
    # union+window as-of: the window's user_id shuffle plus the final
    # aggregation — never a per-key join explosion
    assert a["n_sortmerge_joins"] == 0
    assert a["bnl_joins"] == 0


def test_q13_range_join_is_equi(run):
    # bucketized range join must plan as an equi join (SMJ or
    # broadcast), NEVER broadcast-nested-loop
    a = run("q13_range_join_counts")
    assert a["bnl_joins"] == 0
    assert a["n_sortmerge_joins"] + a["n_broadcast_joins"] + a[
        "n_shuffled_hash_joins"
    ] >= 1


def test_q35_knn_no_vector_shuffle(run):
    a = run("q35_knn_brute_force")
    # corpus scored in place: the only join is the broadcast of queries
    assert a["bnl_joins"] >= 1 or a["n_broadcast_joins"] >= 1
    assert a["n_sortmerge_joins"] == 0


def test_q27_dict_encode_no_global_window(run):
    """q27 ships the scale path (per-partition offsets), so the plan
    must not contain a single-partition exchange — the signature of a
    global dense_rank window (VERDICT r1 scale-killer)."""
    a = run("q27_dict_encode_users")
    assert "SinglePartition" not in a["plan"]


def test_q66_ivf_broadcasts_queries(run):
    """IVF cell join must broadcast the probed-query side (tiny), not
    sort-merge the corpus; the landmark assignment cross-joins are
    16-row broadcast nested loops (intended)."""
    a = run("q66_ivf_knn")
    assert a["n_sortmerge_joins"] == 0
    assert a["n_broadcast_joins"] >= 1
    assert a["has_window_group_limit"]
