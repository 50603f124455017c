"""SQL API surface: users can query the registered views with raw
Spark SQL and get exactly what the DataFrame plans produce."""

from __future__ import annotations

from streaming_recommendation_spark.queries import registry
from streaming_recommendation_spark.sources.testdata import register_views

from .conftest import SF_DIR


def test_spark_sql_matches_dataframe_plan(spark):
    register_views(spark, SF_DIR)
    sql_result = spark.sql(
        """
        SELECT n_name,
               sum(l_extendedprice * (1 - l_discount)) AS revenue,
               count(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY n_name
        """
    )
    df_result = registry()["q02_revenue_by_nation"].fn(spark, SF_DIR)
    a = sorted(map(tuple, sql_result.collect()))
    b = sorted(map(tuple, df_result.collect()))
    assert a == b


def test_views_cover_all_tables(spark):
    register_views(spark, SF_DIR)
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        assert spark.sql(f"SELECT count(*) AS n FROM {t}").collect()[0].n > 0
