"""Bucketed co-located join: the blocking join without a shuffle.

Writes both n-gram weight tables bucketed on the join key and asserts the
join plan contains NO Exchange on either side -- the physical evidence for
the 100 TB plan (fit master once, write bucketed, query runs join
shuffle-free).
"""

import shutil
from urllib.parse import urlparse

import pytest
from pyspark.sql import functions as F

from name_matching_spark.sources.bucketed import read_table, write_bucketed


def _drop_table_and_location(spark, name: str) -> None:
    """``DROP TABLE IF EXISTS`` plus deleting the managed-table LOCATION.

    A fresh session's in-memory catalog doesn't know tables a previous
    session created, so the DROP is a no-op while the on-disk
    ``spark-warehouse/<name>`` directory survives -- ``saveAsTable`` then
    fails with LOCATION_ALREADY_EXISTS.  Clearing the path directly makes
    the fixture independent of prior-session state."""
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{warehouse}/{name}", ignore_errors=True)


@pytest.fixture()
def bucketed_weights(spark, tmp_path):
    # spark.sql.warehouse.dir is a static conf (set at session build); the
    # shared test session uses its default -- tables (and their on-disk
    # locations, which a new session's catalog can't see) are cleared in
    # both setup and teardown
    m = spark.range(500).select(
        F.concat(F.lit("g"), (F.col("id") % 40)).alias("ngram"),
        F.col("id").alias("mid"),
        (F.col("id") % 97 / 97.0).alias("wm"))
    q = spark.range(200).select(
        F.concat(F.lit("g"), (F.col("id") % 40)).alias("ngram"),
        (F.col("id") + 10_000).alias("qid"),
        (F.col("id") % 89 / 89.0).alias("wq"))
    _drop_table_and_location(spark, "m_weights_b")
    _drop_table_and_location(spark, "q_weights_b")
    write_bucketed(m, "m_weights_b", ["ngram"], buckets=8)
    write_bucketed(q, "q_weights_b", ["ngram"], buckets=8)
    yield "m_weights_b", "q_weights_b"
    _drop_table_and_location(spark, "m_weights_b")
    _drop_table_and_location(spark, "q_weights_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_weights):
    m_t, q_t = bucketed_weights
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a non-broadcast join so bucketing is what kills the shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = read_table(spark, q_t).join(read_table(spark, m_t),
                                             "ngram")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # and it computes the right thing
        n = joined.groupBy("qid", "mid").agg(
            F.sum(F.col("wq") * F.col("wm")).alias("c")).count()
        assert n > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_unbucketed_join_does_shuffle(spark, bucketed_weights):
    """Control: the same join on plain DataFrames shows the Exchange the
    bucketing removed."""
    m = read_table(spark, bucketed_weights[0])
    plain = m.sparkSession.createDataFrame(m.collect(), m.schema)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = plain.alias("a").join(
            plain.alias("b"), "ngram")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
