"""Skew handling: salted equi-join correctness + hot-entity linkage.

The north rule names explicit block-key salting for skewed hot names; the
salting operator must be a drop-in equal of the plain equi-join, and the
pipeline must stay correct when one entity dominates a block (the
hot-name case the df-cap/AQE/salting levers exist for).
"""

import pytest
from pyspark.sql import functions as F

from name_matching_spark.operators.blocking import salted_equi_join
from name_matching_spark.pipeline import MatchConfig, match_pages
from name_matching_spark.sources.pages import pages_rows


def test_salted_join_equals_plain_join(spark):
    # pathologically hot key: 90% of the big side shares one block key
    big = spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), F.col("id") % 7)).alias("key"),
        F.col("id").alias("left_id"))
    small = spark.createDataFrame(
        [("hot", 100), ("k1", 200), ("k3", 300), ("missing", 400)],
        "key string, right_id int")
    plain = {(r["key"], r["left_id"], r["right_id"])
             for r in big.join(small, "key").collect()}
    salted = {(r["key"], r["left_id"], r["right_id"])
              for r in salted_equi_join(big, small, ["key"],
                                        salt=8).collect()}
    assert salted == plain
    assert len(plain) > 1500  # the hot key actually dominated


def test_salted_join_left_outer(spark):
    big = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "key string, left_id int")
    small = spark.createDataFrame([("a", 10)], "key string, right_id int")
    got = {(r["key"], r["left_id"], r["right_id"])
           for r in salted_equi_join(big, small, ["key"],
                                     salt=4, how="left").collect()}
    assert got == {("a", 1, 10), ("a", 2, 10), ("b", 3, None)}


def test_hot_entity_linkage_stays_correct(spark):
    """One entity with 30 extra page variants (a hot extracted name) must
    not poison matching for the other entities or itself."""
    rows = pages_rows(entities=25, variants=2, hot_entity=3,
                      hot_variants=30)
    df = spark.createDataFrame(rows)
    a = df.filter(F.col("variant_id") >= 1)   # all perturbed variants
    b = df.filter(F.col("variant_id") == 0)   # originals
    res = match_pages(spark, a, b,
                      config=MatchConfig(threshold=50.0)).collect()
    by_a = {}
    for r in res:
        by_a.setdefault(r["a_id"], set()).add(r["b_id"])
    # every variant url must match its own entity's original url
    matched_entities = 0
    for r in rows:
        if r["variant_id"] == 0:
            continue
        expected_b = f"https://site{r['entity_id']}.example/0"
        got = by_a.get(r["url"], set())
        if expected_b in got:
            matched_entities += 1
    n_variants = sum(1 for r in rows if r["variant_id"] >= 1)
    assert matched_entities / n_variants >= 0.9
    # the hot entity's extra variants all resolve to the same original
    hot_urls = [r["url"] for r in rows
                if r["entity_id"] == 3 and r["variant_id"] >= 1]
    hot_target = "https://site3.example/0"
    hits = sum(1 for u in hot_urls if hot_target in by_a.get(u, set()))
    assert hits / len(hot_urls) >= 0.9
