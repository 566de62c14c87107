"""Pipeline variants: preprocess_split, multi-match, wide pivot."""

import pytest
from pyspark.sql import functions as F

from name_matching_spark.operators.tfidf import DUMMY_GROUP, GROUP_COL
from name_matching_spark.pipeline import (
    MatchConfig,
    match_names,
    pivot_matches,
    reduce_query_names,
)


def test_reduce_query_names(spark):
    # 'corp' appears 4x (common), others once -> dropped at occurrence 3x min
    rows = [(1, "alpha corp"), (2, "beta corp"), (3, "gamma corp"),
            (4, "delta corp")]
    df = spark.createDataFrame(rows, "id long, name_norm string") \
        .withColumn(GROUP_COL, F.lit(DUMMY_GROUP))
    got = {r["id"]: r["name_norm"]
           for r in reduce_query_names(df).collect()}
    assert got == {1: "alpha", 2: "beta", 3: "gamma", 4: "delta"}


def test_reduce_keeps_word_order(spark):
    rows = [(1, "zz yy zz xx"), (2, "aa zz")]
    df = spark.createDataFrame(rows, "id long, name_norm string") \
        .withColumn(GROUP_COL, F.lit(DUMMY_GROUP))
    got = {r["id"]: r["name_norm"]
           for r in reduce_query_names(df, occurrence_count=3).collect()}
    # zz count=3, min in row1 = 1 (yy/xx) -> zz dropped, order preserved
    assert got[1] == "yy xx"
    assert got[2] == "aa"


def test_preprocess_split_recovers_common_word_noise(spark):
    """A query drowning in corpus-common words should still match once the
    split variant searches the reduced string."""
    masters = [(i, n) for i, n in enumerate(
        ["zephyr quill", "umbra nocturne", "velvet quasar", "ember lattice"])]
    # every query shares the dominant word "holdings group international"
    queries = [(i, f"holdings group international {n}")
               for i, n in masters]
    df_m = spark.createDataFrame(masters, "id long, name string")
    df_q = spark.createDataFrame(queries, "id long, name string")
    cfg = MatchConfig(threshold=0.0, top_n=2, preprocess_split=True)
    res = match_names(spark, df_q, df_m, "id", "name", "id", "name",
                      config=cfg).collect()
    by_q = {r["a_id"]: r["b_id"] for r in res}
    assert by_q == {0: 0, 1: 1, 2: 2, 3: 3}


def test_multi_match_and_pivot(spark):
    masters = [(0, "acme corp"), (1, "acme corpo"), (2, "zenith ltd")]
    queries = [(10, "acme corp")]
    df_m = spark.createDataFrame(masters, "id long, name string")
    df_q = spark.createDataFrame(queries, "id long, name string")
    cfg = MatchConfig(threshold=0.0, top_n=3, number_of_matches=2)
    res = match_names(spark, df_q, df_m, "id", "name", "id", "name",
                      config=cfg)
    rows = res.collect()
    # exact match short-circuits query 10 -> master 0; fuzzy adds none for it
    assert {(r["a_id"], r["b_id"]) for r in rows} == {(10, 0)}

    # force the fuzzy path with a perturbed query
    df_q2 = spark.createDataFrame([(10, "acme corq")], "id long, name string")
    res2 = match_names(spark, df_q2, df_m, "id", "name", "id", "name",
                       config=cfg)
    rows2 = res2.collect()
    assert len(rows2) == 2  # two ranked fuzzy alternatives
    wide = pivot_matches(res2, 2).collect()[0]
    assert wide["match_index_0"] in (0, 1)
    assert wide["score_0"] >= wide["score_1"]


def test_delete_legal_prepare_matches_double_pass_oracle(spark):
    """Round-5 verdict item #1: the Spark prepare UDF under delete_legal
    must reproduce the reference's operative double preprocess (the NumPy
    oracle composition), including on names with stacked leading legal
    tokens where a single pass provably diverges."""
    from name_matching_spark.nm_core.preprocess import (
        PreprocessConfig, light_preprocess_name, pipeline_preprocess_name)
    from name_matching_spark.pipeline import MatchConfig, _prepare

    cfg = MatchConfig(preprocess=PreprocessConfig(
        preprocess_legal=True, delete_legal=True))
    names = ["bv bv Acme", "nv bv sa Acme", "Acme Limited",
             "gmbh Acme gmbh", "", "plain name"]
    df = spark.createDataFrame(list(enumerate(names)),
                               "id long, name string")
    got = {r["id"]: r["name_norm"]
           for r in _prepare(df, "id", "name", None, cfg).collect()}
    expected = {i: pipeline_preprocess_name(light_preprocess_name(n),
                                            cfg.preprocess)
                for i, n in enumerate(names)}
    assert got == expected
    # the stacked-token name really exercises the divergence
    from name_matching_spark.nm_core.preprocess import preprocess_name
    assert (preprocess_name(light_preprocess_name("bv bv Acme"),
                            cfg.preprocess) != expected[0])
