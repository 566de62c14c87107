"""Degenerate pipeline inputs must not crash or mismatch.

Empty sides, single rows, all-exact corpora and all-empty names are the
shapes a 100 TB run hits in stray partitions; each must produce a sane
(possibly empty) result, not an exception.
"""

from pyspark.sql import functions as F

from name_matching_spark.pipeline import MatchConfig, match_names

SCHEMA = "id long, name string"
CFG = MatchConfig(threshold=0.0)


def test_empty_query_side(spark):
    df_a = spark.createDataFrame([], SCHEMA)
    df_b = spark.createDataFrame([(0, "acme corp")], SCHEMA)
    assert match_names(spark, df_a, df_b, "id", "name", "id", "name",
                       config=CFG).count() == 0


def test_empty_master_side(spark):
    df_a = spark.createDataFrame([(0, "acme corp")], SCHEMA)
    df_b = spark.createDataFrame([], SCHEMA)
    assert match_names(spark, df_a, df_b, "id", "name", "id", "name",
                       config=CFG).count() == 0


def test_single_row_each_side(spark):
    df_a = spark.createDataFrame([(1, "acme corpx")], SCHEMA)
    df_b = spark.createDataFrame([(2, "acme corp")], SCHEMA)
    rows = match_names(spark, df_a, df_b, "id", "name", "id", "name",
                       config=CFG).collect()
    assert [(r["a_id"], r["b_id"]) for r in rows] == [(1, 2)]
    assert rows[0]["source"] == "fuzzy"


def test_all_exact_corpus(spark):
    rows = [(i, f"company {i}") for i in range(20)]
    df_a = spark.createDataFrame(rows, SCHEMA)
    df_b = spark.createDataFrame(rows, SCHEMA)
    got = match_names(spark, df_a, df_b, "id", "name", "id", "name",
                      config=CFG).collect()
    assert all(r["source"] == "exact" for r in got)
    assert {(r["a_id"], r["b_id"]) for r in got} == {(i, i)
                                                     for i in range(20)}


def test_all_empty_names(spark):
    df_a = spark.createDataFrame([(1, ""), (2, "  ")], SCHEMA)
    df_b = spark.createDataFrame([(3, ""), (4, None)], SCHEMA)
    assert match_names(spark, df_a, df_b, "id", "name", "id", "name",
                       config=CFG).count() == 0


def test_case_sensitive_exact_join(spark):
    """run_nm sensitivity flags: with case_sensitive=True the light names
    keep case, so 'ACME Corp' vs 'acme corp' is no longer an exact match
    (it still matches through the fuzzy path, whose full preprocess
    lowercases)."""
    df_a = spark.createDataFrame([(1, "ACME Corp")], SCHEMA)
    df_b = spark.createDataFrame([(2, "acme corp")], SCHEMA)
    default = match_names(spark, df_a, df_b, "id", "name", "id", "name",
                          config=CFG).collect()
    assert [r["source"] for r in default] == ["exact"]
    cs = match_names(spark, df_a, df_b, "id", "name", "id", "name",
                     config=MatchConfig(threshold=0.0,
                                        case_sensitive=True)).collect()
    assert [(r["a_id"], r["b_id"], r["source"]) for r in cs] == \
        [(1, 2, "fuzzy")]


def test_auto_prefix_switch_engages(spark):
    """Above auto_prefix_threshold docs per block, candidate generation
    must route through the prefix-filtered blocker (its exact-cosine
    verify is a map_zip_with fold -- visible in the plan) and still match
    correctly."""
    masters = [(i, f"entity number {i} gmbh") for i in range(30)]
    queries = [(100 + i, f"entity number {i} gmbgh") for i in range(5)]
    df_m = spark.createDataFrame(masters, SCHEMA)
    df_q = spark.createDataFrame(queries, SCHEMA)
    cfg = MatchConfig(threshold=0.0, auto_prefix_threshold=10)
    res = match_names(spark, df_q, df_m, "id", "name", "id", "name",
                      config=cfg)
    plan = res._jdf.queryExecution().optimizedPlan().toString()
    assert "map_zip_with" in plan  # prefix verify stage present
    got = {r["a_id"]: r["b_id"] for r in res.collect()}
    assert got == {100 + i: i for i in range(5)}
    # below the threshold the exact inverted-index join is used instead
    cfg2 = MatchConfig(threshold=0.0, auto_prefix_threshold=1000)
    res2 = match_names(spark, df_q, df_m, "id", "name", "id", "name",
                       config=cfg2)
    plan2 = res2._jdf.queryExecution().optimizedPlan().toString()
    assert "map_zip_with" not in plan2


def test_null_names_mixed(spark):
    df_a = spark.createDataFrame([(1, None), (2, "acme corp")], SCHEMA)
    df_b = spark.createDataFrame([(3, "acme corp"), (4, None)], SCHEMA)
    got = match_names(spark, df_a, df_b, "id", "name", "id", "name",
                      config=CFG).collect()
    assert {(r["a_id"], r["b_id"]) for r in got} == {(2, 3)}
