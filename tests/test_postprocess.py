"""Postprocess word-stripped re-scoring (O20): Spark pipeline vs oracle."""

import pytest

from name_matching_spark.nm_core.oracle import run_nm_oracle
from name_matching_spark.pipeline import MatchConfig, match_names
from name_matching_spark.sources.pages import (
    adjusted_names_corpus,
    names_corpus,
)

N = 30


def test_legal_suffix_postprocess_matches_oracle(spark):
    names = names_corpus(N)
    adj = adjusted_names_corpus(N)
    df_b = spark.createDataFrame(
        [(r["id"], r["company_name"]) for r in names], "id long, name string")
    df_a = spark.createDataFrame(
        [(r["id"], r["company_name"]) for r in adj], "id long, name string")
    res = match_names(spark, df_a, df_b, "id", "name", "id", "name",
                      config=MatchConfig(threshold=0.0, legal_suffixes=True))
    got = {int(r["a_id"]): (int(r["b_id"]), float(r["score"]))
           for r in res.collect()}
    oracle = run_nm_oracle([r["company_name"] for r in adj],
                           [r["company_name"] for r in names],
                           threshold=0.0, legal_suffixes=True)
    assert set(got) == set(oracle)
    for a_id, (b_id, score) in oracle.items():
        gb, gs = got[a_id]
        assert gb == b_id
        assert gs == pytest.approx(score, abs=1e-9)


def test_common_words_postprocess_changes_scores(spark):
    # every master shares the word 'bancorp' -> common-word set strips it
    # and scores are recomputed on the stripped names
    masters = [(i, f"{n} bancorp") for i, n in enumerate(
        ["zephyr", "umbra", "velvet", "ember", "quartz"])]
    queries = [(i, f"{n}x bancorp") for i, n in enumerate(
        ["zephyr", "umbra", "velvet", "ember", "quartz"])]
    df_m = spark.createDataFrame(masters, "id long, name string")
    df_q = spark.createDataFrame(queries, "id long, name string")
    base = match_names(spark, df_q, df_m, "id", "name", "id", "name",
                       config=MatchConfig(threshold=0.0, top_n=3))
    post = match_names(spark, df_q, df_m, "id", "name", "id", "name",
                       config=MatchConfig(threshold=0.0, top_n=3,
                                          common_words=True,
                                          cut_off_no_scoring_words=0.5))
    b = {r["a_id"]: r["score"] for r in base.collect()}
    p = {r["a_id"]: r["score"] for r in post.collect()}
    assert set(b) == set(p)
    # stripping the shared word makes the residual difference weigh more
    assert any(abs(b[k] - p[k]) > 1.0 for k in b)
