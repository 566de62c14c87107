"""Spark long-form TF-IDF + cosine top-n vs the dense NumPy oracle."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from name_matching_spark.nm_core.tfidf import TfidfOracle
from name_matching_spark.operators.blocking import cosine_top_n
from name_matching_spark.operators.tfidf import (
    doc_count_table,
    explode_char_ngrams,
    idf_table,
    master_weights,
    query_weights,
    with_group,
)

MASTERS = [
    "de nederlandsche bank", "nederlandsche bank", "deutsche bank",
    "rabobank nederland", "ing groep", "abn amro bank", "bank of america",
    "bnp paribas", "societe generale", "credit agricole",
]
QUERIES = ["de nederlandse bank", "duitse bank", "rabo bank", "ing group"]


@pytest.fixture(scope="module")
def spark_weights(spark):
    m_df = with_group(
        spark.createDataFrame(list(enumerate(MASTERS)), "id long, name string"),
        None)
    q_df = with_group(
        spark.createDataFrame(list(enumerate(QUERIES)), "id long, name string"),
        None)
    m_tf = explode_char_ngrams(m_df, "id", "name")
    q_tf = explode_char_ngrams(q_df, "id", "name")
    idf = idf_table(m_tf, doc_count_table(m_df, "id"))
    return master_weights(m_tf, idf), query_weights(q_tf, idf), idf


def test_master_weights_match_oracle(spark_weights):
    m_w, _, _ = spark_weights
    oracle = TfidfOracle().fit_master(MASTERS)
    rows = m_w.collect()
    vocab = oracle.vocabulary_
    dense = np.zeros_like(oracle.master_matrix_)
    for r in rows:
        dense[r["id"], vocab[r["ngram"]]] = r["weight"]
    np.testing.assert_allclose(dense, oracle.master_matrix_, atol=1e-12)


def test_query_weights_match_oracle(spark_weights):
    _, q_w, _ = spark_weights
    oracle = TfidfOracle().fit_master(MASTERS)
    expected = oracle.transform(QUERIES)
    rows = q_w.collect()
    dense = np.zeros((len(QUERIES), len(oracle.vocabulary_)))
    for r in rows:
        dense[r["id"], oracle.vocabulary_[r["ngram"]]] = r["weight"]
    np.testing.assert_allclose(dense, expected, atol=1e-12)


def test_cosine_top_n_matches_oracle(spark_weights):
    m_w, q_w, idf = spark_weights
    oracle = TfidfOracle().fit_master(MASTERS)
    expected = oracle.top_n(QUERIES, top_n=3)
    got = cosine_top_n(q_w, m_w, top_n=3).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["qid"], []).append((r["rank"], r["mid"], r["cosine"]))
    for qid, exp in enumerate(expected):
        rows = sorted(by_q.get(qid, []))
        assert [m for _, m, _ in rows] == [m for m, _ in exp]
        for (_, _, cos), (_, exp_cos) in zip(rows, exp):
            # the oracle rounds cosines to 9 dp before ranking (tie
            # determinism); the raw spark cosine may differ by <= 0.5 ulp9
            assert cos == pytest.approx(exp_cos, abs=5.1e-10)


def test_df_cap_drops_hot_ngrams(spark_weights):
    m_w, q_w, idf = spark_weights
    # every master contains 'an' or ' b'-ish grams; cap at 30% of docs
    capped = cosine_top_n(q_w, m_w, top_n=3, idf=idf, df_cap_frac=0.3)
    uncapped = cosine_top_n(q_w, m_w, top_n=3)
    assert capped.count() > 0
    # capped cosine never exceeds uncapped for the same pair
    joined = (
        capped.select("qid", "mid", F.col("cosine").alias("c_cap"))
        .join(uncapped.select("qid", "mid",
                              F.col("cosine").alias("c_full")),
              ["qid", "mid"])
        .collect()
    )
    assert joined
    for r in joined:
        assert r["c_cap"] <= r["c_full"] + 1e-12


def test_prefix_filtered_top1_agrees_with_exact(spark):
    from name_matching_spark.operators.blocking import prefix_filtered_top_n
    from name_matching_spark.sources.pages import (adjusted_names_corpus,
                                                   names_corpus)

    N = 100
    names = names_corpus(N)
    adj = adjusted_names_corpus(N)
    m = with_group(spark.createDataFrame(
        [(r["id"], r["company_name"].lower()) for r in names],
        "id long, name string"), None)
    q = with_group(spark.createDataFrame(
        [(r["id"], r["company_name"].lower()) for r in adj],
        "id long, name string"), None)
    m_tf = explode_char_ngrams(m, "id", "name")
    q_tf = explode_char_ngrams(q, "id", "name")
    idf = idf_table(m_tf, doc_count_table(m, "id")).persist()
    m_w = master_weights(m_tf, idf).persist()
    q_w = query_weights(q_tf, idf).persist()
    exact = {r["qid"]: r["mid"]
             for r in cosine_top_n(q_w, m_w, 50)
             .filter(F.col("rank") == 1).collect()}
    pref = {r["qid"]: r["mid"]
            for r in prefix_filtered_top_n(q_w, m_w, idf, 50, prefix_size=6,
                                           df_cap_frac=None)
            .filter(F.col("rank") == 1).collect()}
    agree = sum(1 for k, v in exact.items() if pref.get(k) == v)
    assert agree / len(exact) >= 0.95


def test_topk_plan_uses_window_group_limit(spark_weights):
    """The per-qid top-k must be a bounded-heap WindowGroupLimit, not a full
    sort -- this is what keeps the operator viable at 100 TB."""
    m_w, q_w, _ = spark_weights
    plan = cosine_top_n(q_w, m_w, top_n=3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "WindowGroupLimit" in plan
