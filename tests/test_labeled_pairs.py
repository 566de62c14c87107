"""F1 gate on the FIXTURES.md F3 labeled-pairs table: the Spark pipeline's
pairwise decisions vs the oracle's reference-semantics decisions."""

import pytest
from pyspark.sql import functions as F

from name_matching_spark.pipeline import MatchConfig, match_names
from name_matching_spark.sources.pages import (
    adjusted_names_corpus,
    labeled_pairs,
    names_corpus,
)

N = 50


def test_labeled_pairs_shape():
    rows = labeled_pairs(n_entities=20)
    assert len(rows) == 20 * 11
    assert {r["label"] for r in rows} == {0, 1}
    positives = [r for r in rows if r["label"] == 1]
    # a solid share of positives clears the strict threshold-95 reference
    # decision (heavy perturbations legitimately score below it)
    assert sum(r["ref_decision"] for r in positives) >= 10
    # negatives are never reference-matches
    assert all(not r["ref_decision"] for r in rows if r["label"] == 0)


def test_pairwise_f1_on_labeled_pairs(spark):
    pairs = labeled_pairs(n_entities=N)
    names = names_corpus(N)
    adj = adjusted_names_corpus(N)
    df_b = spark.createDataFrame(
        [(f"https://site{r['id']}.example/0", r["company_name"])
         for r in names], "url string, name string")
    df_a = spark.createDataFrame(
        [(f"https://site{r['id']}.example/1", r["company_name"])
         for r in adj], "url string, name string")
    res = match_names(spark, df_a, df_b, "url", "name", "url", "name",
                      config=MatchConfig(threshold=95.0))
    spark_pairs = {(r["a_id"], r["b_id"]) for r in res.collect()}

    tp = fp = fn = 0
    for row in pairs:
        ref = row["ref_decision"]
        got = int((row["url_a"], row["url_b"]) in spark_pairs)
        tp += ref and got
        fp += got and not ref
        fn += ref and not got
    prec = tp / (tp + fp) if tp + fp else 1.0
    rec = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    assert f1 >= 0.99, f"pairwise F1 {f1} (p={prec}, r={rec})"
