"""Supervised rescoring (pyspark.ml scaler + GBT over metric vectors)."""

import pytest
from pyspark.sql import functions as F

from name_matching_spark.nm_core.metrics import flat_metric_fns
from name_matching_spark.operators.optimiser import (
    cross_validate,
    fit_optimiser,
    predict_matches,
    random_uneven_split,
)
from name_matching_spark.sources.pages import company_name, perturb_name


@pytest.fixture(scope="module")
def labeled_scores(spark):
    fns = flat_metric_fns()
    rows = []
    for i in range(80):
        q = perturb_name(company_name(i), i, 1)
        pos = company_name(i)
        neg = company_name((i + 7) % 80)
        rows.append((i, i, [fn(q, pos) for fn in fns], 1))
        rows.append((i, (i + 7) % 80, [fn(q, neg) for fn in fns], 0))
    return spark.createDataFrame(
        rows, "qid long, mid long, scores array<double>, label int")


def test_fit_predict_separates_matches(labeled_scores):
    model = fit_optimiser(labeled_scores, max_iter=10)
    got = predict_matches(model, labeled_scores, threshold=0.5)
    picks = {r["qid"]: (r["mid"], r["label"]) for r in got.collect()}
    correct = sum(1 for _, (mid, label) in picks.items() if label == 1)
    assert correct / max(len(picks), 1) >= 0.9


def test_cross_validate_accuracy(labeled_scores):
    accs = cross_validate(labeled_scores, folds=3, max_iter=10)
    assert len(accs) == 3
    assert sum(accs) / 3 >= 0.8


def test_random_uneven_split(labeled_scores):
    parts = random_uneven_split(labeled_scores, [0.5, 0.3, 0.2])
    total = sum(p.count() for p in parts)
    assert total == labeled_scores.count()
