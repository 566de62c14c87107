"""Annotation workflow (O30 batch-first): queue preselect + sampling,
CSV store round-trip, label join feeding the O29 optimiser."""

import pytest
from pyspark.sql import functions as F

from name_matching_spark.operators.annotate import (
    NO_MATCH,
    annotation_queue,
    empty_annotations,
    export_annotations,
    import_annotations,
    labeled_scores,
)


@pytest.fixture()
def matches(spark):
    # 4 queries: q1 certain (100), q2/q3 ambiguous band, q4 hopeless (60)
    rows = [
        (1, 10, 100.0), (1, 11, 82.0),
        (2, 20, 91.0), (2, 21, 88.0), (2, 22, 71.0),
        (3, 30, 75.5), (3, 31, 72.0),
        (4, 40, 60.0),
    ]
    return spark.createDataFrame(rows, "a_id long, b_id long, score double")


def test_queue_band_preselect(matches):
    q = annotation_queue(matches, lower_bound=70.0)
    got = {(r["a_id"], r["b_id"]) for r in q.collect()}
    # q1 (max=100) and q4 (max=60) excluded; ALL candidate rows of the
    # ambiguous queries kept (the annotator needs the full slate)
    assert got == {(2, 20), (2, 21), (2, 22), (3, 30), (3, 31)}


def test_queue_sampling_is_deterministic_and_partition_independent(spark,
                                                                   matches):
    full = annotation_queue(matches, lower_bound=70.0, data_percentage=0.5,
                            seed=3)
    again = annotation_queue(matches.repartition(7), lower_bound=70.0,
                             data_percentage=0.5, seed=3)
    a = sorted((r["a_id"], r["b_id"]) for r in full.collect())
    b = sorted((r["a_id"], r["b_id"]) for r in again.collect())
    assert a == b                     # hash bucket, not df.sample
    # sampling keeps whole queries, never splits a candidate slate
    kept = {x for x, _ in a}
    all_rows = {(r["a_id"], r["b_id"]) for r in
                annotation_queue(matches, lower_bound=70.0).collect()}
    assert a == sorted((q, m) for q, m in all_rows if q in kept)


def test_annotation_store_roundtrip(spark, tmp_path):
    ann = spark.createDataFrame(
        [("acme inc", "acme incorporated"), ("zed llc", NO_MATCH)],
        "original_name string, match_name string")
    export_annotations(ann, str(tmp_path / "ann"))
    back = import_annotations(spark, str(tmp_path / "ann"))
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, ann.collect()))
    assert empty_annotations(spark).count() == 0


def test_labeled_scores_and_optimiser_fit(spark):
    from name_matching_spark.operators.optimiser import fit_optimiser

    scored = spark.createDataFrame(
        [("acme inc", "acme incorporated", [0.9, 0.8]),
         ("acme inc", "ajax co", [0.3, 0.2]),
         ("zed llc", "zed limited", [0.6, 0.5]),
         ("unlabeled co", "whatever", [0.5, 0.5])],
        "query_name string, cand_name string, scores array<double>")
    ann = spark.createDataFrame(
        [("acme inc", "acme incorporated"), ("zed llc", NO_MATCH)],
        "original_name string, match_name string")
    lab = labeled_scores(scored, ann)
    got = {(r["query_name"], r["cand_name"]): r["label"]
           for r in lab.collect()}
    assert got == {("acme inc", "acme incorporated"): 1.0,
                   ("acme inc", "ajax co"): 0.0,
                   ("zed llc", "zed limited"): 0.0}   # -1 => all negative
    # and the labeled rows feed the O29 pipeline end to end
    model = fit_optimiser(lab, max_iter=3)
    assert model.stages[-1].getLabelCol() == "label"
