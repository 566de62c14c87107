"""O18 ranking variants: golden table + Spark operator parity.

The golden cases port the reference's test_rate_matches table verbatim
(reference name_matching/test/test_name_matcher.py:495-595); the matrices
there are metric-major, transposed before the call like the reference test
does.  rate_matches_local is the oracle twin; the Spark operator must pick
the same candidates per output slot.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from name_matching_spark.nm_core.ranking import (
    metric_group_sizes,
    rate_matches_local,
)
from name_matching_spark.operators.scoring import rate_matches
from name_matching_spark.operators.tfidf import GROUP_COL

# (number_of_matches, metric-major score matrix, metrics, expected indices)
GOLDEN = [
    (1, [[0.9, 0.3, 0.5, 0.2, 0.1]], ["weighted_jaccard"], [0]),
    (2, [[0.9, 0.3, 0.5, 0.2, 0.1], [0.6, 0.7, 0.8, 0.4, 0.5]],
     ["weighted_jaccard", "discounted_levenshtein"], [0, 2]),
    (3, [[0.9, 0.3, 0.5, 0.2, 0.1], [0.6, 0.7, 0.8, 0.4, 0.5],
         [1, 0.2, 0.3, 0.2, 0.1]],
     ["weighted_jaccard", "discounted_levenshtein", "iterative_sub_string"],
     [0, 2, 0]),
    (2, [[0.9, 0.3, 0.5, 0.2, 0.1], [0.6, 0.7, 0.8, 0.4, 0.5],
         [1, 0.2, 0.3, 0.2, 0.1]],
     ["tichy", "overlap", "bag"], [0, 0]),
    (2, [[0.9, 0.3, 0.5, 0.2, 0.1], [0.6, 0.7, 0.8, 0.4, 0.5]],
     ["overlap", "bag"], [0, 2]),
    (1, [[0.9, 0.3, 0.5, 0.2, 0.1], [0.6, 0.7, 0.8, 0.4, 0.5],
         [1, 0.2, 0.3, 0.2, 0.1]],
     ["weighted_jaccard", "overlap", "iterative_sub_string"], [0]),
    (2, [[0.9, 0.3, 0.5, 0.2, 0.1], [0.6, 0.7, 0.8, 0.4, 0.5],
         [1, 0.2, 0.3, 0.2, 0.1]],
     ["weighted_jaccard", "overlap", "bag"], [0, 2]),
    (1, [[0.3, 0.3, 0.8, 0.2, 0.2]], ["weighted_jaccard"], [2]),
    (3, [[0.3, 0.4, 0.8, 0.2, 0.2], [0.3, 0.3, 0.8, 0.1, 0.1]],
     ["weighted_jaccard", "discounted_levenshtein"], [2, 1, 0]),
    (2, [[0.3, 0.3, 0.2, 0.1, 0.02], [0.1, 0.1, 0.2, 0.3, 0.02]],
     ["weighted_jaccard", "iterative_sub_string"], [0, 3]),
    (1, [[0.3, 0.3, 0.2, 0.1, 0.02], [0.3, 0.3, 0.2, 0.3, 0.02]],
     ["overlap", "iterative_sub_string"], [0]),
    (1, [[-0.5, -0.8, -0.3, -0.7, 0, 2]], ["bag"], [5]),
    (1, [[-0.5, -0.8, -0.3, -0.7, 0, 2]], ["BAG"], [5]),
    (3, [[10, 8, 7, 6, 12, 15, 14, 88]], ["weighted_jaccard"], [7, 5, 6]),
    (2, [[1, 0.3], [0.1, 0.4]],
     ["weighted_jaccard", "discounted_levenshtein"], [0, 1]),
]


@pytest.mark.parametrize("m, matrix, metrics, expected", GOLDEN)
def test_rate_matches_local_golden(m, matrix, metrics, expected):
    score = np.array(matrix, dtype=float).T  # -> (n_candidates, n_metrics)
    sizes = metric_group_sizes(metrics)
    ind = rate_matches_local(score, m, sizes)
    assert len(ind) == min(m, score.shape[0])
    assert ind == expected


def _scored_df(spark, score):
    """Candidate-pair DF shaped like score_candidates(keep_scores=True)."""
    rows = [
        ("", 1, cid, cid + 1, f"q", f"c{cid}",
         [float(v) for v in score[cid]], float(np.mean(score[cid])))
        for cid in range(score.shape[0])
    ]
    return spark.createDataFrame(
        rows,
        f"{GROUP_COL} string, qid long, mid long, rank int, "
        "query_name string, cand_name string, scores array<double>, "
        "mean_score double")


# Spark-side checks for one representative case per dispatch branch
SPARK_CASES = [GOLDEN[1], GOLDEN[3], GOLDEN[4], GOLDEN[13], GOLDEN[0]]


@pytest.mark.parametrize("m, matrix, metrics, expected", SPARK_CASES)
def test_rate_matches_spark_matches_local(spark, m, matrix, metrics,
                                          expected):
    score = np.array(matrix, dtype=float).T
    sizes = metric_group_sizes(metrics)
    df = _scored_df(spark, score)
    got = rate_matches(df, m, sizes).orderBy("position").collect()
    # mid == candidate index in the fixture
    assert [r["mid"] for r in got] == expected
    for r in got:
        assert r["score"] == pytest.approx(
            100.0 * float(np.mean(score[r["mid"]])), abs=1e-9)


def test_match_names_per_group_variant(spark):
    """End-to-end: number_of_matches == len(metric groups) routes through
    the per-group variant and yields one winner row per group."""
    from name_matching_spark.pipeline import MatchConfig, match_names

    masters = [(0, "acme corp"), (1, "acme korp"), (2, "zenith ltd")]
    queries = [(10, "acme cxrp")]
    df_m = spark.createDataFrame(masters, "id long, name string")
    df_q = spark.createDataFrame(queries, "id long, name string")
    # default metrics -> 4 groups (multiset x2, Subsequence, fuzzy, edit)
    cfg = MatchConfig(threshold=0.0, top_n=3, number_of_matches=4)
    rows = match_names(spark, df_q, df_m, "id", "name", "id", "name",
                       config=cfg).collect()
    # 4 slots, all matching one of the two acme candidates
    assert len(rows) == 4
    assert {r["b_id"] for r in rows} <= {0, 1}


def test_per_metric_variant_is_single_shuffle(spark):
    """The per-metric / per-group variants must run as ONE posexplode +
    ONE window (one Exchange), not an n-way union of window passes -- a
    29-shuffle plan at the full default ensemble would dominate at scale."""
    score = np.array([[0.9, 0.1, 0.5], [0.2, 0.8, 0.7], [0.4, 0.3, 0.9]])
    df = _scored_df(spark, score)
    for m, sizes in [(3, [1, 2]), (2, [1, 2])]:  # per-metric, per-group
        plan = rate_matches(df, m, sizes)._jdf.queryExecution() \
            .executedPlan().toString()
        assert plan.count("Exchange") == 1, f"m={m}:\n{plan}"
