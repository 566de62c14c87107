"""Pairwise ensemble scoring + best-match selection.

Replaces the reference's per-row Python scoring loop
(name_matcher.py:849-915 ``_score_matches``/``_rate_matches``) with one
Arrow-batched pandas UDF over the candidate-pair DataFrame followed by a
window argmax.  The UDF kernel is nm_core.metrics -- the same functions the
oracle uses -- so Spark and oracle scores are identical per pair.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType

from ..nm_core.metrics import DEFAULT_METRICS, flat_metric_fns
from .tfidf import GROUP_COL


def score_pairs_udf(metrics=DEFAULT_METRICS):
    """pandas UDF (name_a, name_b) -> array<double> of per-metric sims."""
    metric_names = tuple(metrics)

    @F.pandas_udf(ArrayType(DoubleType()))
    def _score(name_a: pd.Series, name_b: pd.Series) -> pd.Series:
        fns = flat_metric_fns(metric_names)  # resolved on the executor
        return pd.Series(
            [
                [fn(str(a), str(b)) for fn in fns]
                for a, b in zip(name_a, name_b)
            ]
        )

    return _score


def score_mean_udf(metrics=DEFAULT_METRICS):
    """pandas UDF (name_a, name_b) -> double mean metric score.

    Half the Arrow return volume of the array variant and no per-row list
    construction -- the default-path ranking only needs the mean
    (name_matcher.py:898).  Use score_pairs_udf when the per-metric vector
    is needed (optimiser features, return_algorithms_score parity).
    """
    metric_names = tuple(metrics)

    @F.pandas_udf(DoubleType())
    def _score(name_a: pd.Series, name_b: pd.Series) -> pd.Series:
        fns = flat_metric_fns(metric_names)
        k = len(fns)
        out = [
            sum(fn(str(a), str(b)) for fn in fns) / k
            for a, b in zip(name_a, name_b)
        ]
        return pd.Series(out, dtype="float64")

    return _score


def score_candidates(
    candidates: DataFrame,
    query_name_col: str = "query_name",
    cand_name_col: str = "cand_name",
    metrics=DEFAULT_METRICS,
    keep_scores: bool = False,
) -> DataFrame:
    """Add ``mean_score`` (and, with keep_scores, the per-metric ``scores``
    array) to a candidate-pair DataFrame."""
    if keep_scores:
        udf = score_pairs_udf(metrics)
        scored = candidates.withColumn(
            "scores", udf(F.col(query_name_col), F.col(cand_name_col)))
        return scored.withColumn(
            "mean_score",
            F.aggregate("scores", F.lit(0.0), lambda acc, x: acc + x)
            / F.size("scores"),
        )
    udf = score_mean_udf(metrics)
    return candidates.withColumn(
        "mean_score", udf(F.col(query_name_col), F.col(cand_name_col)))


def postprocess_rescore(
    matches: DataFrame,
    word_set: frozenset,
    query_name_col: str = "query_name",
    cand_name_col: str = "cand_name",
    metrics=DEFAULT_METRICS,
) -> DataFrame:
    """Reference postprocess (name_matcher.py:984-1009): strip no-scoring
    words (legal suffixes / corpus-common words) from both names of each
    *winning* pair and overwrite the score with the re-scored mean x100.
    Matches stand; only scores change.  Runs on winners only (<= one row
    per query), so the extra UDF pass is negligible."""
    from ..nm_core.preprocess import strip_words

    metric_names = tuple(metrics)
    words = frozenset(word_set)

    @F.pandas_udf(DoubleType())
    def _rescore(name_a: pd.Series, name_b: pd.Series) -> pd.Series:
        fns = flat_metric_fns(metric_names)
        k = len(fns)
        out = []
        for a, b in zip(name_a, name_b):
            a2 = strip_words(str(a), words)
            b2 = strip_words(str(b), words)
            out.append(100.0 * sum(fn(a2, b2) for fn in fns) / k)
        return pd.Series(out, dtype="float64")

    return matches.withColumn(
        "score", _rescore(F.col(query_name_col), F.col(cand_name_col)))


def best_matches(scored: DataFrame, number_of_matches: int = 1) -> DataFrame:
    """Per-query argmax (or top-m) by mean score; score scaled to 0-100.

    Mirrors _rate_matches(number_of_matches=1)/_adjust_scores
    (name_matcher.py:897-898,964-982).  Ties break on candidate rank
    (cosine order) like the oracle.
    """
    w = Window.partitionBy(GROUP_COL, "qid").orderBy(
        F.col("mean_score").desc(), F.col("rank").asc())
    return (
        scored.withColumn("match_rank", F.row_number().over(w))
        .filter(F.col("match_rank") <= number_of_matches)
        .withColumn("score", F.col("mean_score") * 100.0)
    )
