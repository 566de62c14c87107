"""Annotation workflow (reference O30/E4, batch-first -- no UI).

The reference's match annotator is an ipywidgets state machine
(/root/reference/name_matching/match_annotator.py:7-211) fed by
``NameMatchingOptimiser.annotate``
(/root/reference/name_matching/name_matching_optimiser.py:263-342):
sample a fraction of query names, match with ``number_of_matches =
max_matches``, preselect ambiguous rows (``lower_bound < max(score) <
100``), collect human labels ``{original_name: match_name | -1}``, export
to CSV, and fit the optimiser from the labeled pairs.

The Spark-first re-expression keeps every piece of that loop EXCEPT the
widget: the preselect + sample becomes a deterministic *annotation queue*
DataFrame any labeling tool (spreadsheet, label-studio export, another
job) can consume; the annotation store is a plain two-column table with
the reference's ``-1`` no-match sentinel; import/export round-trips CSV
(the reference's export_annotation / O4 sink); ``labeled_scores`` joins
labels back onto scored candidate pairs to feed
``operators.optimiser.fit_optimiser`` (O29).  Sampling is hash-based (md5
bucket of the query id), not ``df.sample``, so the queue is
partitioning-independent and reproducible across engines -- the queue
operator is value-oracled in the driver contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

NO_MATCH = "-1"


def _hash_bucket(col, seed: int):
    """Deterministic 0-99 bucket from md5(id:seed) -- reproducible in SQL
    ( ('0x' || substr(md5(...), 1, 8))::BIGINT % 100 ), unlike df.sample
    whose draw depends on partitioning."""
    h = F.md5(F.concat_ws(":", col.cast("string"), F.lit(str(seed))))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % 100


def annotation_queue(
    matches: DataFrame,
    lower_bound: float = 70.0,
    data_percentage: float = 1.0,
    seed: int = 42,
    id_col: str = "a_id",
    score_col: str = "score",
) -> DataFrame:
    """Ambiguous-match labeling queue (reference _preselect_matches +
    annotate's sampling, optimiser.py:263-309).

    Keeps every candidate row of queries whose BEST candidate score sits
    in the uncertainty band ``lower_bound < max < 100`` (certain matches
    at 100 and hopeless ones below the bound waste annotator time), then
    hash-samples ``data_percentage`` of those queries.  One window + one
    filter -- no collect, scales like any grouped aggregation."""
    w = Window.partitionBy(id_col)
    banded = (
        matches
        .withColumn("max_scr", F.max(F.col(score_col)).over(w))
        .filter((F.col("max_scr") > lower_bound)
                & (F.col("max_scr") < 100.0))
    )
    if data_percentage < 1.0:
        banded = banded.filter(
            _hash_bucket(F.col(id_col), seed)
            < int(round(data_percentage * 100)))
    return banded.drop("max_scr")


def empty_annotations(spark: SparkSession) -> DataFrame:
    """Empty annotation store: (original_name, match_name) with the
    reference's ``-1`` sentinel for 'no candidate is correct'."""
    return spark.createDataFrame(
        [], "original_name string, match_name string")


def export_annotations(annotations: DataFrame, path: str) -> None:
    """Reference export_annotation (optimiser.py:311-342): CSV sink."""
    annotations.coalesce(1).write.mode("overwrite").option(
        "header", True).csv(path)


def import_annotations(spark: SparkSession, path: str) -> DataFrame:
    """Reference _import annotations: CSV -> annotation store."""
    return (spark.read.option("header", True).csv(path)
            .select("original_name", "match_name"))


def labeled_scores(
    scored: DataFrame,
    annotations: DataFrame,
    query_name_col: str = "query_name",
    cand_name_col: str = "cand_name",
) -> DataFrame:
    """Join annotations onto scored candidate pairs -> training rows for
    ``fit_optimiser`` (reference _preprocess_fit_annotations,
    optimiser.py:188-230).

    label = 1.0 where the candidate IS the annotated match; every other
    candidate of an annotated query (including all candidates of a ``-1``
    no-match query) gets 0.0; queries without annotations are dropped.
    The annotation table is the small side -- broadcast join, no shuffle
    of the scored pairs."""
    ann = annotations.select(
        F.col("original_name").alias(query_name_col),
        F.col("match_name").alias("__ann_match"))
    return (
        scored.join(F.broadcast(ann), query_name_col)
        .withColumn(
            "label",
            (F.col(cand_name_col) == F.col("__ann_match"))
            .cast("double"))
        .drop("__ann_match")
    )
