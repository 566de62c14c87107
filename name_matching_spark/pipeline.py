"""End-to-end record-linkage pipeline (run_nm shape, Spark-native).

Mirrors the reference driver (/root/reference/name_matching/run_nm.py:264-380):
light normalization -> exact-match short-circuit (score 100) -> fuzzy
matching of the anti-join remainder (TF-IDF blocking + metric-ensemble
scoring) -> threshold filter; optional group-blocked matching via a block
key present on both sides (one shuffled job keyed by group -- no per-group
refit loop) -> optional transitive clustering of accepted edges.

Plan-shape notes (these matter at scale):
* All string normalization for a side happens in ONE Arrow-batched pandas
  UDF pass (light + full preprocess fused into a struct), so each input row
  crosses the JVM<->Python boundary exactly once before the scoring stage.
* Branch-shared intermediates (prepared sides, idf, candidates) are
  persisted: the exact/fuzzy branches and the idf's three consumers reuse
  one computation instead of re-deriving the lineage.
* Every stage can checkpoint to a StageCheckpoint so a killed run resumes
  from the last complete stage.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .checkpoint import StageCheckpoint
from .functions.extract import extract_name
from .nm_core.metrics import DEFAULT_METRICS
from .nm_core.preprocess import (
    PreprocessConfig,
    light_preprocess_name,
    preprocess_name,
)
from .operators.blocking import cosine_top_n
from .operators.cluster import cluster_matches
from .operators.scoring import best_matches, score_candidates
from .operators.tfidf import (
    GROUP_COL,
    doc_count_table,
    explode_char_ngrams,
    idf_table,
    master_weights,
    query_weights,
    with_group,
)


@dataclass
class MatchConfig:
    top_n: int = 50
    threshold: float = 95.0
    metrics: tuple = DEFAULT_METRICS
    ngram_range: tuple = (2, 3)
    preprocess: PreprocessConfig = PreprocessConfig()
    df_cap_frac: float | None = None  # hot-ngram cap for the blocking join
    number_of_matches: int = 1
    cache_intermediates: bool = True


def _prepare_udf(cfg: PreprocessConfig):
    """One fused pandas UDF: raw name -> (name_light, name_norm)."""

    @F.pandas_udf("name_light string, name_norm string")
    def _prep(names: pd.Series) -> pd.DataFrame:
        light = names.astype("object").map(light_preprocess_name)
        norm = light.map(lambda n: preprocess_name(n, cfg))
        return pd.DataFrame({"name_light": light, "name_norm": norm})

    return _prep


def _prepare(df: DataFrame, id_col: str, name_col: str,
             group_col: str | None, cfg: PreprocessConfig) -> DataFrame:
    """-> (id, __group, name_raw, name_light, name_norm); one UDF pass."""
    out = with_group(
        df.select(F.col(id_col).alias("id"),
                  F.col(name_col).alias("name_raw"),
                  *([F.col(group_col)] if group_col else [])),
        group_col,
    )
    prep = _prepare_udf(cfg)
    out = out.withColumn("__prep", prep(F.col("name_raw")))
    return out.select("id", GROUP_COL, "name_raw",
                      F.col("__prep.name_light").alias("name_light"),
                      F.col("__prep.name_norm").alias("name_norm"))


def match_names(
    spark: SparkSession,
    df_a: DataFrame,
    df_b: DataFrame,
    id_col_a: str,
    name_col_a: str,
    id_col_b: str,
    name_col_b: str,
    group_col_a: str | None = None,
    group_col_b: str | None = None,
    config: MatchConfig = MatchConfig(),
    checkpoint: StageCheckpoint | None = None,
) -> DataFrame:
    """Match every row of df_a against df_b.

    Returns (a_id, b_id, original_name, match_name, score, source) for rows
    with score > threshold; ``source`` is 'exact' or 'fuzzy'.
    """
    cache = ((lambda d: d.persist()) if config.cache_intermediates
             else (lambda d: d))
    a = _prepare(df_a, id_col_a, name_col_a, group_col_a, config.preprocess)
    b = _prepare(df_b, id_col_b, name_col_b, group_col_b, config.preprocess)
    if checkpoint:
        a = checkpoint.get_or_compute("normalized_a", lambda: a)
        b = checkpoint.get_or_compute("normalized_b", lambda: b)
    else:
        a, b = cache(a), cache(b)

    # --- exact-match short-circuit (run_nm.py:106-144) -------------------
    exact = (
        a.select(GROUP_COL, F.col("id").alias("a_id"),
                 F.col("name_light").alias("original_name"), "name_light")
        .join(
            b.select(GROUP_COL, F.col("id").alias("b_id"),
                     F.col("name_light").alias("match_name"), "name_light"),
            [GROUP_COL, "name_light"],
        )
        .select(GROUP_COL, "a_id", "b_id", "original_name", "match_name",
                F.lit(100.0).alias("score"), F.lit("exact").alias("source"))
    )
    remainder = a.join(exact.select("a_id").distinct(),
                       a["id"] == F.col("a_id"), "left_anti")

    # --- fuzzy path on the remainder -------------------------------------
    m_tf = explode_char_ngrams(b, "id", "name_norm", config.ngram_range)
    q_tf = explode_char_ngrams(remainder, "id", "name_norm",
                               config.ngram_range)
    idf = cache(idf_table(m_tf, doc_count_table(b, "id")))
    m_w = master_weights(m_tf, idf)
    q_w = query_weights(q_tf, idf)

    def _candidates():
        return cosine_top_n(q_w, m_w, config.top_n, idf=idf,
                            df_cap_frac=config.df_cap_frac)

    candidates = (checkpoint.get_or_compute("candidates", _candidates)
                  if checkpoint else _candidates())

    pairs = (
        candidates
        .join(a.select(GROUP_COL, F.col("id").alias("qid"),
                       F.col("name_norm").alias("query_name")),
              [GROUP_COL, "qid"])
        .join(b.select(GROUP_COL, F.col("id").alias("mid"),
                       F.col("name_norm").alias("cand_name")),
              [GROUP_COL, "mid"])
    )

    def _scored():
        return score_candidates(pairs, metrics=config.metrics)

    scored = (checkpoint.get_or_compute("scored", _scored)
              if checkpoint else _scored())

    fuzzy = (
        best_matches(scored, config.number_of_matches)
        .select(GROUP_COL, F.col("qid").alias("a_id"),
                F.col("mid").alias("b_id"),
                F.col("query_name").alias("original_name"),
                F.col("cand_name").alias("match_name"),
                "score", F.lit("fuzzy").alias("source"))
    )

    matches = exact.unionByName(fuzzy).filter(
        F.col("score") > config.threshold)
    if checkpoint:
        matches = checkpoint.get_or_compute("matches", lambda: matches)
    return matches.drop(GROUP_COL)


def extract_pages_names(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, text, lang, ...) -> (url, name).

    Only url/html/text are read -- column pruning keeps the scan narrow
    (the html column is needed by the extractor itself; drop this column
    upstream if names were already extracted)."""
    return pages.select(
        "url", extract_name(F.col("html"), F.col("text")).alias("name"))


def match_pages(
    spark: SparkSession,
    pages_a: DataFrame,
    pages_b: DataFrame,
    config: MatchConfig = MatchConfig(),
    checkpoint: StageCheckpoint | None = None,
    cluster: bool = False,
) -> DataFrame:
    """BASELINE input_hint flow: extract entity names from two web-page
    tables, link them, optionally cluster accepted edges transitively."""
    a = extract_pages_names(pages_a)
    b = extract_pages_names(pages_b)
    matches = match_names(
        spark, a, b, "url", "name", "url", "name",
        config=config, checkpoint=checkpoint)
    if not cluster:
        return matches
    return cluster_matches(matches, "a_id", "b_id")
