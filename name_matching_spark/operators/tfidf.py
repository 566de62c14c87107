"""Long-form TF-IDF over character n-grams (the Spark-native sparse matrix).

The reference materializes a scipy CSC matrix (name_matcher.py:1031-1042);
the idiomatic Spark equivalent is a long-form DataFrame
``(group, id, ngram, weight)`` -- simultaneously the forward matrix and the
inverted index used by the similarity join.

Arithmetic matches sklearn's TfidfVectorizer(smooth_idf=True, norm='l2',
analyzer='char') exactly (NOT Spark ML's IDF, which uses ln(n+1/df+1)):
  idf = ln((1 + n_docs) / (1 + df)) + 1
  master weight = tfidf / row_sum(tfidf)      (l2 followed by row-sum
      renormalization algebraically reduces to plain row-sum division)
  query  weight = tfidf / l2_norm(tfidf), vocabulary/idf from master side

All ngram generation happens JVM-side (sequence/transform/substring inside
whole-stage codegen) -- no Python in the hot path.  Every aggregation is
keyed by (group, ...) so group-blocked matching (run_nm.py:196-261) is one
shuffled job instead of a per-group refit loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

GROUP_COL = "__group"
DUMMY_GROUP = ""


def with_group(df: DataFrame, group_col: str | None) -> DataFrame:
    """Normalize the optional blocking-group column to GROUP_COL."""
    if group_col:
        return df.withColumn(GROUP_COL, F.col(group_col).cast("string"))
    return df.withColumn(GROUP_COL, F.lit(DUMMY_GROUP))


def explode_char_ngrams(
    df: DataFrame,
    id_col: str,
    name_col: str,
    ngram_range: tuple[int, int] = (2, 3),
) -> DataFrame:
    """-> (group, id, ngram, tf): sklearn 'char' analyzer semantics
    (contiguous, unpadded n-grams of the whole string, all n in range)."""
    lo, hi = ngram_range
    arrays = [
        F.expr(
            f"CASE WHEN length({name_col}) >= {n} THEN "
            f"transform(sequence(1, length({name_col}) - {n} + 1), "
            f"i -> substring({name_col}, i, {n})) "
            f"ELSE array() END"
        )
        for n in range(lo, hi + 1)
    ]
    grams = arrays[0]
    for a in arrays[1:]:
        grams = F.concat(grams, a)
    return (
        df.select(GROUP_COL, F.col(id_col).alias("id"),
                  F.explode(grams).alias("ngram"))
        .groupBy(GROUP_COL, "id", "ngram")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )


def idf_table(tf: DataFrame, doc_counts: DataFrame,
              checkpoint: bool = True) -> DataFrame:
    """-> (group, ngram, idf).  doc_counts: (group, n_docs).

    The per-group ngram vocabulary is small (bounded by ~alphabet^3), so the
    resulting idf table is broadcast into the weight join.

    The result is LAZILY localCheckpoint'd by default: idf feeds several
    independent broadcast subtrees (query/master weight joins, the
    blocker's df-cap and prefix-rank lookups), and AQE's exchange reuse
    does NOT dedupe a shuffle shared between the main plan and broadcast-
    exchange subplans -- without the checkpoint every broadcast re-runs
    the scan -> ngram explode -> df aggregation lineage (4+ duplicated
    map stages in the 20k-doc bench profile).  First materialization
    computes it once; every other consumer reads the stored blocks, and
    the ContextCleaner frees them when the plan dies.  The table is
    vocabulary-sized, so storage is trivial and the lost lineage
    fault-tolerance immaterial.  Callers that persist the result
    themselves (fit_master, whose release contract unpersists every fit
    table at query stop) pass ``checkpoint=False`` -- a persisted table
    already serves every consumer from cache, and its storage must not
    outlive the explicit unpersist."""
    df_tbl = tf.groupBy(GROUP_COL, "ngram").agg(
        F.count(F.lit(1)).cast("double").alias("df"))
    out = (
        df_tbl.join(doc_counts, GROUP_COL)
        .withColumn(
            "idf",
            F.log((F.lit(1.0) + F.col("n_docs")) / (F.lit(1.0) + F.col("df")))
            + F.lit(1.0),
        )
        .select(GROUP_COL, "ngram", "idf", "df", "n_docs")
    )
    return out.localCheckpoint(eager=False) if checkpoint else out


def doc_count_table(df: DataFrame, id_col: str) -> DataFrame:
    return df.groupBy(GROUP_COL).agg(
        F.count(F.col(id_col)).cast("double").alias("n_docs"))


def master_weights(tf: DataFrame, idf: DataFrame) -> DataFrame:
    """-> (group, id, ngram, weight) with weight = tfidf / row_sum(tfidf)."""
    w = tf.join(F.broadcast(idf.select(GROUP_COL, "ngram", "idf")),
                [GROUP_COL, "ngram"])
    w = w.withColumn("tfidf", F.col("tf") * F.col("idf"))
    row_sum = Window.partitionBy(GROUP_COL, "id")
    return (
        w.withColumn("weight", F.col("tfidf") / F.sum("tfidf").over(row_sum))
        .select(GROUP_COL, "id", "ngram", "weight")
    )


def query_weights(tf: DataFrame, idf: DataFrame) -> DataFrame:
    """-> (group, id, ngram, weight), l2-normalized, master vocabulary only
    (out-of-vocabulary n-grams drop out via the inner join)."""
    w = tf.join(F.broadcast(idf.select(GROUP_COL, "ngram", "idf")),
                [GROUP_COL, "ngram"])
    w = w.withColumn("tfidf", F.col("tf") * F.col("idf"))
    row = Window.partitionBy(GROUP_COL, "id")
    return (
        w.withColumn(
            "weight",
            F.col("tfidf") / F.sqrt(F.sum(F.col("tfidf") ** 2).over(row)))
        .select(GROUP_COL, "id", "ngram", "weight")
    )
