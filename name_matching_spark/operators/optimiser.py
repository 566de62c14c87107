"""Supervised match rescoring (reference NameMatchingOptimiser, E3).

The reference fits a StandardScaler + GradientBoostingClassifier over the
per-metric score vectors of annotated candidate pairs
(/root/reference/name_matching/name_matching_optimiser.py:188-261,429-621).
Spark-native equivalent: the feature vector is exactly the ``scores`` array
produced by operators.scoring.score_candidates, converted JVM-side with
array_to_vector and fed to pyspark.ml StandardScaler + GBTClassifier.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import GBTClassifier
from pyspark.ml.feature import StandardScaler
from pyspark.ml.functions import array_to_vector, vector_to_array
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def random_uneven_split(df: DataFrame, weights: list[float],
                        seed: int = 42) -> list[DataFrame]:
    """Reference split_list_random_uneven (optimiser.py:162-186):
    shuffled uneven k-fold split."""
    return df.randomSplit(list(weights), seed=seed)


def fit_optimiser(labeled_scores: DataFrame,
                  scores_col: str = "scores",
                  label_col: str = "label",
                  max_iter: int = 30,
                  seed: int = 42) -> PipelineModel:
    """Fit scaler + GBT on (scores array<double>, label) rows."""
    feats = labeled_scores.withColumn(
        "__features", array_to_vector(F.col(scores_col)))
    pipeline = Pipeline(stages=[
        StandardScaler(inputCol="__features", outputCol="__scaled",
                       withMean=True, withStd=True),
        GBTClassifier(featuresCol="__scaled", labelCol=label_col,
                      maxIter=max_iter, seed=seed),
    ])
    return pipeline.fit(feats)


def predict_matches(model: PipelineModel, scored: DataFrame,
                    scores_col: str = "scores",
                    threshold: float = 0.5) -> DataFrame:
    """Score candidate pairs with the model; keep the argmax candidate per
    query when its match probability clears the threshold (reference
    predict, optimiser.py:591-621)."""
    feats = scored.withColumn("__features",
                              array_to_vector(F.col(scores_col)))
    pred = model.transform(feats).withColumn(
        "match_prob", vector_to_array("probability")[1])
    w = Window.partitionBy("qid").orderBy(F.col("match_prob").desc(),
                                          F.col("mid").asc())
    return (
        pred.withColumn("__rk", F.row_number().over(w))
        .filter((F.col("__rk") == 1) & (F.col("match_prob") > threshold))
        .drop("__rk", "__features", "__scaled", "rawPrediction",
              "probability", "prediction")
    )


def cross_validate(labeled_scores: DataFrame, folds: int = 3,
                   seed: int = 42, **fit_kwargs) -> list[float]:
    """K-fold accuracy of the optimiser (reference cross_validate_model)."""
    splits = labeled_scores.randomSplit([1.0] * folds, seed=seed)
    accs = []
    for i in range(folds):
        test = splits[i]
        train = None
        for j, s in enumerate(splits):
            if j != i:
                train = s if train is None else train.unionByName(s)
        model = fit_optimiser(train, seed=seed, **fit_kwargs)
        feats = test.withColumn("__features", array_to_vector("scores"))
        pred = model.transform(feats)
        acc = pred.agg(F.avg(
            (F.col("prediction") == F.col("label")).cast("double"))
        ).first()[0]
        accs.append(acc)
    return accs
