"""Text-classification pipeline (SURVEY.md §7 step 6: the reference
streams `sentiment` / `spam` CSV datasets at stream.py:248 for exactly
this): Tokenizer → StopWordsRemover → HashingTF → IDF → logistic
regression, as one pyspark.ml Pipeline.

HashingTF (feature hashing) rather than CountVectorizer is the scale
choice: no vocabulary broadcast, fixed-width sparse vectors, one pass.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import (
    HashingTF,
    IDF,
    RegexTokenizer,
    StopWordsRemover,
    StringIndexer,
)
from pyspark.sql import DataFrame


def build_text_classifier(
    text_col: str = "text",
    label_col: str = "lang",
    num_features: int = 1 << 15,
    max_iter: int = 20,
) -> Pipeline:
    return Pipeline(
        stages=[
            RegexTokenizer(inputCol=text_col, outputCol="__tokens", pattern="\\s+"),
            StopWordsRemover(inputCol="__tokens", outputCol="__filtered"),
            HashingTF(inputCol="__filtered", outputCol="__tf", numFeatures=num_features),
            IDF(inputCol="__tf", outputCol="__tfidf"),
            StringIndexer(
                inputCol=label_col,
                outputCol="label",
                stringOrderType="alphabetAsc",
                handleInvalid="keep",  # a label seen only in the eval split must not throw
            ),
            LogisticRegression(featuresCol="__tfidf", labelCol="label", maxIter=max_iter),
        ]
    )


def train_text_classifier(
    df: DataFrame, seed: int = 0, **kwargs
) -> tuple[PipelineModel, float]:
    from pyspark.ml.evaluation import MulticlassClassificationEvaluator

    train, test = df.randomSplit([0.7, 0.3], seed=seed)
    train = train.cache()
    model = build_text_classifier(**kwargs).fit(train)
    train.unpersist()
    acc = MulticlassClassificationEvaluator(
        labelCol="label", predictionCol="prediction", metricName="accuracy"
    ).evaluate(model.transform(test))
    return model, acc
