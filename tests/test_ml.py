"""ML semantic tests (SURVEY.md §5.2: distributional, not bitwise) on
the synthetic crime fixture + encoder-fidelity checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crime_spark_ml_spark.ml.pipeline import (
    build_crime_pipeline,
    prepare_crime,
    train_crime_model,
)
from crime_spark_ml_spark.operators.encode import label_encode
from crime_spark_ml_spark.operators.scale import zscore
from crime_spark_ml_spark.sources.crimegen import CATEGORIES, crime_table, crime_test_table


@pytest.fixture(scope="module")
def crime_df(spark):
    return crime_table(spark, n_rows=3000).cache()


def test_crime_fixture_shape(crime_df):
    assert crime_df.count() == 3000
    cats = crime_df.select("Category").distinct().count()
    assert cats == 39  # 39 real categories; num_class=40 was the reference's over-alloc
    assert crime_df.select("PdDistrict").distinct().count() == 10
    years = [r[0] for r in crime_df.select(F.substring("Dates", 1, 4)).distinct().collect()]
    assert len(set(years)) >= 3
    # some NULLs present for impute coverage
    assert crime_df.where(F.col("Descript").isNull()).count() > 0
    # skewed district distribution (order-by-count tests need a clear winner)
    counts = [r.n for r in crime_df.groupBy("PdDistrict").agg(F.count("*").alias("n")).collect()]
    assert max(counts) > 2 * min(counts)


def test_prepare_splits_and_imputes(crime_df):
    prepared = prepare_crime(crime_df)
    assert "time" in prepared.columns and "Year" in prepared.columns
    assert "Dates" not in prepared.columns and "Descript" not in prepared.columns
    assert prepared.where(F.col("time").rlike("^[0-9]{2}:[0-9]{2}:[0-9]{2}$")).count() == 3000
    years = [r.Year for r in prepared.select("Year").distinct().collect()]
    assert all(2013 <= y <= 2016 for y in years)


def test_label_encode_bijection_and_order(crime_df):
    enc = label_encode(crime_df, ["PdDistrict"])
    pairs = (
        enc.select("PdDistrict", "PdDistrict_code").distinct().orderBy("PdDistrict_code")
    ).collect()
    # bijection: one code per value, codes 0..n-1 in lexicographic order
    values = [r.PdDistrict for r in pairs]
    codes = [r.PdDistrict_code for r in pairs]
    assert codes == list(range(len(values)))
    assert values == sorted(values)


def test_indexer_matches_sklearn_order(spark, crime_df):
    """StringIndexer(alphabetAsc) must agree with the dictionary-join
    encoder (both implement sklearn LabelEncoder semantics)."""
    from pyspark.ml.feature import StringIndexer

    idx = StringIndexer(
        inputCol="PdDistrict", outputCol="ml_code", stringOrderType="alphabetAsc"
    ).fit(crime_df)
    ours = label_encode(crime_df, ["PdDistrict"])
    both = idx.transform(ours).select("PdDistrict_code", F.col("ml_code").cast("int"))
    assert both.where(F.col("PdDistrict_code") != F.col("ml_code")).count() == 0


def test_zscore_mean_zero_std_one(crime_df):
    prepared = prepare_crime(crime_df)
    z = zscore(prepared, ["Longitude", "Latitude"])
    stats = z.agg(
        F.avg("Longitude_z"), F.stddev_samp("Longitude_z"),
        F.avg("Latitude_z"), F.stddev_samp("Latitude_z"),
    ).collect()[0]
    assert abs(stats[0]) < 1e-9 and abs(stats[1] - 1.0) < 1e-9
    assert abs(stats[2]) < 1e-9 and abs(stats[3] - 1.0) < 1e-9


def test_split_ratio(crime_df):
    prepared = prepare_crime(crime_df)
    train, test = prepared.randomSplit([0.7, 0.3], seed=0)
    frac = train.count() / 3000
    assert 0.66 <= frac <= 0.74  # 70/30 ±2-4% (SURVEY.md §5.2)


def test_crime_pipeline_end_to_end(spark, crime_df):
    result = train_crime_model(crime_df, num_trees=20, max_depth=8)
    # predictions are valid category strings
    pred_cats = {r.Category for r in result.predictions.select("Category").distinct().collect()}
    assert pred_cats <= set(CATEGORIES)
    # beats the majority-class baseline (fixture embeds a learnable signal)
    prepared = prepare_crime(crime_df)
    majority = (
        prepared.groupBy("Category").count().agg(F.max("count")).collect()[0][0] / 3000
    )
    assert result.accuracy > majority, (result.accuracy, majority)
    # KMeans stage produced k=10 clusters on the training data
    clustered = result.model.transform(prepare_crime(crime_df))
    assert clustered.select("Cluster").distinct().count() <= 10
    assert clustered.select("prediction").distinct().count() > 1


def test_model_transforms_unseen_test_table(spark, crime_df):
    """Fit on train, transform the test-shaped table (no Category) —
    the reference's re-fit-on-test leakage bug is NOT replicated."""
    model = build_crime_pipeline(num_trees=10, max_depth=5).fit(prepare_crime(crime_df))
    test_raw = crime_test_table(spark, n_rows=500)
    prepared = prepare_crime(test_raw.withColumn("Category", F.lit(CATEGORIES[0])))
    scored = model.transform(prepared)
    assert scored.count() == 500
    assert scored.select("prediction").where(F.col("prediction") < 0).count() == 0


def test_kmeans_deterministic_under_seed(spark, crime_df):
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import VectorAssembler

    prepared = prepare_crime(crime_df)
    geo = VectorAssembler(inputCols=["Longitude", "Latitude"], outputCol="geo").transform(
        prepared
    ).cache()
    a = KMeans(k=10, seed=0, featuresCol="geo").fit(geo).summary.trainingCost
    b = KMeans(k=10, seed=0, featuresCol="geo").fit(geo).summary.trainingCost
    assert a == pytest.approx(b)


def test_gbt_multiclass_ovr(spark):
    """OneVsRest(GBT) — the reference's LightGBM-multiclass analog
    (crime.py:171-198): genuinely multiclass output + seed determinism
    on a small 3-class subset (full 10-class run covered by the
    registered ml_gbt_multiclass query)."""
    from pyspark.ml.classification import GBTClassifier, OneVsRest
    from pyspark.ml.functions import array_to_vector

    from crime_spark_ml_spark.sources.catalog import load_table

    emb = (
        load_table(spark, "/root/testdata/sf0.001", "embeddings")
        .where(F.col("label") < 3)
        .withColumn("features", array_to_vector("embedding"))
        .withColumn("label", F.col("label").cast("double"))
        .cache()
    )

    def fit_predict():
        gbt = GBTClassifier(maxIter=3, maxDepth=2, seed=0, labelCol="label")
        model = OneVsRest(classifier=gbt, labelCol="label", parallelism=3).fit(emb)
        assert len(model.models) == 3  # one binary GBT per class
        return sorted(
            (r.vec_id, r.prediction)
            for r in model.transform(emb).select("vec_id", "prediction").collect()
        )

    a = fit_predict()
    b = fit_predict()
    assert a == b  # same seed -> identical per-row argmax
    assert len({p for _, p in a}) >= 2  # not collapsed to one class
    emb.unpersist()


def test_als_implicit_model_shape(spark, sf_dir):
    """Distributional pins for ml_als_implicit (exact factor values are
    partitioning-dependent): factor matrices have the requested rank,
    every purchasing user is factorized, and each user's recs arrive
    score-descending."""
    from pyspark.ml.recommendation import ALS
    from pyspark.sql import functions as F

    from crime_spark_ml_spark.sources.catalog import load_table

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ratings = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("o_custkey").cast("int").alias("user_id"),
            F.col("l_partkey").cast("int").alias("item_id"),
        )
        .agg(F.sum("l_quantity").cast("float").alias("strength"))
        .cache()
    )
    n_users = ratings.select("user_id").distinct().count()
    model = ALS(
        rank=8,
        maxIter=5,
        seed=0,
        implicitPrefs=True,
        userCol="user_id",
        itemCol="item_id",
        ratingCol="strength",
        coldStartStrategy="drop",
    ).fit(ratings)
    assert model.rank == 8
    assert model.userFactors.count() == n_users
    assert len(model.userFactors.first()["features"]) == 8
    recs = model.recommendForAllUsers(3).select(
        "user_id", F.col("recommendations.rating").alias("scores")
    )
    bad = recs.where(
        (F.element_at("scores", 1) < F.element_at("scores", 2))
        | (F.element_at("scores", 2) < F.element_at("scores", 3))
    ).count()
    assert bad == 0
    ratings.unpersist()
