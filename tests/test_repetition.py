"""Repetition / boilerplate signals: planted pathologies + edge cases."""

from __future__ import annotations

from crime_spark_ml_spark.functions.text import (
    adj_repeat_frac,
    dup_2gram_frac,
    dup_word_frac,
)
from pyspark.sql import functions as F


def _signals(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(
        dup_word_frac("text").alias("dw"),
        adj_repeat_frac("text").alias("ar"),
        dup_2gram_frac("text").alias("d2"),
    ).collect()[0]


def test_pure_stutter_maxes_every_signal(spark):
    r = _signals(spark, "spam spam spam spam spam")
    assert r["dw"] == 0.8  # 1 distinct of 5
    assert r["ar"] == 1.0  # every adjacent pair identical
    assert r["d2"] == 0.75  # 4 grams, 1 distinct


def test_all_unique_words_zero_everywhere(spark):
    r = _signals(spark, "alpha beta gamma delta epsilon")
    assert (r["dw"], r["ar"], r["d2"]) == (0.0, 0.0, 0.0)


def test_repeated_boilerplate_block_hits_2gram_not_adjacency(spark):
    # "click here to subscribe" ×3: no word stutters, but 2-grams repeat
    r = _signals(spark, "click here to subscribe click here to subscribe click here to subscribe")
    assert r["ar"] == 0.0
    assert r["d2"] > 0.6
    assert 0.0 < r["dw"] < 1.0


def test_single_token_doc_is_safe_and_zero(spark):
    r = _signals(spark, "lonely")
    assert (r["dw"], r["ar"], r["d2"]) == (0.0, 0.0, 0.0)


def test_case_folding_counts_Spam_as_spam(spark):
    r = _signals(spark, "Spam spam SPAM")
    assert r["dw"] > 0.6 and r["ar"] == 1.0
