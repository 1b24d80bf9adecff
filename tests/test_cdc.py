"""Content-defined chunking (operators/chunk.py::cdc_chunks).

Two load-bearing properties: chunks reassemble to the exact original
text (losslessness), and an edit near the start of a document only
perturbs the chunks it touches — later boundaries re-synchronize
because they depend on local content, not absolute offsets. The
second property is WHY CDC beats fixed-size chunking for dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crime_spark_ml_spark.operators.chunk import cdc_chunks
from crime_spark_ml_spark.sources.catalog import load_table


def _reassemble(chunks_df):
    return {
        r.doc_id: r.full
        for r in chunks_df.groupBy("doc_id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk_text"))),
                    lambda s: s.chunk_text,
                ),
            ).alias("full")
        )
        .collect()
    }


def test_cdc_chunks_reassemble_to_original(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    original = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    assert _reassemble(cdc_chunks(docs)) == original


def test_cdc_short_and_empty_texts(spark):
    df = spark.createDataFrame(
        [(1, "short"), (2, "")], "doc_id bigint, text string"
    )
    rows = cdc_chunks(df).collect()
    assert {(r.doc_id, r.chunk_idx, r.chunk_text) for r in rows} == {
        (1, 1, "short"),
        (2, 1, ""),
    }


def test_cdc_boundaries_resynchronize_after_edit(spark):
    base = (
        "spark catalyst tungsten shuffle broadcast partition executor "
        "driver lineage checkpoint watermark session window aggregate "
        "join scan filter project exchange codegen arrow pandas batch "
        "stream source sink parquet bucket salt skew adaptive plan"
    )
    edited = "XYZQ " + base  # insertion at the very start
    df = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id bigint, text string"
    )
    chunks = cdc_chunks(df).collect()
    a = [r.chunk_text for r in sorted(chunks, key=lambda r: (r.doc_id, r.chunk_idx)) if r.doc_id == 1]
    b = [r.chunk_text for r in sorted(chunks, key=lambda r: (r.doc_id, r.chunk_idx)) if r.doc_id == 2]
    shared = set(a) & set(b)
    # all but the first chunk of each doc must be byte-identical —
    # fixed-size chunking would share nothing after a 5-char insert
    assert len(shared) >= len(a) - 1
    assert a[1:] == b[1:]


def test_cdc_chunk_lengths_follow_mask(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & (F.length("text") > 200)
    )
    stats = (
        cdc_chunks(docs)
        .agg(F.avg(F.length("chunk_text")).alias("avg_len"))
        .collect()[0]
    )
    # mask '07' = 8/256 boundary rate -> ~32-char expected chunks;
    # generous band, the point is "not 5 and not 500"
    assert 10 < stats.avg_len < 120


def test_cdc_null_text_raises(spark):
    df = spark.createDataFrame([(1, None)], "doc_id bigint, text string")
    with pytest.raises(Exception, match="NULL"):
        cdc_chunks(df).collect()


def test_cdc_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="window"):
        cdc_chunks(df, window=1)
    with pytest.raises(ValueError, match="mask"):
        cdc_chunks(df, mask="GG")
