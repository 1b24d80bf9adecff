"""Pickle batch-file ingestion (S7/S8 file half): binaryFile scan +
mapInPandas decode roundtrips against the deterministic fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from crime_spark_ml_spark.sources.imagebatch import (
    read_cifar_batches,
    read_pokemon_batches,
    write_fake_cifar_batch,
    write_fake_pokemon_batch,
)


def test_cifar_pickle_roundtrip(spark, tmp_path):
    """3072-feature rows with label alignment, exactly as the reference
    unpacks them (stream.py:40-50)."""
    write_fake_cifar_batch(str(tmp_path / "data_batch_1"), n_images=20)
    write_fake_cifar_batch(str(tmp_path / "data_batch_2"), n_images=20)
    (tmp_path / "ignored.txt").write_text("not a batch")  # glob excludes

    df = read_cifar_batches(spark, str(tmp_path)).cache()
    assert df.count() == 40
    assert df.where(F.size("features") != 3072).count() == 0
    # label alignment: image i carries label i % 10 in both files
    assert df.where(F.col("label") != F.col("image_index") % 10).count() == 0
    # exact pixel values for one row: feature j of image 3 = (21 + 13j) % 256
    row = df.where(
        (F.col("path") == "data_batch_1") & (F.col("image_index") == 3)
    ).head()
    assert row.features[:5] == [(3 * 7 + j * 13) % 256 for j in range(5)]
    assert row.features[3071] == (3 * 7 + 3071 * 13) % 256
    df.unpersist()


def test_pokemon_pickle_roundtrip(spark, tmp_path):
    """Nested H×W×C matrices flatten row-major with dims preserved
    (stream.py:91-98, flatten per stream.py:109)."""
    write_fake_pokemon_batch(str(tmp_path / "train_batch_1.pickle"), n_images=10)

    df = read_pokemon_batches(spark, str(tmp_path)).cache()
    assert df.count() == 10
    dims = df.select("height", "width", "channels").distinct().collect()
    assert [(r.height, r.width, r.channels) for r in dims] == [(8, 8, 3)]
    assert df.where(F.size("pixels") != 8 * 8 * 3).count() == 0
    assert df.where(F.col("label") != F.col("image_index") % 5).count() == 0
    # row-major flatten: pixel k of image i = (i + k) % 256
    row = df.where(F.col("image_index") == 7).head()
    assert row.pixels[:4] == [(7 + k) % 256 for k in range(4)]
    assert row.pixels[191] == (7 + 191) % 256
    df.unpersist()


def test_binaryfile_scan_is_distributed(spark, tmp_path):
    """Each batch file decodes independently — with file bin-packing
    disabled (tiny maxPartitionBytes/openCost), the scan must yield one
    partition per file; tiny files may legitimately pack together under
    production defaults."""
    for i in range(4):
        write_fake_cifar_batch(str(tmp_path / f"data_batch_{i}"), n_images=5)
    saved = {
        k: spark.conf.get(k)
        for k in ("spark.sql.files.maxPartitionBytes", "spark.sql.files.openCostInBytes")
    }
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
        spark.conf.set("spark.sql.files.openCostInBytes", "1024")
        df = read_cifar_batches(spark, str(tmp_path))
        assert df.rdd.getNumPartitions() >= 4
        assert df.select("path").distinct().count() == 4
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_corrupt_pickle_fails_loudly(spark, tmp_path):
    """A corrupt batch file must raise on decode, not silently yield
    zero rows — silent data loss is the worst ingest failure mode."""
    import pickle

    import pytest
    from pyspark.errors.exceptions.captured import PythonException

    write_fake_cifar_batch(str(tmp_path / "data_batch_1"), n_images=5)
    (tmp_path / "data_batch_2").write_bytes(b"not a pickle at all")
    df = read_cifar_batches(spark, str(tmp_path))
    with pytest.raises(PythonException) as exc:
        df.count()
    assert "UnpicklingError" in str(exc.value) or "pickle" in str(exc.value).lower()

    # a well-formed pickle with the WRONG layout also fails loudly
    with open(tmp_path / "data_batch_2", "wb") as f:
        pickle.dump({"wrong": "layout"}, f)
    with pytest.raises(PythonException):
        read_cifar_batches(spark, str(tmp_path)).count()


def test_python_datasource_matches_mapinpandas_reader(spark):
    """Two independent implementations of the CIFAR pickle format —
    the binaryFile+mapInPandas reader and the Spark 4 Python
    DataSource — must produce identical rows."""
    from crime_spark_ml_spark.sources.imagebatch import (
        ensure_fixture_dir,
        read_cifar_batches,
    )
    from crime_spark_ml_spark.sources.pydatasource import register_cifarbatch

    fixture = ensure_fixture_dir("cifar")
    register_cifarbatch(spark)
    via_ds = spark.read.format("cifarbatch").option("path", fixture).load()
    via_mip = read_cifar_batches(spark, fixture)
    key = lambda t: (t[0], t[1])
    assert sorted(map(tuple, via_ds.collect()), key=key) == sorted(
        map(tuple, via_mip.collect()), key=key
    )


def test_python_datasource_pushes_path_filters(spark):
    """EqualTo/In/StartsWith on path prune partitions driver-side;
    other filters are reported unsupported and still applied by Spark
    (correctness never depends on the pushdown)."""
    from pyspark.sql.datasource import EqualTo, GreaterThan, StringStartsWith

    from crime_spark_ml_spark.sources.imagebatch import ensure_fixture_dir
    from crime_spark_ml_spark.sources.pydatasource import (
        CifarBatchReader,
        register_cifarbatch,
    )

    fixture = ensure_fixture_dir("cifar")
    reader = CifarBatchReader({"path": fixture})
    n_all = len(reader.partitions())
    assert n_all >= 2
    first = reader.partitions()[0].path.split("/")[-1]
    unsupported = list(
        reader.pushFilters([EqualTo(("path",), first), GreaterThan(("label",), 0)])
    )
    assert [type(f) for f in unsupported] == [GreaterThan]
    assert len(reader.partitions()) == 1

    r2 = CifarBatchReader({"path": fixture})
    assert list(r2.pushFilters([StringStartsWith(("path",), "data_batch")])) == []
    assert len(r2.partitions()) == n_all

    # end-to-end: the pushed filter's answer matches a post-scan filter
    register_cifarbatch(spark)
    pushed = (
        spark.read.format("cifarbatch").option("path", fixture).load()
        .where(F.col("path") == first)
    )
    assert pushed.count() > 0
    assert {r.path for r in pushed.select("path").distinct().collect()} == {first}
