"""CIFAR/Pokemon pickle batch-file ingestion (SURVEY.md §2.1 S7/S8,
the file half; the wire half lives in streaming/wire.py).

Reference spec:
- CIFAR (stream.py:40-50): each batch file is a pickle dict with
  ``b'data'`` (N rows × 3072 uint8 pixels) and ``b'labels'`` (N ints),
  loaded with ``encoding='bytes'``.
- Pokemon (stream.py:91-98): pickle dict with ``'img'`` (N nested
  H×W×C pixel matrices) and ``'label'``.

Spark-first shape: ``spark.read.format("binaryFile")`` lists and reads
the batch files as a distributed scan — one task per file, which is the
natural parallelism unit (a CIFAR batch is ~30 MB; 100 TB of batches is
just more files across more tasks, no shuffle anywhere). An Arrow
``mapInPandas`` then decodes each pickle into typed rows; decode cost
is per-file, streamed through Arrow batches, never driver-side.

SECURITY: unpickling executes arbitrary code. Point these readers only
at trusted dataset files — the identical trust assumption the
reference's ``pickle.load`` makes.
"""

from __future__ import annotations

import os
import pickle
from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession

CIFAR_SCHEMA = "path string, image_index int, features array<int>, label int"
POKEMON_SCHEMA = (
    "path string, image_index int, height int, width int, channels int, "
    "pixels array<int>, label int"
)


def _binary_files(spark: SparkSession, directory: str, glob: str) -> DataFrame:
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(directory)
        .select("path", "content")  # prune length/modificationTime at the scan
    )


def read_cifar_batches(
    spark: SparkSession, directory: str, glob: str = "data_batch_*"
) -> DataFrame:
    """CIFAR pickle batches → one row per image: flat ``features``
    (array<int>, len 3072 for real CIFAR) + ``label`` (stream.py:40-50)."""

    def decode(batches: Iterator[Any]) -> Iterator[Any]:
        import pandas as pd

        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                obj = pickle.loads(bytes(content), encoding="bytes")
                data = obj[b"data"]
                labels = obj[b"labels"]
                yield pd.DataFrame(
                    {
                        "path": os.path.basename(path),
                        "image_index": range(len(labels)),
                        "features": [[int(v) for v in row] for row in data],
                        "label": [int(v) for v in labels],
                    }
                )

    return _binary_files(spark, directory, glob).mapInPandas(decode, CIFAR_SCHEMA)


def read_pokemon_batches(
    spark: SparkSession, directory: str, glob: str = "*.pickle"
) -> DataFrame:
    """Pokemon pickle batches → one row per image: the nested H×W×C
    matrix flattened row-major into ``pixels`` with its dims kept as
    typed metadata (stream.py:91-98; flatten per stream.py:109)."""

    def decode(batches: Iterator[Any]) -> Iterator[Any]:
        import pandas as pd

        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                obj = pickle.loads(bytes(content))
                imgs = obj["img"]
                labels = obj["label"]
                rows = []
                for i, (img, label) in enumerate(zip(imgs, labels)):
                    h = len(img)
                    w = len(img[0]) if h else 0
                    c = len(img[0][0]) if w else 0
                    flat = [int(v) for row in img for px in row for v in px]
                    rows.append(
                        (os.path.basename(path), i, h, w, c, flat, int(label))
                    )
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "path",
                        "image_index",
                        "height",
                        "width",
                        "channels",
                        "pixels",
                        "label",
                    ],
                )

    return _binary_files(spark, directory, glob).mapInPandas(decode, POKEMON_SCHEMA)


def write_fake_cifar_batch(
    path: str, n_images: int = 50, n_features: int = 3072, n_labels: int = 10
) -> None:
    """Deterministic CIFAR-shaped pickle fixture (same dict layout and
    byte-keys as the real files): pixel ``(i, j)`` = ``(i*7 + j*13) % 256``."""
    data = [
        [(i * 7 + j * 13) % 256 for j in range(n_features)] for i in range(n_images)
    ]
    labels = [i % n_labels for i in range(n_images)]
    with open(path, "wb") as f:
        pickle.dump({b"data": data, b"labels": labels}, f)


def write_fake_pokemon_batch(
    path: str, n_images: int = 20, h: int = 8, w: int = 8, c: int = 3, n_labels: int = 5
) -> None:
    """Deterministic Pokemon-shaped pickle fixture (nested H×W×C)."""
    imgs = [
        [[[(i + y * w * c + x * c + ch) % 256 for ch in range(c)] for x in range(w)]
         for y in range(h)]
        for i in range(n_images)
    ]
    labels = [i % n_labels for i in range(n_images)]
    with open(path, "wb") as f:
        pickle.dump({"img": imgs, "label": labels}, f)


# bump whenever the fixture formulas/parameters above change — the
# cache below is keyed on existence, so a stale versionless dir would
# silently feed OLD pixels to queries whose oracles use the NEW closed
# form (an unexplainable hash mismatch)
FIXTURE_VERSION = "v1"


def ensure_fixture_dir(kind: str) -> str:
    """Write the deterministic pickle fixtures into a stable temp dir
    (atomic per-file via os.replace, so concurrent driver runs can't
    observe a half-written pickle) and return the directory. The dir
    is keyed by FIXTURE_VERSION and user (no cross-user permission
    collisions on shared hosts)."""
    import getpass
    import tempfile

    base = os.path.join(
        tempfile.gettempdir(),
        f"crime_spark_ml_fixtures-{getpass.getuser()}-{FIXTURE_VERSION}",
        kind,
    )
    os.makedirs(base, exist_ok=True)
    writers = {
        "cifar": (write_fake_cifar_batch, ["data_batch_1", "data_batch_2"]),
        "pokemon": (write_fake_pokemon_batch, ["train_batch_1.pickle"]),
    }
    write, names = writers[kind]
    for name in names:
        final = os.path.join(base, name)
        if not os.path.exists(final):
            tmp = os.path.join(base, f".{name}.{os.getpid()}.tmp")
            write(tmp)
            os.replace(tmp, final)
    return base
