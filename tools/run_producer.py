#!/usr/bin/env python
"""Producer CLI — the reference's ``stream.py`` entrypoint surface
(stream.py:14-22 argparse, stream.py:233-257 ``-f`` dataset routing +
``-e`` endless loop), rebuilt on the reusable frame encoders in
``crime_spark_ml_spark.streaming.producer``.

Routing (reference stream.py:243-252):

- ``-f cifar``    → pickle batches ``data_batch_*`` under
  ``<data-dir>/cifar/`` (stream.py:40-50): pixels erased to
  ``feature{i}``, ``label`` kept.
- ``-f pokemon``  → pickle batches ``train_batch_*.pickle`` under
  ``<data-dir>/pokemon/`` (stream.py:91-98): nested ``img`` matrix +
  ``label``, names kept.
- ``-f crime|sentiment|spam`` → ``<data-dir>/<name>/train.csv``
  (stream.py:139-149 + streamCSVFile): header dropped, EVERY column
  erased to ``feature{i}``.
- ``-f <path>``   → newline-delimited file, JSON-array-of-lines frames
  (stream.py:209-222 streamFile).

``-e`` loops the chosen dataset's frames forever inside one connection
(stream.py:255-257) — Ctrl-C to stop. The producer is the *server*
side (binds, listens, accepts one consumer), exactly like the
reference's connectTCP (stream.py:28-36).
"""

from __future__ import annotations

import argparse
import csv
import glob as globmod
import os
import pickle
import sys
from collections.abc import Iterator

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crime_spark_ml_spark.streaming.producer import (  # noqa: E402
    serve_frames,
    tabular_frames,
    text_frames,
)

CSV_DATASETS = ("crime", "sentiment", "spam")


def _pickle_paths(data_dir: str, name: str) -> list[str]:
    pattern = {
        "cifar": os.path.join(data_dir, "cifar", "data_batch_*"),
        "pokemon": os.path.join(data_dir, "pokemon", "train_batch_*"),
    }[name]
    paths = sorted(globmod.glob(pattern))
    if not paths:
        raise FileNotFoundError(f"no {name} batch files match {pattern}")
    return paths


def cifar_rows(data_dir: str) -> Iterator[dict]:
    """One mapping per image: ordered pixel columns then ``label`` —
    tabular_frames erases the pixel keys to feature{i} and keeps label,
    reproducing stream.py:56-62's payload exactly."""
    for path in _pickle_paths(data_dir, "cifar"):
        with open(path, "rb") as f:
            obj = pickle.load(f, encoding="bytes")  # trusted files only
        for pixels, label in zip(obj[b"data"], obj[b"labels"]):
            row = {f"c{j}": int(v) for j, v in enumerate(pixels)}
            row["label"] = int(label)
            yield row


def pokemon_rows(data_dir: str) -> Iterator[dict]:
    for path in _pickle_paths(data_dir, "pokemon"):
        with open(path, "rb") as f:
            obj = pickle.load(f)  # trusted files only
        for img, label in zip(obj["img"], obj["label"]):
            yield {"img": img, "label": int(label)}


def _coerce(cell: str):
    """pd.read_csv-style scalar inference (stream.py:183) so the JSON
    payload carries numbers as numbers, not strings."""
    for cast in (int, float):
        try:
            return cast(cell)
        except ValueError:
            continue
    return cell


def csv_rows(data_dir: str, name: str) -> Iterator[dict]:
    path = os.path.join(data_dir, name, "train.csv")
    with open(path, newline="") as f:
        reader = csv.reader(f)
        header = next(reader, None)
        if header is None:
            raise ValueError(f"{path} is empty")
        for row in reader:
            yield {h: _coerce(c) for h, c in zip(header, row)}


def make_frames(dataset: str, data_dir: str, batch_size: int) -> Iterator[str]:
    """Fresh frame iterator for one full pass over the dataset."""
    if dataset == "cifar":
        return tabular_frames(cifar_rows(data_dir), batch_size, keep_keys=("label",))
    if dataset == "pokemon":
        return tabular_frames(
            pokemon_rows(data_dir), batch_size, keep_keys=("img", "label")
        )
    if dataset in CSV_DATASETS:
        return tabular_frames(csv_rows(data_dir, dataset), batch_size, keep_keys=())
    # fallthrough: a newline-delimited file path (streamFile)
    with open(dataset) as f:
        lines = [line.rstrip("\n") for line in f]
    return text_frames(lines, batch_size)


def endless(dataset: str, data_dir: str, batch_size: int) -> Iterator[str]:
    """Re-derive the frame iterator each pass (stream.py:255-257's
    ``while True`` around the stream function) — state never
    accumulates, so the loop runs for as long as the consumer stays
    connected."""
    while True:
        yield from make_frames(dataset, data_dir, batch_size)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        description="Streams a dataset to a Spark socket consumer"
    )
    p.add_argument("--file", "-f", default="cifar", help="dataset name or file path")
    p.add_argument("--batch-size", "-b", type=int, default=100)
    p.add_argument(
        "--endless", "-e", action="store_true", help="loop the dataset forever"
    )
    p.add_argument("--data-dir", default=".", help="root holding cifar/ pokemon/ etc.")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=6100, help="0 = OS-assigned")
    p.add_argument(
        "--sleep", type=float, default=5.0, help="seconds between frames (ref: 5)"
    )
    p.add_argument(
        "--linger", type=float, default=0.0, help="seconds to hold the socket open"
    )
    args = p.parse_args(argv)

    frames = (
        endless(args.file, args.data_dir, args.batch_size)
        if args.endless
        else make_frames(args.file, args.data_dir, args.batch_size)
    )
    port = serve_frames(
        frames,
        host=args.host,
        port=args.port,
        sleep_secs=args.sleep,
        linger_secs=args.linger,
    )
    print(f"done: served on port {port}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
