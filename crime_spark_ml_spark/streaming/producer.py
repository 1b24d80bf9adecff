"""TCP batch producer — the reference's transport contract
(stream.py:24-36 bind/listen/accept; stream.py:184-204 batch_size
slicing + name erasure + newline-JSON + per-batch sleep), rebuilt as a
reusable utility so producer→consumer integrations are testable
end-to-end.

This is deliberately plain sockets, not Spark: the producer is the
*external* side of the pipeline (the reference runs it as a separate
process feeding Spark's socket source). Frame encoders are pure
functions so the identical bytes can also be written to files for the
replayable ``file_lines`` source — that is what makes stream/batch
parity testable without a socket.
"""

from __future__ import annotations

import json
import socket
import time
from collections.abc import Iterable, Iterator, Mapping
from typing import Any


def tabular_frames(
    rows: Iterable[Mapping[str, Any]],
    batch_size: int,
    keep_keys: tuple[str, ...] = ("label",),
) -> Iterator[str]:
    """T2 frames (stream.py:184-204): slice rows into batches of
    ``batch_size``; each frame is one JSON object whose outer keys are
    row indices "0".."n-1" and whose inner objects erase column names
    to ``feature{i}`` in column order (E9), except ``keep_keys``
    (CIFAR keeps ``label``, stream.py:62)."""
    buf: list[Mapping[str, Any]] = []
    for row in rows:
        buf.append(row)
        if len(buf) == batch_size:
            yield _encode_tabular(buf, keep_keys)
            buf = []
    if buf:
        yield _encode_tabular(buf, keep_keys)


def _encode_tabular(batch: list[Mapping[str, Any]], keep_keys: tuple[str, ...]) -> str:
    payload: dict[str, dict[str, Any]] = {}
    for i, row in enumerate(batch):
        rec: dict[str, Any] = {}
        feature_index = 0
        for key, value in row.items():
            if key in keep_keys:
                rec[key] = value
            else:
                rec[f"feature{feature_index}"] = value
                feature_index += 1
        payload[str(i)] = rec
    return json.dumps(payload)


def text_frames(lines: Iterable[str], batch_size: int) -> Iterator[str]:
    """T3 frames (stream.py:209-222): JSON array of raw lines per send."""
    buf: list[str] = []
    for line in lines:
        buf.append(line)
        if len(buf) == batch_size:
            yield json.dumps(buf)
            buf = []
    if buf:
        yield json.dumps(buf)


def serve_frames(
    frames: Iterable[str],
    host: str = "127.0.0.1",
    port: int = 6100,
    sleep_secs: float = 0.0,
    linger_secs: float = 0.0,
    ready: "threading.Event | None" = None,  # noqa: F821 - typing only
) -> int:
    """Bind/listen/accept once (stream.py:24-36), send each frame as a
    newline-terminated payload with ``sleep_secs`` between sends (the
    reference's 5 s cadence), then optionally linger so the consumer
    drains before the socket closes. Returns the bound port (pass
    ``port=0`` to let the OS choose; read it back via ``ready`` after
    the listener is up)."""
    server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    server.bind((host, port))
    bound_port = server.getsockname()[1]
    server.listen(1)
    if ready is not None:
        ready.port = bound_port  # type: ignore[attr-defined]
        ready.set()
    try:
        conn, _ = server.accept()
        with conn:
            for frame in frames:
                conn.sendall((frame + "\n").encode())
                if sleep_secs:
                    time.sleep(sleep_secs)
            if linger_secs:
                time.sleep(linger_secs)
    finally:
        server.close()
    return bound_port
