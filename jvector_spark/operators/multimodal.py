"""Multimodal (image/audio/video) column plumbing for training pipelines.

Media are opaque `binary` columns + typed metadata. The division of labor
is Spark-first:

  * everything expressible in Catalyst runs JVM-side in whole-stage
    codegen — payload hashing (`sha2`), byte lengths, and the ENTIRE
    frame-sampling explode (`sequence` + `explode` + `md5`), zero Python;
  * only the decode itself crosses into an Arrow-batched `mapInPandas`,
    and that decode is REAL for the container-supported formats: a pure-
    python header sniffer reads dimensions/channels from PNG / GIF / BMP /
    JPEG bytes (no codec library needed — dimensions live in the headers).
    PIL, when installed, extends coverage to every format it knows.
    Payloads that are not decodable images (e.g. the driver fixtures'
    utf-8 text bytes) fall back to the DETERMINISTIC fake (dims derived
    from the payload sha256), which is what keeps the DuckDB oracle able
    to exercise the full mapInPandas path end-to-end.

Scale notes: pure map-side (one pass, no shuffle); binary payloads stay in
Arrow buffers between JVM and Python (no base64 round-trips); the frame
explode never leaves the JVM.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - not installed in this container
    from PIL import Image

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

IMAGE_FEATURES_SCHEMA = (
    "doc_id long, n_bytes long, payload_sha string, width int, height int, "
    "n_channels int"
)
FRAME_SAMPLE_SCHEMA = "doc_id long, frame_idx int, frame_sha string"
FRAME_BYTES = 4096

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
#: PNG color type -> sample channels (greyscale, rgb, palette, grey+a, rgba)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
#: JPEG start-of-frame markers (C4/C8/CC are not SOF)
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
             0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def with_payload(docs: DataFrame, text: str = "text") -> DataFrame:
    """(doc_id, payload binary) — stands in for a real media column; at
    ingest this would be the raw image/audio bytes from the source table."""
    return docs.select("doc_id", F.encode(F.col(text), "UTF-8").alias("payload"))


def sniff_image_dims(b: bytes) -> tuple[int, int, int] | None:
    """(width, height, channels) parsed from the image HEADER bytes of
    PNG / GIF / BMP / JPEG, or None when `b` is not one of those. Pure
    python — dimensions live in the first bytes of every format, so no
    codec library is required to extract them (the metadata tier of a
    real decode pipeline; full pixel decode would need the codec)."""
    try:
        if b[:8] == _PNG_MAGIC and b[12:16] == b"IHDR":
            w, h = struct.unpack(">II", b[16:24])
            return int(w), int(h), _PNG_CHANNELS.get(b[25], 3)
        if b[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", b[6:10])
            return int(w), int(h), 3
        if b[:2] == b"BM" and len(b) >= 26:
            w, h = struct.unpack("<ii", b[18:26])
            return int(w), abs(int(h)), 3
        if b[:2] == b"\xff\xd8":  # JPEG: walk markers to a SOF segment
            i = 2
            while i + 9 < len(b):
                if b[i] != 0xFF:
                    return None
                marker = b[i + 1]
                if marker in _JPEG_SOF:
                    h, w = struct.unpack(">HH", b[i + 5:i + 9])
                    return int(w), int(h), int(b[i + 9])
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2  # standalone marker, no length field
                    continue
                (seg_len,) = struct.unpack(">H", b[i + 2:i + 4])
                i += 2 + seg_len
    except (struct.error, IndexError):
        return None
    return None


def _fake_decode_dims(sha_hex: str) -> tuple[int, int, int]:
    """Deterministic stand-in for non-image payloads: dims derived from
    the payload hash. Formula mirrored in the SQL oracle — keep in sync."""
    w = 64 + int(sha_hex[:2], 16) % 192
    h = 64 + int(sha_hex[2:4], 16) % 192
    c = 1 + int(sha_hex[4:6], 16) % 4
    return w, h, c


def decode_dims(b: bytes, sha_hex: str) -> tuple[int, int, int]:
    """Real header decode -> PIL (if installed) -> deterministic fake."""
    dims = sniff_image_dims(b)
    if dims is not None:
        return dims
    if _HAVE_PIL:  # pragma: no cover - PIL absent in this container
        import io

        try:
            with Image.open(io.BytesIO(b)) as im:
                return int(im.width), int(im.height), len(im.getbands())
        except Exception:
            pass
    return _fake_decode_dims(sha_hex)


def extract_image_features(docs_with_payload: DataFrame) -> DataFrame:
    """Image metadata extraction: hashing and byte counts stay JVM-side
    (whole-stage codegen); only the header decode crosses into the
    Arrow-batched python pass, operating on (payload, sha) pairs."""
    base = docs_with_payload.select(
        "doc_id", "payload",
        F.length("payload").cast("long").alias("n_bytes"),
        F.lower(F.sha2("payload", 256)).alias("payload_sha"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [decode_dims(b, s)
                    for b, s in zip(pdf["payload"], pdf["payload_sha"])]
            out = pd.DataFrame(dims, columns=["width", "height", "n_channels"],
                               dtype="int32")
            out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            out.insert(1, "n_bytes", pdf["n_bytes"].to_numpy())
            out.insert(2, "payload_sha", pdf["payload_sha"].to_numpy())
            yield out

    return base.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = (
    "doc_id long, n_bytes long, payload_sha string, sample_rate int, "
    "n_channels int, bits_per_sample int, n_samples long, duration_ms double"
)


def sniff_wav_meta(b: bytes) -> tuple[int, int, int, int] | None:
    """(sample_rate, channels, bits_per_sample, n_samples) parsed from a
    RIFF/WAVE header by walking its chunk list to `fmt ` and `data`, or
    None when `b` is not a WAV. Pure python, header bytes only — the
    audio analog of `sniff_image_dims` (PCM decode would need the data
    chunk; every training-pipeline filter/stat here needs only the
    metadata tier)."""
    try:
        if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
            return None
        i, fmt, data_size = 12, None, None
        while i + 8 <= len(b):
            cid = b[i:i + 4]
            (size,) = struct.unpack("<I", b[i + 4:i + 8])
            if cid == b"fmt " and size >= 16:
                ch, rate = struct.unpack("<HI", b[i + 10:i + 16])
                (bits,) = struct.unpack("<H", b[i + 22:i + 24])
                fmt = (int(rate), int(ch), int(bits))
            elif cid == b"data":
                data_size = int(size)
            if fmt is not None and data_size is not None:
                break
            i += 8 + size + (size & 1)  # chunks are word-aligned
        if fmt is None:
            return None
        rate, ch, bits = fmt
        # A structurally-valid RIFF with rate==0 would make duration_ms
        # infinite downstream (division by zero), and fields past int32
        # would wrap negative in the Arrow cast — treat both as a failed
        # sniff so such payloads take the deterministic-fake path.
        if not (0 < rate < 2 ** 31 and 0 < ch < 2 ** 31
                and 0 < bits < 2 ** 31):
            return None
        frame = max(1, ch * bits // 8)
        n_samples = (data_size or 0) // frame
        if n_samples >= 2 ** 63:
            return None
        return rate, ch, bits, n_samples
    except (struct.error, IndexError):
        return None


def _fake_audio_meta(sha_hex: str) -> tuple[int, int, int, int]:
    """Deterministic stand-in for non-audio payloads, same discipline as
    `_fake_decode_dims`: metadata derived from the payload hash so the
    full Arrow-batched path stays exercisable on any fixture corpus."""
    rate = (8000, 16000, 22050, 44100)[int(sha_hex[:2], 16) % 4]
    ch = 1 + int(sha_hex[2:4], 16) % 2
    bits = (8, 16)[int(sha_hex[4:6], 16) % 2]
    n_samples = 1000 + int(sha_hex[6:10], 16)
    return rate, ch, bits, n_samples


def decode_audio_meta(b: bytes, sha_hex: str) -> tuple[int, int, int, int]:
    """Real WAV header decode -> deterministic fake (non-audio payloads)."""
    meta = sniff_wav_meta(b)
    return meta if meta is not None else _fake_audio_meta(sha_hex)


def extract_audio_features(docs_with_payload: DataFrame) -> DataFrame:
    """Audio metadata extraction, same split as `extract_image_features`:
    hashing/byte counts in whole-stage codegen, header decode in one
    Arrow-batched `mapInPandas` pass, duration derived in the batch."""
    base = docs_with_payload.select(
        "doc_id", "payload",
        F.length("payload").cast("long").alias("n_bytes"),
        F.lower(F.sha2("payload", 256)).alias("payload_sha"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [decode_audio_meta(b, s)
                    for b, s in zip(pdf["payload"], pdf["payload_sha"])]
            out = pd.DataFrame(
                meta, columns=["sample_rate", "n_channels",
                               "bits_per_sample", "n_samples"])
            out["sample_rate"] = out["sample_rate"].astype("int32")
            out["n_channels"] = out["n_channels"].astype("int32")
            out["bits_per_sample"] = out["bits_per_sample"].astype("int32")
            out["n_samples"] = out["n_samples"].astype("int64")
            out["duration_ms"] = (
                out["n_samples"] * 1000.0 / out["sample_rate"])
            out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            out.insert(1, "n_bytes", pdf["n_bytes"].to_numpy())
            out.insert(2, "payload_sha", pdf["payload_sha"].to_numpy())
            yield out

    return base.mapInPandas(run, AUDIO_FEATURES_SCHEMA)


def sample_frames(docs_with_payload: DataFrame,
                  frame_bytes: int = FRAME_BYTES) -> DataFrame:
    """'Video' frame sampling: one row per sampled frame; frame count =
    ceil(n_bytes / frame_bytes), frame id = md5(payload_sha:idx).
    ENTIRELY Catalyst — `sequence` + `explode` + `md5` run in whole-stage
    codegen, so the per-frame explode never pays a Python round-trip
    (zero-byte payloads sample zero frames)."""
    nf = F.ceil(F.length("payload") / F.lit(frame_bytes)).cast("int")
    frames = F.when(
        nf > 0, F.sequence(F.lit(0), nf - 1)
    ).otherwise(F.array().cast("array<int>"))
    return (
        docs_with_payload
        .select("doc_id",
                F.lower(F.sha2("payload", 256)).alias("payload_sha"),
                F.explode(frames).alias("frame_idx"))
        .select(
            "doc_id",
            F.col("frame_idx").cast("int"),
            F.md5(F.concat(F.col("payload_sha"), F.lit(":"),
                           F.col("frame_idx").cast("string")))
            .alias("frame_sha"),
        )
    )
