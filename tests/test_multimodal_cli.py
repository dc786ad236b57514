"""Multimodal plumbing + CLI lifecycle tests."""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pandas as pd
import pytest

from jvector_spark.operators.multimodal import (
    extract_audio_features,
    extract_image_features,
    sample_frames,
    sniff_wav_meta,
    with_payload,
)


@pytest.fixture(scope="module")
def docs(spark):
    pdf = pd.DataFrame({
        "doc_id": np.arange(20, dtype=np.int64),
        "text": [f"doc body {i} " + "x" * (i * 500) for i in range(20)],
    })
    return spark.createDataFrame(pdf).repartition(3)


def test_image_features_deterministic(spark, docs):
    a = extract_image_features(with_payload(docs)).toPandas().sort_values("doc_id")
    b = extract_image_features(with_payload(docs)).toPandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))
    # features derive from the payload bytes exactly as specified
    row = a[a["doc_id"] == 3].iloc[0]
    payload = ("doc body 3 " + "x" * 1500).encode()
    sha = hashlib.sha256(payload).hexdigest()
    assert row["payload_sha"] == sha
    assert row["n_bytes"] == len(payload)
    assert row["width"] == 64 + int(sha[:2], 16) % 192
    assert 1 <= row["n_channels"] <= 4


def _png_bytes(w: int, h: int, color_type: int = 6) -> bytes:
    import struct
    import zlib

    ihdr = struct.pack(">II", w, h) + bytes([8, color_type, 0, 0, 0])
    return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR" + ihdr
            + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr)))


def test_sniff_image_dims_headers():
    """Real header decode for PNG/GIF/BMP/JPEG; None for non-images."""
    import struct

    from jvector_spark.operators.multimodal import sniff_image_dims

    assert sniff_image_dims(_png_bytes(640, 480, 6)) == (640, 480, 4)
    assert sniff_image_dims(_png_bytes(7, 9, 0)) == (7, 9, 1)
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 8
    assert sniff_image_dims(gif) == (320, 200, 3)
    # BMP height may be negative (top-down rows)
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 100, -50) + b"\x00" * 8
    assert sniff_image_dims(bmp) == (100, 50, 3)
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = (b"\xff\xc0" + struct.pack(">H", 17) + bytes([8])
            + struct.pack(">HH", 768, 1024) + bytes([3]) + b"\x00" * 9)
    assert sniff_image_dims(b"\xff\xd8" + app0 + sof0) == (1024, 768, 3)
    assert sniff_image_dims(b"plain text payload") is None
    assert sniff_image_dims(b"") is None
    assert sniff_image_dims(b"\x89PNG\r\n\x1a\x08IHDR") is None  # truncated


def test_image_features_real_png(spark):
    """A genuine PNG payload takes the header-decode path (not the fake)."""
    pdf = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "payload": [_png_bytes(640, 480, 6), _png_bytes(32, 16, 2),
                    b"not an image at all"],
    })
    out = (extract_image_features(spark.createDataFrame(pdf))
           .toPandas().sort_values("doc_id").reset_index(drop=True))
    assert (out.loc[0, ["width", "height", "n_channels"]].tolist()
            == [640, 480, 4])
    assert (out.loc[1, ["width", "height", "n_channels"]].tolist()
            == [32, 16, 3])
    # non-image falls back to the deterministic sha-derived fake
    sha = hashlib.sha256(b"not an image at all").hexdigest()
    assert out.loc[2, "width"] == 64 + int(sha[:2], 16) % 192
    assert out.loc[2, "payload_sha"] == sha


def _wav_bytes(rate: int, ch: int, bits: int, n_samples: int) -> bytes:
    """Real WAV via the stdlib writer — the sniffing side must not share
    code with the construction side."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(ch)
        w.setsampwidth(bits // 8)
        w.setframerate(rate)
        w.writeframes(b"\x00" * (n_samples * ch * (bits // 8)))
    return buf.getvalue()


def test_sniff_wav_meta_headers():
    assert sniff_wav_meta(_wav_bytes(44100, 2, 16, 1234)) == (44100, 2, 16, 1234)
    assert sniff_wav_meta(_wav_bytes(8000, 1, 8, 7)) == (8000, 1, 8, 7)
    assert sniff_wav_meta(b"RIFFxxxxNOPE") is None
    assert sniff_wav_meta(b"plain text") is None
    assert sniff_wav_meta(b"") is None


def _raw_wav(rate: int, ch: int, bits: int, data_size: int) -> bytes:
    """Hand-built RIFF header for degenerate fields the stdlib writer
    refuses to produce (rate 0, rates past int32)."""
    import struct as s

    byte_rate = (rate * ch * (bits // 8)) % (2 ** 32) or 1
    fmt = s.pack("<HHIIHH", 1, ch, rate % (2 ** 32), byte_rate,
                 ch * (bits // 8) or 1, bits)
    return (b"RIFF" + s.pack("<I", 4 + 8 + len(fmt) + 8 + data_size)
            + b"WAVE" + b"fmt " + s.pack("<I", len(fmt)) + fmt
            + b"data" + s.pack("<I", data_size))


def test_sniff_wav_rejects_degenerate_fields():
    # rate==0 would make duration_ms infinite; out-of-int32 rates wrap
    # negative in the Arrow cast — both must fail the sniff and take the
    # deterministic-fake path instead.
    assert sniff_wav_meta(_raw_wav(0, 1, 16, 64)) is None
    assert sniff_wav_meta(_raw_wav(2 ** 31, 1, 16, 64)) is None
    assert sniff_wav_meta(_raw_wav(44100, 0, 16, 64)) is None
    assert sniff_wav_meta(_raw_wav(44100, 1, 0, 64)) is None
    # sane header still parses
    assert sniff_wav_meta(_raw_wav(44100, 2, 16, 400)) == (44100, 2, 16, 100)


def test_audio_features_real_wav(spark):
    """Genuine WAV payloads take the header-decode path; others fall back
    to the deterministic sha-derived fake (same discipline as images)."""
    pdf = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "payload": [_wav_bytes(16000, 1, 16, 16000),
                    _wav_bytes(44100, 2, 8, 441),
                    b"not audio at all"],
    })
    out = (extract_audio_features(spark.createDataFrame(pdf))
           .toPandas().sort_values("doc_id").reset_index(drop=True))
    assert (out.loc[0, ["sample_rate", "n_channels", "bits_per_sample",
                        "n_samples"]].tolist() == [16000, 1, 16, 16000])
    assert out.loc[0, "duration_ms"] == 1000.0
    assert (out.loc[1, ["sample_rate", "n_channels", "bits_per_sample",
                        "n_samples"]].tolist() == [44100, 2, 8, 441])
    sha = hashlib.sha256(b"not audio at all").hexdigest()
    assert out.loc[2, "sample_rate"] == (
        (8000, 16000, 22050, 44100)[int(sha[:2], 16) % 4])
    assert out.loc[2, "payload_sha"] == sha


def test_audio_features_deterministic(spark, docs):
    a = extract_audio_features(with_payload(docs)).toPandas().sort_values("doc_id")
    b = extract_audio_features(with_payload(docs)).toPandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))
    assert len(a) == 20


def test_frame_sample_counts(spark, docs):
    frames = sample_frames(with_payload(docs), frame_bytes=1000).toPandas()
    counts = frames.groupby("doc_id").size()
    for i in range(20):
        n_bytes = len((f"doc body {i} " + "x" * (i * 500)).encode())
        assert counts[i] == (n_bytes + 999) // 1000
    # frame ids unique and deterministic
    assert frames["frame_sha"].is_unique


def test_cli_lifecycle(spark, corpus_pdf, tmp_path):
    """build -> resume -> search -> delete -> compact -> metrics through the
    CLI entry (in-process; getOrCreate reuses the test session)."""
    from jvector_spark import cli

    src = str(tmp_path / "corpus.parquet")
    corpus_pdf.to_parquet(src, index=False)
    idx, out = str(tmp_path / "idx"), str(tmp_path / "out")
    qfile = str(tmp_path / "q.jsonl")
    pd.DataFrame({"qid": [0, 1], "terms": [["import"], ["def", "return"]],
                  "k": [5, 5]}).to_json(qfile, orient="records", lines=True)

    assert cli.main(["build", "--input", src, "--index", idx,
                     "--segments", "3"]) == 0
    m1 = json.load(open(os.path.join(idx, "manifest.json")))
    assert m1["n_docs"] == len(corpus_pdf)

    assert cli.main(["build", "--input", src, "--index", idx,
                     "--segments", "3"]) == 0  # resume: same manifest
    m2 = json.load(open(os.path.join(idx, "manifest.json")))
    assert [s["fingerprint"] for s in m2["segments"]] == [
        s["fingerprint"] for s in m1["segments"]]

    assert cli.main(["search", "--index", idx, "--queries", qfile,
                     "--output", out]) == 0
    res = pd.read_parquet(out)
    assert set(res["qid"]) == {0, 1}

    # positional build + phrase through the CLI
    idxp = str(tmp_path / "idxp")
    pfile = str(tmp_path / "p.jsonl")
    pd.DataFrame({"qid": [0], "phrase": ["map_get21 run_parse33"],
                  "k": [5]}).to_json(pfile, orient="records", lines=True)
    outp = str(tmp_path / "outp")
    assert cli.main(["build", "--input", src, "--index", idxp,
                     "--segments", "3", "--positions"]) == 0
    assert cli.main(["phrase", "--index", idxp, "--queries", pfile,
                     "--output", outp]) == 0
    pres = pd.read_parquet(outp)
    assert len(pres) > 0 and (pres["n_matches"] >= 1).all()

    assert cli.main(["delete", "--index", idx, "--docids", "0,1"]) == 0
    out2 = str(tmp_path / "idx2")
    assert cli.main(["compact", "--index", idx, "--output", out2,
                     "--target-segments", "2"]) == 0
    m3 = json.load(open(os.path.join(out2, "manifest.json")))
    assert m3["n_docs"] == len(corpus_pdf) - 2
    assert cli.main(["metrics", "--index", out2]) == 0
