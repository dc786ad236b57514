"""fvecs / ivecs / bvecs / fbin dataset loaders (the SiftLoader +
Deep1BLoader + MultiFileDatasource analogs).

Reference mapping: jvector-examples/.../util/SiftLoader.java:37-76 —
fvecs records are [dim:int32 LE][dim float32 LE], ivecs records are
[k:int32 LE][k int32 LE]. The reference ships `siftsmall/` with the
query fvecs + groundtruth ivecs in-repo (SiftSmall.java's recall test);
these loaders ingest the same files into DataFrames so our recall grid
(bench --grid) can run against real, non-synthetic vectors.

Scale notes: fvecs records are FIXED SIZE once the (uniform) dim is read,
so the format is byte-range splittable — `read_fvecs_distributed` maps
record ranges over executors for corpora that don't fit a driver. The
plain readers parse driver-side (numpy, one pass) and are the right tool
for query/groundtruth files, which are small by construction.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def read_fvecs(path: str) -> np.ndarray:
    """fvecs -> (n, dim) float32. Validates uniform dimension."""
    raw = np.fromfile(path, dtype=np.uint8)
    if len(raw) == 0:
        return np.zeros((0, 0), np.float32)
    dim = int(raw[:4].view(np.int32)[0])
    rec = 4 + 4 * dim
    if len(raw) % rec:
        raise ValueError(f"truncated fvecs file (record size {rec})")
    mat = raw.reshape(-1, rec)
    dims = mat[:, :4].copy().view(np.int32).ravel()
    if not (dims == dim).all():
        raise ValueError("non-uniform fvecs dimensions")
    return mat[:, 4:].copy().view(np.float32).reshape(-1, dim)


def read_ivecs(path: str) -> np.ndarray:
    """ivecs -> (n, k) int32 (uniform k — groundtruth files)."""
    raw = np.fromfile(path, dtype=np.uint8)
    if len(raw) == 0:
        return np.zeros((0, 0), np.int32)
    k = int(raw[:4].view(np.int32)[0])
    rec = 4 + 4 * k
    if len(raw) % rec:
        raise ValueError(f"truncated ivecs file (record size {rec})")
    mat = raw.reshape(-1, rec)
    return mat[:, 4:].copy().view(np.int32).reshape(-1, k)


def read_hdf5_dataset(path: str, dataset: str = "train") -> np.ndarray:
    """ann-benchmarks-style HDF5 loader (Hdf5Loader.java:87 analog:
    root-level datasets 'train'/'test'/'neighbors'/'distances').

    Uses h5py when available (full format coverage: chunked/compressed
    files); otherwise falls back to the pure-python minimal reader
    (sources/hdf5_minimal.py), which handles the uncompressed contiguous
    layout ann-benchmarks files ship in — so this environment (no h5py)
    still ingests them."""
    try:
        import h5py  # noqa: F401
    except ImportError:
        from jvector_spark.sources.hdf5_minimal import read_hdf5

        return read_hdf5(path, dataset)
    with h5py.File(path, "r") as f:  # pragma: no cover - env without h5py
        return np.asarray(f[dataset])


def fvecs_df(spark: SparkSession, path: str,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """fvecs file -> DataFrame(vec_id long, embedding array<float>)."""
    X = read_fvecs(path)
    pdf = pd.DataFrame({
        id_col: np.arange(len(X), dtype=np.int64),
        vec_col: [row for row in X],
    })
    return spark.createDataFrame(pdf)


def _ranged_record_scan(
    spark: SparkSession,
    path: str,
    n: int,
    rec: int,
    header: int,
    decode,
    num_partitions: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Byte-range-parallel scan over a FIXED-RECORD-SIZE vector file: each
    task seeks to its own record range, so a base file of any size loads
    without touching the driver — the scale path shared by fvecs / bvecs /
    fbin corpora. `decode` maps the task's raw (rows, rec) uint8 matrix to
    per-row vectors; vec_id = record ordinal (the reference's ordinal
    contract, Deep1BLoader.readFBin's startPosition arithmetic)."""
    from typing import Iterator

    schema = f"{id_col} long, {vec_col} array<float>"
    bounds = np.linspace(0, n, num_partitions + 1, dtype=np.int64)
    ranges = [(int(a), int(b)) for a, b in zip(bounds[:-1], bounds[1:]) if b > a]
    if not ranges:  # legitimately empty file: repartition(0) would throw
        return spark.createDataFrame([], schema)
    ranges_df = spark.createDataFrame(ranges, "start long, stop long")

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for row in pdf.itertuples():
                lo, hi = int(row.start), int(row.stop)
                with open(path, "rb") as f:
                    f.seek(header + lo * rec)
                    raw = np.frombuffer(f.read((hi - lo) * rec), np.uint8)
                X = decode(raw.reshape(-1, rec))
                yield pd.DataFrame({
                    id_col: np.arange(lo, hi, dtype=np.int64),
                    vec_col: [r for r in X],
                })

    return ranges_df.repartition(len(ranges)).mapInPandas(scan, schema)


def read_fvecs_distributed(
    spark: SparkSession,
    path: str,
    num_partitions: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Byte-range-parallel fvecs scan (see _ranged_record_scan)."""
    size = os.path.getsize(path)
    if size == 0:  # match read_fvecs: empty file -> empty result
        return _ranged_record_scan(spark, path, 0, 1, 0, None,
                                   num_partitions, id_col, vec_col)
    with open(path, "rb") as f:
        dim = int(np.frombuffer(f.read(4), np.int32)[0])
    rec = 4 + 4 * dim
    if dim <= 0 or size % rec:
        raise ValueError(f"truncated fvecs file (record size {rec})")

    def decode(m: np.ndarray) -> np.ndarray:
        # same per-record dim validation as the driver-side read_fvecs:
        # a corrupted header mid-file must fail loudly, not reinterpret
        # misaligned bytes as vector components
        dims = m[:, :4].copy().view(np.int32).ravel()
        if not (dims == dim).all():
            raise ValueError("non-uniform fvecs dimensions")
        return m[:, 4:].copy().view(np.float32).reshape(-1, dim)

    return _ranged_record_scan(
        spark, path, size // rec, rec, 0, decode,
        num_partitions, id_col, vec_col)


def read_bvecs(path: str) -> np.ndarray:
    """bvecs -> (n, dim) uint8 — the classic Deep1B/SIFT1B base format:
    records are [dim:int32 LE][dim uint8] (SiftLoader's byte-vector
    sibling; the reference reads the float conversions via Deep1BLoader)."""
    raw = np.fromfile(path, dtype=np.uint8)
    if len(raw) == 0:
        return np.zeros((0, 0), np.uint8)
    dim = int(raw[:4].view(np.int32)[0])
    rec = 4 + dim
    if len(raw) % rec:
        raise ValueError(f"truncated bvecs file (record size {rec})")
    mat = raw.reshape(-1, rec)
    dims = mat[:, :4].copy().view(np.int32).ravel()
    if not (dims == dim).all():
        raise ValueError("non-uniform bvecs dimensions")
    return mat[:, 4:].copy()


def read_bvecs_distributed(
    spark: SparkSession,
    path: str,
    num_partitions: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Byte-range-parallel bvecs scan; vectors upcast to float32 so the
    ANN operators consume them unchanged."""
    size = os.path.getsize(path)
    if size == 0:  # match read_bvecs: empty file -> empty result
        return _ranged_record_scan(spark, path, 0, 1, 0, None,
                                   num_partitions, id_col, vec_col)
    with open(path, "rb") as f:
        dim = int(np.frombuffer(f.read(4), np.int32)[0])
    rec = 4 + dim
    if dim <= 0 or size % rec:
        raise ValueError(f"truncated bvecs file (record size {rec})")

    def decode(m: np.ndarray) -> np.ndarray:
        dims = m[:, :4].copy().view(np.int32).ravel()
        if not (dims == dim).all():  # see read_fvecs_distributed
            raise ValueError("non-uniform bvecs dimensions")
        return m[:, 4:].astype(np.float32)

    return _ranged_record_scan(
        spark, path, size // rec, rec, 0, decode,
        num_partitions, id_col, vec_col)


def read_fbin(path: str, count: int | None = None) -> np.ndarray:
    """fbin -> (n, dim) float32 — the Deep1B big-ann layout
    (Deep1BLoader.readFBin:28-67): [n:int32 LE][dim:int32 LE] header,
    then n*dim float32. `count` caps the rows read (the reference reads a
    prefix of the 10^9-row file the same way)."""
    with open(path, "rb") as f:
        n, dim = np.frombuffer(f.read(8), np.int32)
        n = int(n) if count is None else min(int(n), int(count))
        X = np.frombuffer(f.read(4 * n * int(dim)), np.float32)
    return X.reshape(n, int(dim)).copy()


def read_fbin_distributed(
    spark: SparkSession,
    path: str,
    num_partitions: int = 32,
    count: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Byte-range-parallel fbin scan — the distributed analog of the
    reference's 16-way RandomAccessFile fan-out (Deep1BLoader.java:43-64),
    with executors instead of threads: same startPosition arithmetic
    (8-byte header + ordinal * dim * 4), unbounded file size."""
    with open(path, "rb") as f:
        n, dim = (int(x) for x in np.frombuffer(f.read(8), np.int32))
    if count is not None:
        n = min(n, int(count))
    rec = 4 * dim
    return _ranged_record_scan(
        spark, path, n, rec, 8,
        lambda m: m.copy().view(np.float32).reshape(-1, dim),
        num_partitions, id_col, vec_col)


def read_ibin_gt(path: str) -> np.ndarray:
    """Ground-truth ibin -> (n, topK) int32 (Deep1BLoader.readGT:70-91:
    [n:int32][topK:int32] header then n*topK int32 neighbor ordinals;
    trailing score floats, when present, are ignored — 'GT file also
    contains scores, we don't need those')."""
    with open(path, "rb") as f:
        n, topk = (int(x) for x in np.frombuffer(f.read(8), np.int32))
        X = np.frombuffer(f.read(4 * n * topk), np.int32)
    return X.reshape(n, topk).copy()


class VecDataset:
    """A named (base, queries, groundtruth) file triple — the reference's
    MultiFileDatasource (MultiFileDatasource.java:28-49: name + three
    paths, loaded into one DataSet). Format is sniffed per file from its
    extension (fvecs/fvec, bvecs/bvec, fbin; gt: ivecs/ivec, ibin/bin),
    so one dataset may mix layouts the way the reference's registry does."""

    def __init__(self, name: str, base_path: str, queries_path: str,
                 gt_path: str | None = None) -> None:
        self.name = name
        self.base_path = base_path
        self.queries_path = queries_path
        self.gt_path = gt_path

    def paths(self) -> list[str]:
        return [p for p in (self.base_path, self.queries_path, self.gt_path)
                if p]

    @staticmethod
    def _read_vectors(path: str) -> np.ndarray:
        ext = os.path.splitext(path)[1].lower().lstrip(".")
        if ext in ("fvecs", "fvec"):
            return read_fvecs(path)
        if ext in ("bvecs", "bvec"):
            return read_bvecs(path).astype(np.float32)
        if ext == "fbin":
            return read_fbin(path)
        raise ValueError(f"unknown vector file extension {ext!r} ({path})")

    def load_base_df(self, spark: SparkSession, num_partitions: int = 32,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
        """Base vectors as a DataFrame via the DISTRIBUTED ranged scan —
        base files are the unbounded-size member of the triple."""
        ext = os.path.splitext(self.base_path)[1].lower().lstrip(".")
        reader = {"fvecs": read_fvecs_distributed,
                  "fvec": read_fvecs_distributed,
                  "bvecs": read_bvecs_distributed,
                  "bvec": read_bvecs_distributed,
                  "fbin": read_fbin_distributed}.get(ext)
        if reader is None:
            raise ValueError(f"unknown base extension {ext!r}")
        return reader(spark, self.base_path, num_partitions=num_partitions,
                      id_col=id_col, vec_col=vec_col)

    def load_queries(self) -> np.ndarray:
        """Query vectors driver-side (small by construction)."""
        return self._read_vectors(self.queries_path)

    def load_gt(self) -> np.ndarray:
        """Ground-truth neighbor ordinals, (n_queries, k) int32."""
        if not self.gt_path:
            raise ValueError(f"dataset {self.name!r} has no ground truth")
        ext = os.path.splitext(self.gt_path)[1].lower().lstrip(".")
        if ext in ("ivecs", "ivec"):
            return read_ivecs(self.gt_path)
        if ext in ("ibin", "bin"):
            return read_ibin_gt(self.gt_path)
        raise ValueError(f"unknown gt extension {ext!r}")
