"""fvecs / ivecs dataset loaders (the SiftLoader analog).

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


def read_fvecs_distributed(
    spark: SparkSession,
    path: str,
    num_partitions: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Byte-range-parallel fvecs scan: each task reads its own record
    range (records are fixed-size), so a base file of any size loads
    without touching the driver — the scale path for corpus fvecs.
    vec_id = record ordinal (matches the reference's ordinal contract)."""
    from typing import Iterator

    size = os.path.getsize(path)
    with open(path, "rb") as f:
        dim = int(np.frombuffer(f.read(4), np.int32)[0])
    rec = 4 + 4 * dim
    if size % rec:
        raise ValueError(f"truncated fvecs file (record size {rec})")
    n = size // rec
    bounds = np.linspace(0, n, num_partitions + 1, dtype=np.int64)
    ranges = [(int(a), int(b)) for a, b in zip(bounds[:-1], bounds[1:]) if b > a]
    ranges_df = spark.createDataFrame(ranges, "start long, stop long")

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for row in pdf.itertuples():
                lo, hi = int(row.start), int(row.stop)
                with open(path, "rb") as f:
                    f.seek(lo * rec)
                    raw = np.frombuffer(f.read((hi - lo) * rec), np.uint8)
                mat = raw.reshape(-1, rec)
                X = mat[:, 4:].copy().view(np.float32).reshape(-1, dim)
                yield pd.DataFrame({
                    id_col: np.arange(lo, hi, dtype=np.int64),
                    vec_col: [r for r in X],
                })

    return ranges_df.repartition(len(ranges)).mapInPandas(
        scan, f"{id_col} long, {vec_col} array<float>"
    )
