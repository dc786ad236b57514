"""fvecs/ivecs loader tests against the reference's own siftsmall files
(SiftLoader.java:37-76 format contract) plus a synthetic round-trip and
the byte-range distributed reader's equality with the driver-side parse."""

from __future__ import annotations

import os

import numpy as np
import pytest

from jvector_spark.sources.vecfiles import (
    fvecs_df,
    read_fvecs,
    read_fvecs_distributed,
    read_ivecs,
)

SIFT_Q = "/root/reference/siftsmall/siftsmall_query.fvecs"
SIFT_GT = "/root/reference/siftsmall/siftsmall_groundtruth.ivecs"


def _write_fvecs(path: str, X: np.ndarray) -> None:
    n, dim = X.shape
    rec = np.empty((n, 4 + 4 * dim), np.uint8)
    rec[:, :4] = np.full((n, 1), dim, np.int32).view(np.uint8)
    rec[:, 4:] = X.astype("<f4").view(np.uint8)
    rec.tofile(path)


def test_fvecs_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    X = rng.normal(size=(37, 24)).astype(np.float32)
    p = str(tmp_path / "x.fvecs")
    _write_fvecs(p, X)
    assert np.array_equal(read_fvecs(p), X)


@pytest.mark.skipif(not os.path.exists(SIFT_Q), reason="no siftsmall")
def test_siftsmall_files_parse():
    """The reference's shipped files: 100 query vectors of dim 128,
    100 groundtruth rows of k=100 (SiftSmall.java's dataset)."""
    Q = read_fvecs(SIFT_Q)
    assert Q.shape == (100, 128)
    assert np.isfinite(Q).all()
    GT = read_ivecs(SIFT_GT)
    assert GT.shape == (100, 100)
    assert (GT >= 0).all()


@pytest.mark.skipif(not os.path.exists(SIFT_Q), reason="no siftsmall")
def test_distributed_fvecs_equals_driver(spark):
    """Byte-range-parallel scan == driver-side parse, ordinals intact."""
    X = read_fvecs(SIFT_Q)
    pdf = (
        read_fvecs_distributed(spark, SIFT_Q, num_partitions=7)
        .toPandas().sort_values("vec_id").reset_index(drop=True)
    )
    assert len(pdf) == len(X)
    assert pdf["vec_id"].tolist() == list(range(len(X)))
    got = np.stack(pdf["embedding"].to_numpy()).astype(np.float32)
    assert np.array_equal(got, X)
    # and the plain DataFrame loader agrees
    pdf2 = fvecs_df(spark, SIFT_Q).toPandas().sort_values("vec_id")
    got2 = np.stack(pdf2["embedding"].to_numpy()).astype(np.float32)
    assert np.array_equal(got2, X)
