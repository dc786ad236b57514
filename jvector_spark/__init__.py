"""jvector_spark — a PySpark-native full-text (inverted-index / BM25) engine.

Built from scratch with the *capabilities* of sam-herman/jvector (an embedded
ANN graph-index library), re-expressed as the inverted-index analog per the
project north star: posting-list construction with docID-delta compressed
blocks + block-max metadata, doc-partitioned segments, sort-merge compaction,
and top-k BM25 queries via block-max pruned scoring with a bounded k-heap —
rank-identical (score desc, docid asc; cf. reference
jvector-base/.../graph/SearchResult.java:101-106) to a brute-force oracle.

Layout:
  functions/   tokenizer, BM25 scoring expressions, codecs (numpy-vectorized)
  operators/   DataFrame-level operators: stats, postings, query, dedup, ANN
  sources/     segment format readers/writers (the OnDiskGraphIndex analog)
  plans/       build pipeline, checkpoints/resume, merge-compaction
  streaming/   incremental micro-segment build (Structured Streaming)
"""

__version__ = "0.1.0"

K1 = 1.2
B = 0.75
BLOCK_SIZE = 128
# v2: adaptive per-(term, stream) codec — varint (v1 layout) or FOR
# bit-packed blocks; v1 segments (no codec dictionary columns) still load
SEGMENT_FORMAT_VERSION = 2
