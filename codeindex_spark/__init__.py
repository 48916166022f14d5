"""codeindex_spark — a PySpark-native inverted-index + BM25 engine.

A from-scratch reimplementation of the query and data-processing
capabilities of qiuhaotc/CodeIndex (reference, read-only at
/root/reference), re-expressed Spark-first:

- vectorized Arrow/pandas UDF tokenization (reference semantics:
  /root/reference/src/CodeIndex.IndexBuilder/CodeTokenUtils/WordSegmenter.cs:97-110)
- posting-list construction as DataFrame aggregation with
  docID-delta + varint compressed blocks and block-max metadata
- BM25 top-k query serving as posting-list algebra (joins on doc_id
  blocks), with term-dictionary expansion for wildcard/fuzzy/prefix
- resumable per-partition builds with manifest lineage
- training-data pipeline ops: dedup, similarity search, text analysis
"""

__version__ = "0.1.0"
