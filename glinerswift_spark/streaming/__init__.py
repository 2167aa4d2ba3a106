"""foreachBatch-compatible wrappers.

The north rule requires BATCH with resumable per-partition checkpoints
(operators/checkpoint.py), not Structured Streaming — the reference is a
synchronous request/response library with no streaming operators
(SURVEY.md §2.9). Every stage in this package is a pure
DataFrame -> DataFrame transform, so running the same pipeline over a
stream is just plumbing; this module provides that plumbing.
"""

from glinerswift_spark.streaming.foreach_batch import (  # noqa: F401
    kg_foreach_batch,
    stream_documents,
)
