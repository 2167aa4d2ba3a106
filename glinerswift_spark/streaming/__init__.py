"""Structured Streaming surfaces.

The core pipeline is BATCH with resumable per-partition checkpoints
(operators/checkpoint.py) — every stage is a pure
DataFrame -> DataFrame transform, so streaming is plumbing on top:

  * foreach_batch — run the KG stages per micro-batch (exactly-once via
    the streaming checkpoint + idempotent batch-id dirs);
  * stateful — watermarked windowed aggregation and
    applyInPandasWithState gap-sessionization with event-time timeout
    flushing (bounded per-key state).
"""

from glinerswift_spark.streaming.foreach_batch import (  # noqa: F401
    kg_foreach_batch,
    stream_documents,
)
from glinerswift_spark.streaming.stateful import (  # noqa: F401
    dedup_stream,
    sessionize_stream,
    stream_events,
    windowed_event_counts,
)
