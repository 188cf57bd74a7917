"""statefulstreamprocessor_ray — a Ray-Data-native stateful streaming / CEP engine.

From-scratch re-expression of the query & data-processing capabilities of
ChristophSchranz/StatefulStreamProcessor (reference, read-only at /root/reference)
on top of ``ray.data.Dataset`` pipelines:

- event-time-ordered two-stream join (the reference's LocalStreamBuffer,
  ``05_LocalStreamBuffer/local_stream_buffer.py:104-396``) as a hash-partitioned
  ``groupby(key).map_groups`` replay stage (batch path) and as persistent shard
  actors (streaming/epoch path with checkpoint + exactly-once sink),
- tumbling / sliding / session windows with watermarks and lateness handling
  (the Flink pendant, ``05_Flink_Java/.../StreamJoiner.java``),
- exactly-once Parquet sink via staging + per-epoch manifests (the Kafka EOS
  transaction analog, ``05_LocalStreamBuffer/ts_join_with_kafka_eos.py``),
- large-scale training-data operators: dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard / embedding-cosine), ANN similarity search, text analysis,
  multimodal column plumbing.

No code is copied from the reference; semantics were derived from its observable
behavior and documented in SURVEY.md.

This package never calls ``ray.init()`` — sessions are owned by the caller
(bench.py, CLI, test fixture, or the evaluation driver).
"""

from statefulstreamprocessor_ray.state.stream_buffer import OrderedJoinState
from statefulstreamprocessor_ray.schema import (
    TRANSCRIPT_SCHEMA,
    EVENT_SCHEMA,
    JOINED_SCHEMA,
)

__all__ = [
    "OrderedJoinState",
    "TRANSCRIPT_SCHEMA",
    "EVENT_SCHEMA",
    "JOINED_SCHEMA",
]

__version__ = "0.1.0"
