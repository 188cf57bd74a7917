"""Driver contract for the Ray-Data-native StatefulStreamProcessor engine.

The driver initialises Ray BEFORE importing this module; nothing here (or in
the library) calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``: flagship pipeline (transcript replay -> ordered two-stream
  join) over /root/testdata/sf0.001.
- ``queries()``: one entry per implemented operator/pipeline (SURVEY.md §2 +
  training-data ops), callables of ``sf_dir``.
- ``oracle_sql()``: DuckDB equivalents for the SQL-expressible subset; the
  ordered-join family, MinHash/SimHash/LSH are rows-only (state-machine /
  probabilistic semantics), covered instead by the pytest golden suites.
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
