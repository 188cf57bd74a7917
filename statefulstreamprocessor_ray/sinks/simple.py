"""Plain sinks (reference S8/S9 analogs).

- ``write_partitioned_parquet``: the InfluxDB-sink analog
  (``06_DB_Connector/db_connector.py:46-66``): tags become partition columns,
  fields stay columns; row-count sanity check mirrors the ``SELECT count(*)``
  probe (``db_connector.py:71-72``).
- ``write_csv``: the Flink table-API CSV sink analog
  (``05_Flink_Python/Flink_Transformation_Example.py:71-86``).
"""

from __future__ import annotations

import ray.data


def write_partitioned_parquet(
    ds: ray.data.Dataset,
    path: str,
    partition_cols: list[str] | None = None,
    verify_count: bool = False,
) -> int | None:
    ds.write_parquet(path, partition_cols=partition_cols)
    if verify_count:
        return ray.data.read_parquet(path).count()
    return None


def write_csv(ds: ray.data.Dataset, path: str) -> None:
    ds.write_csv(path)
