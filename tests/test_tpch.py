"""TPC-H-shape relational pipelines (pipelines/tpch.py) — oracle parity is
covered by the sweep (test_queries_oracle.py); these pin the zero-match
paths (every join input anchored via ensure_schema survives a
fully-filtered side) and the global_topk reduction."""

import pandas as pd
import pyarrow as pa
import pytest

from statefulstreamprocessor_ray.pipelines import tpch

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_shipping_priority_zero_match_segment_and_dates():
    assert len(tpch.shipping_priority(SF, segment="NO_SUCH").to_pandas()) == 0
    assert len(tpch.shipping_priority(SF, date="2005-01-01").to_pandas()) == 0


@pytest.mark.usefixtures("ray_session")
def test_local_supplier_volume_zero_match_region_and_dates():
    assert len(tpch.local_supplier_volume(SF, region="NO_SUCH").to_pandas()) == 0
    assert (
        len(
            tpch.local_supplier_volume(
                SF, date_lo="2005-01-01", date_hi="2006-01-01"
            ).to_pandas()
        )
        == 0
    )


@pytest.mark.usefixtures("ray_session")
def test_pricing_summary_zero_match_cutoff():
    assert len(tpch.pricing_summary(SF, cutoff="1990-01-01").to_pandas()) == 0


@pytest.mark.usefixtures("ray_session")
def test_global_topk_ties_and_small_input():
    import ray.data

    df = pd.DataFrame({"v": [5, 5, 5, 1], "id": [30, 10, 20, 1]})
    out = tpch.global_topk(ray.data.from_pandas(df), "v", "id", 2).to_pandas()
    assert list(out["id"]) == [10, 20]  # value ties -> ascending id
    # k larger than input
    out2 = tpch.global_topk(ray.data.from_pandas(df), "v", "id", 99).to_pandas()
    assert len(out2) == 4


@pytest.mark.usefixtures("ray_session")
def test_ensure_schema_restores_arrow_types():
    import pyarrow.compute as pc
    import ray.data

    from statefulstreamprocessor_ray.stages.relational import ensure_schema

    ds = ray.data.read_parquet(
        f"{SF}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"],
        filter=(pc.field("c_mktsegment") == "NO_SUCH"),
    ).select_columns(["c_custkey"])
    assert ds.schema() is None  # the Ray zero-row schema loss this guards
    anchored = ensure_schema(ds, pa.schema([("c_custkey", pa.int64())]))
    s = anchored.schema()
    base = getattr(s, "base_schema", s)
    assert base.field("c_custkey").type == pa.int64()
    assert anchored.count() == 0
