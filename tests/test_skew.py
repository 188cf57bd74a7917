"""FIXTURES.md F9: hot-key salting must be byte-identical to the plain plan."""

import pandas as pd
import pytest

from statefulstreamprocessor_ray import fixtures
from statefulstreamprocessor_ray.functions.streams import derive_streams
from statefulstreamprocessor_ray.stages.join import ordered_join_events


@pytest.mark.usefixtures("ray_session")
def test_salted_equals_plain_on_skewed_corpus(tmp_path):
    import ray.data

    tbl = fixtures.skewed_transcripts()  # 1 hot conv (50k turns) + 999 x 50
    path = str(tmp_path / "t")
    fixtures.write_transcripts(tbl, path, n_files=4)

    def run(hot_threshold):
        tagged = derive_streams(ray.data.read_parquet(path))
        out = ordered_join_events(
            tagged, delta_time=10.0, hot_key_threshold=hot_threshold,
            hot_chunk_rows=4000,
        ).to_pandas()
        cols = list(out.columns)
        return out.sort_values(cols).reset_index(drop=True)

    plain = run(None)
    salted = run(5000)  # only the hot conv exceeds this; chunked into ~12 parts
    assert len(plain) > 40_000
    pd.testing.assert_frame_equal(plain, salted)
    # sanity: the hot conv really went through the salted path
    assert (plain.conv_id == "hot").sum() > 40_000
