"""FIXTURES.md F10: golden end-to-end corpus — count and first/last output
rows frozen at first generation (the engine analog of the reference's
5000-events -> 1595-joins golden assert, ``test_kafka_eos_joiner.py:276-284``).
Any change to fixture generation, stream derivation, ordering, or join
semantics trips this test."""

import pytest

from statefulstreamprocessor_ray import fixtures
from statefulstreamprocessor_ray.pipelines.flagship import flagship_join

GOLDEN_COUNT = 635
GOLDEN_FIRST = {"r_text": "a3#0", "s_text": "t4#0", "join_case": "JR2",
                "r_ts_us": 1_600_000_615_643_448, "s_ts_us": 1_600_000_615_778_931}
GOLDEN_LAST = {"r_text": "a4955#0", "s_text": "t4956#0", "join_case": "JR2",
               "r_ts_us": 1_600_005_850_756_302, "s_ts_us": 1_600_005_851_542_320}


@pytest.mark.usefixtures("ray_session")
def test_golden_corpus_frozen():
    import ray.data

    tbl = fixtures.transcripts_table(n_convs=1, turns_per_conv=5000, seed=10)
    out = (
        flagship_join(ray.data.from_arrow(tbl), delta_time=1.0)
        .to_pandas()
        .sort_values("emit_seq")
        .reset_index(drop=True)
    )
    assert len(out) == GOLDEN_COUNT
    for golden, row in ((GOLDEN_FIRST, out.iloc[0]), (GOLDEN_LAST, out.iloc[-1])):
        assert row.r_text == golden["r_text"]
        assert row.s_text == golden["s_text"]
        assert row.join_case == golden["join_case"]
        assert row.r_ts.value // 1000 == golden["r_ts_us"]
        assert row.s_ts.value // 1000 == golden["s_ts_us"]
    assert list(out.emit_seq) == list(range(GOLDEN_COUNT))
