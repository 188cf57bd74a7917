"""CEP sequence-pattern operator tests: hand-built corpus with known matches,
overlap semantics, span constraint, cross-key isolation, and a naive-walk
differential on random data."""

import numpy as np
import pyarrow as pa
import pytest

from statefulstreamprocessor_ray.stages.cep import match_sequence

US = 1_000_000


def _ds(rows):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.string()),
                "event_id": pa.array([r[1] for r in rows], pa.int64()),
                "ts": pa.array([r[2] * US for r in rows], pa.timestamp("us")),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
            }
        )
    )


def _matches(out):
    t = out.to_pandas()
    if t.empty:  # zero matches: Ray loses the schema (see project memory)
        return []
    t = t.sort_values(["user_id", "start_event_id"])
    return list(
        zip(t["user_id"], t["start_event_id"], t["end_event_id"], t["span_us"])
    )


def test_basic_match_and_contiguity(ray_session):
    rows = [
        ("u1", 1, 10, "view"),
        ("u1", 2, 20, "click"),
        ("u1", 3, 30, "purchase"),   # match 1-3
        ("u1", 4, 40, "view"),
        ("u1", 5, 50, "error"),      # breaks contiguity
        ("u1", 6, 60, "click"),
        ("u1", 7, 70, "purchase"),
    ]
    out = match_sequence(_ds(rows), ["view", "click", "purchase"])
    assert _matches(out) == [("u1", 1, 3, 20 * US)]


def test_overlapping_matches_all_reported(ray_session):
    rows = [("u1", i, 10 * i, "a") for i in range(1, 5)]  # a a a a
    out = match_sequence(_ds(rows), ["a", "a"])
    assert _matches(out) == [("u1", 1, 2, 10 * US), ("u1", 2, 3, 10 * US), ("u1", 3, 4, 10 * US)]


def test_within_constraint(ray_session):
    rows = [
        ("u1", 1, 0, "a"),
        ("u1", 2, 100, "b"),   # span 100s
        ("u1", 3, 101, "a"),
        ("u1", 4, 102, "b"),   # span 1s
    ]
    out = match_sequence(_ds(rows), ["a", "b"], within_s=10.0)
    assert _matches(out) == [("u1", 3, 4, 1 * US)]


def test_no_cross_key_match(ray_session):
    rows = [("u1", 1, 10, "a"), ("u2", 2, 20, "b")]
    out = match_sequence(_ds(rows), ["a", "b"])
    assert _matches(out) == []


def test_single_step_pattern_is_filter(ray_session):
    rows = [("u1", 1, 10, "a"), ("u1", 2, 20, "b"), ("u2", 3, 30, "a")]
    out = match_sequence(_ds(rows), ["a"])
    assert _matches(out) == [("u1", 1, 1, 0), ("u2", 3, 3, 0)]


def test_empty_pattern_raises(ray_session):
    with pytest.raises(ValueError):
        match_sequence(_ds([("u1", 1, 10, "a")]), [])


def test_differential_vs_naive_walk(ray_session):
    rng = np.random.default_rng(7)
    rows = []
    eid = 0
    for u in range(8):
        t = 0
        for _ in range(rng.integers(5, 40)):
            t += int(rng.integers(1, 50))
            eid += 1
            rows.append((f"u{u}", eid, t, str(rng.choice(["a", "b", "c"]))))
    pattern, within = ["a", "b"], 60.0
    out = set(_matches(match_sequence(_ds(rows), pattern, within_s=within)))

    expect = set()
    by_key = {}
    for u, i, t, e in rows:
        by_key.setdefault(u, []).append((t, i, e))
    for u, evs in by_key.items():
        evs.sort()
        for j in range(len(evs) - 1):
            if (
                evs[j][2] == "a"
                and evs[j + 1][2] == "b"
                and evs[j + 1][0] - evs[j][0] <= within
            ):
                expect.add((u, evs[j][1], evs[j + 1][1], (evs[j + 1][0] - evs[j][0]) * US))
    assert out == expect and len(expect) > 0


def test_skip_mode_basic(ray_session):
    rows = [
        ("u1", 1, 10, "a"),
        ("u1", 2, 20, "x"),   # gap event — skip mode tolerates
        ("u1", 3, 30, "b"),
        ("u1", 4, 40, "x"),
        ("u1", 5, 50, "c"),
    ]
    strict = match_sequence(_ds(rows), ["a", "b", "c"])
    skip = match_sequence(_ds(rows), ["a", "b", "c"], contiguity="skip")
    assert _matches(strict) == []
    assert _matches(skip) == [("u1", 1, 5, 40 * US)]


def test_skip_binds_next_occurrence(ray_session):
    # a at 10; b at 20 and 30 -> the match must bind b@20, not b@30
    rows = [("u1", 1, 10, "a"), ("u1", 2, 20, "b"), ("u1", 3, 30, "b")]
    out = match_sequence(_ds(rows), ["a", "b"], contiguity="skip")
    assert _matches(out) == [("u1", 1, 2, 10 * US)]


def test_skip_one_match_per_start(ray_session):
    rows = [
        ("u1", 1, 10, "a"),
        ("u1", 2, 20, "a"),
        ("u1", 3, 30, "b"),
    ]
    out = match_sequence(_ds(rows), ["a", "b"], contiguity="skip")
    assert _matches(out) == [("u1", 1, 3, 20 * US), ("u1", 2, 3, 10 * US)]


def test_skip_no_cross_key(ray_session):
    rows = [("u1", 1, 10, "a"), ("u2", 2, 20, "b")]
    out = match_sequence(_ds(rows), ["a", "b"], contiguity="skip")
    assert _matches(out) == []


def test_skip_missing_step_everywhere(ray_session):
    rows = [("u1", 1, 10, "a"), ("u1", 2, 20, "a")]
    out = match_sequence(_ds(rows), ["a", "zzz"], contiguity="skip")
    assert _matches(out) == []


def test_bad_contiguity_raises(ray_session):
    with pytest.raises(ValueError):
        match_sequence(_ds([("u1", 1, 10, "a")]), ["a"], contiguity="relaxed")


def test_skip_differential_vs_naive_walk(ray_session):
    rng = np.random.default_rng(11)
    rows = []
    eid = 0
    for u in range(8):
        t = 0
        for _ in range(rng.integers(5, 40)):
            t += int(rng.integers(1, 50))
            eid += 1
            rows.append((f"u{u}", eid, t, str(rng.choice(["a", "b", "c"]))))
    pattern, within = ["a", "b", "c"], 200.0
    out = set(_matches(match_sequence(_ds(rows), pattern, within_s=within, contiguity="skip")))

    expect = set()
    by_key = {}
    for u, i, t, e in rows:
        by_key.setdefault(u, []).append((t, i, e))
    for u, evs in by_key.items():
        evs.sort()
        for j0 in range(len(evs)):
            if evs[j0][2] != pattern[0]:
                continue
            j, chain = j0, [j0]
            ok = True
            for step in pattern[1:]:
                nxt = next((jj for jj in range(j + 1, len(evs)) if evs[jj][2] == step), None)
                if nxt is None:
                    ok = False
                    break
                chain.append(nxt)
                j = nxt
            if ok and evs[chain[-1]][0] - evs[j0][0] <= within:
                expect.add((u, evs[j0][1], evs[chain[-1]][1], (evs[chain[-1]][0] - evs[j0][0]) * US))
    assert out == expect and len(expect) > 0


def test_absence_basic(ray_session):
    from statefulstreamprocessor_ray.stages.cep import detect_absence

    rows = [
        ("u1", 1, 10, "a"),   # followed by b at 15 (within 10) -> not emitted
        ("u1", 2, 15, "b"),
        ("u1", 3, 100, "a"),  # next b at 150, outside 10 -> emitted
        ("u1", 4, 150, "b"),
        ("u2", 5, 10, "a"),   # no b for u2 at all -> emitted
    ]
    out = detect_absence(_ds(rows), first="a", absent="b", within_s=10.0)
    t = out.to_pandas().sort_values("event_id")
    assert list(t["event_id"]) == [3, 5]
    assert list(t["deadline_us"]) == [110 * US, 20 * US]


def test_absence_boundary_inclusive(ray_session):
    from statefulstreamprocessor_ray.stages.cep import detect_absence

    rows = [("u1", 1, 10, "a"), ("u1", 2, 20, "b")]  # exactly at within
    out = detect_absence(_ds(rows), first="a", absent="b", within_s=10.0)
    assert out.count() == 0  # b at ts+within counts as followed


def test_absence_same_event_type(ray_session):
    from statefulstreamprocessor_ray.stages.cep import detect_absence

    rows = [("u1", 1, 10, "a"), ("u1", 2, 12, "a"), ("u1", 3, 100, "a")]
    out = detect_absence(_ds(rows), first="a", absent="a", within_s=10.0)
    # a@10 followed by a@12; a@12 not followed within 10; a@100 last
    t = out.to_pandas().sort_values("event_id")
    assert list(t["event_id"]) == [2, 3]
