"""Relational equi-joins: broadcast + partitioned variants vs pandas merge."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from statefulstreamprocessor_ray.stages import relational


def _frames(seed=3, n_left=5000, n_right=800):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 1000, n_left).astype(np.int64),
            "lval": np.arange(n_left, dtype=np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "rk": rng.choice(1000, n_right, replace=False).astype(np.int64),
            "rval": np.arange(n_right, dtype=np.int64),
        }
    )
    return left, right


def _sorted(df):
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("how", ["inner", "left"])
def test_broadcast_join_matches_pandas(how):
    left, right = _frames()
    got = relational.broadcast_join(
        ray.data.from_pandas(left), right, left_on="k", right_on="rk", how=how
    ).to_pandas()
    want = left.merge(right, how=how, left_on="k", right_on="rk")
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want), check_dtype=False)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("how", ["inner", "left"])
def test_partitioned_join_matches_pandas(how):
    left, right = _frames(seed=7)
    got = relational.partitioned_join(
        ray.data.from_pandas(left),
        ray.data.from_pandas(right),
        left_on="k",
        right_on="rk",
        how=how,
        n_shards=13,
    ).to_pandas()
    want = left.merge(right, how=how, left_on="k", right_on="rk")
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want), check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_partitioned_join_preserves_int_dtypes_and_big_keys():
    """Regression (ADVICE r2, high): the pandas-based shard merge widened int
    columns with NaN-backed nulls to float64, losing precision above 2^53.
    The Arrow merge must keep int64 keys (incl. a 2^60 value) and int32
    payloads exact, in inner AND left joins."""
    import pyarrow as pa

    left = pd.DataFrame(
        {"k": np.array([1, 2, 3, 2**60], np.int64), "lval": np.arange(4, dtype=np.int64)}
    )
    right = pd.DataFrame(
        {"rk": np.array([2, 3, 2**60], np.int64), "rval": np.array([5, 6, 7], np.int32)}
    )
    for how, want_rows in (("inner", 3), ("left", 4)):
        out = relational.partitioned_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right),
            left_on="k",
            right_on="rk",
            how=how,
            n_shards=5,
        )
        t = pa.concat_tables(out.iter_batches(batch_size=None, batch_format="pyarrow"))
        assert t.schema.field("k").type == pa.int64()
        assert t.schema.field("rval").type == pa.int32()
        assert t.num_rows == want_rows
        assert 2**60 in t["k"].to_pylist()


@pytest.mark.usefixtures("ray_session")
def test_partitioned_join_reconciles_or_rejects_key_types():
    """Equal key values must land on the same shard: int32⋈int64 widens both
    keys to int64; int⋈float raises (lossy above 2^53) instead of silently
    dropping every match."""
    import pyarrow as pa

    left32 = pd.DataFrame({"k": np.array([1, 2, 3], np.int32), "lval": [1, 2, 3]})
    right = pd.DataFrame({"rk": np.array([2, 3, 9], np.int64), "rval": [5, 6, 7]})
    t = pa.concat_tables(
        relational.partitioned_join(
            ray.data.from_pandas(left32),
            ray.data.from_pandas(right),
            left_on="k",
            right_on="rk",
            n_shards=3,
        ).iter_batches(batch_size=None, batch_format="pyarrow")
    )
    assert t.schema.field("k").type == pa.int64()
    assert sorted(t["k"].to_pylist()) == [2, 3]

    rightf = right.assign(rk=right["rk"].astype(np.float64))
    with pytest.raises(ValueError, match="key type mismatch"):
        relational.partitioned_join(
            ray.data.from_pandas(left32),
            ray.data.from_pandas(rightf),
            left_on="k",
            right_on="rk",
        )


@pytest.mark.usefixtures("ray_session")
def test_partitioned_join_rejects_column_collision():
    left = pd.DataFrame({"k": [1], "v": [2]})
    right = pd.DataFrame({"k": [1], "v": [3]})
    with pytest.raises(ValueError, match="overlapping"):
        relational.partitioned_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right), left_on="k"
        )


@pytest.mark.usefixtures("ray_session")
def test_partitioned_join_null_keys_follow_sql_semantics():
    # SQL/Acero semantics: a NULL key matches NOTHING (pandas merge would
    # match NaN<->NaN). Inner drops null-key rows; left keeps them with
    # null right columns — exactly what the DuckDB oracle computes.
    import pyarrow as pa

    left = pa.table(
        {"k": pa.array([1, None, 2, None], pa.int64()),
         "lval": pa.array(np.arange(4, dtype=np.int64))}
    )
    right = pa.table(
        {"k": pa.array([1, None, 3], pa.int64()),
         "rval": pa.array(np.arange(3, dtype=np.int64))}
    )
    inner = relational.partitioned_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right), "k", how="inner"
    ).to_pandas()
    assert inner["k"].tolist() == [1] and inner["rval"].tolist() == [0]

    lj = relational.partitioned_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right), "k", how="left"
    ).to_pandas()
    assert len(lj) == 4
    matched = lj[lj["k"].notna() & (lj["k"] == 1)]
    assert matched["rval"].tolist() == [0]
    assert lj[lj["k"].isna()]["rval"].isna().all()


@pytest.mark.usefixtures("ray_session")
def test_partitioned_join_semi_anti():
    """semi = left rows whose key exists on the right (left columns only,
    no duplication on multi-matches); anti = the complement; null keys match
    nothing (SQL semantics) so they survive only the anti join."""
    import pyarrow as pa

    left = pa.table(
        {
            "k": pa.array([1, 2, 2, 3, None], pa.int64()),
            "lval": pa.array(np.arange(5, dtype=np.int64)),
        }
    )
    right = pa.table({"rk": pa.array([2, 2, 9, None], pa.int64())})
    semi = relational.partitioned_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        left_on="k", right_on="rk", how="semi", n_shards=3,
    ).to_pandas()
    assert semi.columns.tolist() == ["k", "lval"]
    assert sorted(semi["lval"].tolist()) == [1, 2]  # both k=2 rows, once each
    anti = relational.partitioned_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        left_on="k", right_on="rk", how="anti", n_shards=3,
    ).to_pandas()
    assert sorted(anti["lval"].tolist()) == [0, 3, 4]  # incl. the null key


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("how", ["semi", "anti", "inner", "left", "right", "outer"])
def test_partitioned_join_empty_sides(how):
    """An entirely empty side must not kill the join: Ray's hash-shuffle join
    grants the aggregator schema broadcast only to the first submitted block
    and a zero-row first block used to eat it (schema-less partitions ->
    Acero FieldRef error). Guarded by the null-key sentinel union + the
    send_empty_blocks flag patch in relational.py."""
    import pyarrow as pa

    full_l = pa.table(
        {
            "k": pa.array([1, 2, 3], pa.int64()),
            "lval": pa.array([10, 20, 30], pa.int64()),
        }
    )
    full_r = pa.table({"rk": pa.array([2, 3, 4], pa.int64())})
    empty_l = full_l.slice(0, 0)
    empty_r = full_r.slice(0, 0)

    def run(lt, rt):
        return relational.partitioned_join(
            ray.data.from_arrow(lt), ray.data.from_arrow(rt),
            left_on="k", right_on="rk", how=how, n_shards=3,
        ).to_pandas()

    # empty right: semi/inner/right -> nothing (right: no right rows to
    # emit), anti/left/outer -> all left
    er = run(full_l, empty_r)
    assert len(er) == {
        "semi": 0, "inner": 0, "anti": 3, "left": 3, "right": 0, "outer": 3,
    }[how]
    if how == "anti":
        assert sorted(er["lval"].tolist()) == [10, 20, 30]
    if how in ("left", "outer"):
        assert er["rk"].isna().all()

    # empty left: right/outer emit all right rows with null left columns
    el = run(empty_l, full_r)
    assert len(el) == {
        "semi": 0, "inner": 0, "anti": 0, "left": 0, "right": 3, "outer": 3,
    }[how]
    if how in ("right", "outer"):
        assert el["k"].isna().all() and el["lval"].isna().all()
        assert sorted(el["rk"].tolist()) == [2, 3, 4]

    # both empty: always zero rows
    assert len(run(empty_l, empty_r)) == 0


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("how", ["right", "outer"])
def test_partitioned_join_right_outer_vs_duckdb(how):
    """DuckDB differential for the r5 right/full-outer modes: null keys
    match nothing but their rows still surface on their own side; the
    coalesced key is re-split into l.k / r.rk with side-match masks."""
    import duckdb
    import pandas as pd
    import pyarrow as pa

    left = pa.table(
        {
            "k": pa.array([1, 2, 3, None, 5], pa.int64()),
            "lval": pa.array([10, 20, 30, 40, 50], pa.int64()),
        }
    )
    right = pa.table(
        {
            "rk": pa.array([2, 3, 4, None], pa.int64()),
            "rval": pa.array([200, 300, 400, 500], pa.int64()),
        }
    )
    got = relational.partitioned_join(
        ray.data.from_arrow(left),
        ray.data.from_arrow(right),
        left_on="k",
        right_on="rk",
        how=how,
        n_shards=3,
    ).to_pandas()
    con = duckdb.connect()
    con.register("l", left.to_pandas())
    con.register("r", right.to_pandas())
    kind = {"right": "RIGHT", "outer": "FULL"}[how]
    want = con.sql(
        f"SELECT l.k, l.lval, r.rk, r.rval FROM l {kind} JOIN r ON l.k = r.rk"
    ).fetchdf()
    cols = ["k", "rk", "lval", "rval"]
    g = got.sort_values(cols, na_position="last").reset_index(drop=True)
    w = want.sort_values(cols, na_position="last").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        g.astype("float64"), w.astype("float64"), check_dtype=False
    )


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("how", ["inner", "left", "right", "outer", "semi", "anti"])
def test_partitioned_join_composite_keys_vs_duckdb(how):
    """Composite (multi-column, same-name) keys across every mode: Acero
    coalesces same-name keys (USING semantics); a null in ANY key component
    matches nothing."""
    import duckdb
    import pandas as pd
    import pyarrow as pa

    left = pa.table(
        {
            "a": pa.array([1, 1, 2, 2, None], pa.int64()),
            "b": pa.array(["x", "y", "x", None, "x"], pa.string()),
            "lval": pa.array([1, 2, 3, 4, 5], pa.int64()),
        }
    )
    right = pa.table(
        {
            "a": pa.array([1, 2, 2, None], pa.int64()),
            "b": pa.array(["x", "x", "z", "x"], pa.string()),
            "rval": pa.array([10, 20, 30, 40], pa.int64()),
        }
    )
    got = relational.partitioned_join(
        ray.data.from_arrow(left),
        ray.data.from_arrow(right),
        left_on=["a", "b"],
        how=how,
        n_shards=3,
    ).to_pandas()
    con = duckdb.connect()
    con.register("l", left.to_pandas())
    con.register("r", right.to_pandas())
    if how in ("semi", "anti"):
        neg = "NOT" if how == "anti" else ""
        want = con.sql(
            f"SELECT a, b, lval FROM l WHERE {neg} EXISTS "
            "(SELECT 1 FROM r WHERE r.a = l.a AND r.b = l.b)"
        ).fetchdf()
        cols = ["a", "b", "lval"]
    else:
        kind = {
            "inner": "JOIN", "left": "LEFT JOIN",
            "right": "RIGHT JOIN", "outer": "FULL JOIN",
        }[how]
        want = con.sql(
            "SELECT coalesce(l.a, r.a) AS a, coalesce(l.b, r.b) AS b, "
            f"l.lval, r.rval FROM l {kind} r ON l.a = r.a AND l.b = r.b"
        ).fetchdf()
        cols = ["a", "b", "lval", "rval"]
    g = got[cols].sort_values(cols, na_position="last").reset_index(drop=True)
    w = want[cols].sort_values(cols, na_position="last").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        g.astype(object), w.astype(object), check_dtype=False
    )


@pytest.mark.usefixtures("ray_session")
def test_partitioned_join_composite_distinct_names_rejected():
    import pyarrow as pa

    t = pa.table({"a": pa.array([1], pa.int64()), "b": pa.array([1], pa.int64())})
    with pytest.raises(ValueError, match="identical names"):
        relational.partitioned_join(
            ray.data.from_arrow(t),
            ray.data.from_arrow(t.rename_columns(["a", "c"])),
            left_on=["a", "b"],
            right_on=["a", "c"],
        )
