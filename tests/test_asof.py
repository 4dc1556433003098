"""asof_join: backward-inclusive temporal join via the union-and-fill
formulation (one shuffle, no row multiplication). DuckDB native ASOF
JOIN parity is graded by tests/test_entry_contract.py (asof_enrich)."""

from __future__ import annotations

import pytest

from arlas_proc_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    facts = spark.createDataFrame(
        [(1, "u1", 10, "a"), (2, "u1", 25, "b"), (3, "u1", 5, "c"),
         (4, "u2", 50, "d"), (5, "u3", 7, "e")],
        "fid long, user string, ts long, tag string")
    dims = spark.createDataFrame(
        [("u1", 10, 1.0), ("u1", 20, 2.0), ("u2", 60, 9.0)],
        "user string, ts long, price double")
    return facts, dims


def test_backward_inclusive_semantics(frames):
    facts, dims = frames
    out = asof_join(facts, dims, ["user"], "ts")
    got = {r.fid: r.price for r in out.collect()}
    assert got == {
        1: 1.0,   # tie: dim AT left ts matches (inclusive)
        2: 2.0,   # latest of the two earlier versions
        3: None,  # no version yet
        4: None,  # dim is in the future
        5: None,  # key never appears on the right
    }
    # left rows/columns pass through untouched
    assert set(out.columns) == {"fid", "user", "ts", "tag", "price"}
    assert out.count() == facts.count()


def test_collision_suffix_and_right_cols(spark, frames):
    facts, dims = frames
    dims2 = dims.withColumnRenamed("price", "tag")  # collides with left
    out = asof_join(facts, dims2, ["user"], "ts")
    assert "tag_asof" in out.columns and "tag" in out.columns
    got = {r.fid: r.tag_asof for r in out.collect()}
    assert got[2] == 2.0 and got[3] is None
    with pytest.raises(ValueError, match="no payload columns"):
        asof_join(facts, dims.select("user", "ts"), ["user"], "ts")


def test_single_shuffle_no_row_explosion(spark):
    """The scale property: a hot key with many versions must not
    multiply rows (the naive range-join does), and the plan carries
    exactly one exchange — the keyed window partition."""
    facts = spark.range(200).selectExpr(
        "id AS fid", "'hot' AS user", "id * 10 AS ts")
    dims = spark.range(1000).selectExpr(
        "'hot' AS user", "id AS ts", "id * 1.0 AS v")
    out = asof_join(facts, dims, ["user"], "ts")
    rows = out.collect()
    assert len(rows) == 200  # no multiplication despite 1000 versions
    assert {r.fid: r.v for r in rows}[5] == 50.0  # ts=50 -> version 50
    plan = out._jdf.queryExecution().executedPlan().toString()
    # AQE prints Final + Initial plans; count exchanges in the final only
    plan = plan.split("== Initial Plan ==")[0]
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_scd2_history_windows(spark):
    from arlas_proc_spark.operators.scd import scd2_history
    df = spark.createDataFrame(
        [("k1", 1, "a"), ("k1", 5, "b"), ("k1", 9, "c"), ("k2", 3, "x")],
        "k string, ts long, v string")
    out = {(r.k, r.ts): (r.valid_from, r.valid_to, r.is_current)
           for r in scd2_history(df, ["k"], "ts").collect()}
    assert out == {
        ("k1", 1): (1, 5, False),
        ("k1", 5): (5, 9, False),
        ("k1", 9): (9, None, True),
        ("k2", 3): (3, None, True),
    }


def test_scd2_feeds_asof_join(spark):
    """The two CDC-consumer shapes compose: an asof fact lookup agrees
    with a range predicate over the SCD2 windows."""
    from arlas_proc_spark.operators.scd import scd2_history
    dims = spark.createDataFrame(
        [("k1", 1, "a"), ("k1", 5, "b"), ("k1", 9, "c")],
        "k string, ts long, v string")
    facts = spark.createDataFrame(
        [(1, "k1", 0), (2, "k1", 5), (3, "k1", 7), (4, "k1", 99)],
        "fid long, k string, fts long")
    via_asof = {r.fid: r.v for r in
                asof_join(facts, dims, ["k"], "fts", right_ts="ts",
                          right_cols=["v"]).collect()}
    hist = scd2_history(dims, ["k"], "ts")
    via_scd = {r.fid: r.v for r in facts.join(
        hist, on=[facts.k == hist.k, facts.fts >= hist.valid_from,
                  (hist.valid_to.isNull()) | (facts.fts < hist.valid_to)],
        how="left").select("fid", "v").collect()}
    assert via_asof == via_scd == {1: None, 2: "b", 3: "b", 4: "c"}


# ---------------------------------------------------------------- property
# pandas' own merge_asof (backward, inclusive) is an independent oracle:
# hypothesis explores empty sides, single-key pileups, all-future dims,
# and exact-tie timestamps the fixed fixtures miss.
import pandas as pd  # noqa: E402
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_KEYS = ["k0", "k1", "k2"]


@st.composite
def asof_cases(draw):
    facts = [(i, draw(st.sampled_from(_KEYS)),
              draw(st.integers(0, 30)))
             for i in range(draw(st.integers(1, 12)))]
    n_dims = draw(st.integers(0, 10))
    # unique (key, ts) on the right — the operator's version contract
    pairs = draw(st.lists(
        st.tuples(st.sampled_from(_KEYS), st.integers(0, 30)),
        min_size=n_dims, max_size=n_dims, unique=True))
    dims = [(k, ts, float(i)) for i, (k, ts) in enumerate(pairs)]
    return facts, dims


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(asof_cases(), st.sampled_from(["backward", "forward"]))
def test_asof_matches_pandas_merge_asof(spark, case, direction):
    facts, dims = case
    f = spark.createDataFrame(facts, "fid long, k string, ts long")
    if dims:
        d = spark.createDataFrame(dims, "k string, ts long, v double")
    else:
        d = spark.createDataFrame([], "k string, ts long, v double")
    got = {r.fid: r.v for r in
           asof_join(f, d, ["k"], "ts", direction=direction).collect()}
    fp = (pd.DataFrame(facts, columns=["fid", "k", "ts"])
          .astype({"fid": "int64", "ts": "int64"}).sort_values("ts"))
    dp = (pd.DataFrame(dims, columns=["k", "ts", "v"])
          .astype({"ts": "int64", "v": "float64"}).sort_values("ts"))
    m = pd.merge_asof(fp, dp, on="ts", by="k",
                      direction=direction, allow_exact_matches=True)
    want = {int(r.fid): (None if pd.isna(r.v) else float(r.v))
            for r in m.itertuples()}
    assert got == want


def test_forward_direction_semantics(frames):
    facts, dims = frames
    out = asof_join(facts, dims, ["user"], "ts", direction="forward")
    got = {r.fid: r.price for r in out.collect()}
    assert got == {
        1: 1.0,   # tie: version AT left ts matches forward too
        2: None,  # nothing at/after ts=25 for u1
        3: 1.0,   # next version up
        4: 9.0,   # the future dim is exactly what forward wants
        5: None,
    }
    with pytest.raises(ValueError, match="direction"):
        asof_join(facts, dims, ["user"], "ts", direction="nearest")
