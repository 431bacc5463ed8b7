"""Property-based check of stages/windowfns against a pandas reference.

Two regimes, because determinism differs:
- UNIQUE order values per partition: row_number / lag / lead / cumsum
  are all total-order-determined, so every cell must match pandas
  shift/cumcount/cumsum exactly (including NULL handling: lag/lead are
  null at partition edges, cumsum skips nulls like SQL SUM).
- TIED / NULL order values: only rank & dense_rank are well-defined
  (they depend on order VALUES, not sort stability); engine output
  must equal pandas rank(method='min'/'dense', na_option='bottom') —
  nulls sort last and rank as one peer group.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _ds(df: pd.DataFrame):
    import ray.data as rd

    return rd.from_pandas(df).repartition(3)


rows_unique_st = st.lists(
    st.tuples(
        st.integers(0, 3),                                  # key
        st.one_of(st.none(), st.integers(0, 20)),           # value (nullable)
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=rows_unique_st)
def _case_unique_order(rows):
    from etl_reconciliate_ray.stages.windowfns import window_functions

    df = pd.DataFrame({
        "k": [k for k, _ in rows],
        "o": range(len(rows)),  # globally unique -> total order per key
        "v": [v for _, v in rows],
    })
    out = (
        window_functions(
            _ds(df), key="k", order_by=["o"], row_number="rn",
            lag={"prev": "v"}, lead={"nxt": "v"}, cumsum={"cum": "v"},
            first_value={"fv": "v"}, last_value={"lv": "v"},
            group_min={"gmin": "o"}, group_max={"gmax": "o"},
            group_sum={"gsum": "o"}, group_count="gcnt",
            num_buckets=3,
        )
        .to_pandas()
        .sort_values(["k", "o"])
        .reset_index(drop=True)
    )
    sdf = df.sort_values(["k", "o"]).reset_index(drop=True)
    g = sdf.groupby("k")
    exp_rn = (g.cumcount() + 1).tolist()
    exp_prev = g["v"].shift(1)
    exp_nxt = g["v"].shift(-1)
    exp_cum = g["v"].transform(lambda s: s.fillna(0).cumsum()).astype(int).tolist()
    # whole-partition frame: the partition's first/last v in o-order,
    # INCLUDING nulls (FIRST_VALUE does not skip nulls without
    # IGNORE NULLS, which we don't implement)
    exp_fv = g["v"].transform(lambda s: [s.iloc[0]] * len(s))
    exp_lv = g["v"].transform(lambda s: [s.iloc[-1]] * len(s))
    assert out["rn"].tolist() == exp_rn
    assert out["cum"].tolist() == exp_cum
    # partition MIN/MAX over the (null-free) order column
    assert out["gmin"].tolist() == g["o"].transform("min").tolist()
    assert out["gmax"].tolist() == g["o"].transform("max").tolist()
    assert out["gsum"].tolist() == g["o"].transform("sum").tolist()
    assert out["gcnt"].tolist() == g["o"].transform("size").tolist()
    for got, want in ((out["prev"], exp_prev), (out["nxt"], exp_nxt),
                      (out["fv"], exp_fv), (out["lv"], exp_lv)):
        for a, b in zip(got.tolist(), want.tolist()):
            assert (pd.isna(a) and pd.isna(b)) or a == b, (got.tolist(), want.tolist())


rows_tied_st = st.lists(
    st.tuples(
        st.integers(0, 2),                                  # key
        st.one_of(st.none(), st.integers(0, 4)),            # order: ties + nulls
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=rows_tied_st)
def _case_tied_order(rows):
    from etl_reconciliate_ray.stages.windowfns import window_functions

    df = pd.DataFrame({
        "k": [k for k, _ in rows],
        "o": [o for _, o in rows],
    })
    out = window_functions(
        _ds(df), key="k", order_by=["o"], rank="r", dense_rank="d", num_buckets=3
    ).to_pandas()
    exp_r = df.groupby("k")["o"].rank(method="min", na_option="bottom").astype(int)
    exp_d = df.groupby("k")["o"].rank(method="dense", na_option="bottom").astype(int)
    # tie groups share one rank, so compare the per-(k, o) rank maps
    key = list(zip(df["k"], df["o"].fillna(-1)))
    want = {kk: (r, d) for kk, r, d in zip(key, exp_r, exp_d)}
    okey = list(zip(out["k"], out["o"].fillna(-1)))
    got = {kk: (r, d) for kk, r, d in zip(okey, out["r"], out["d"])}
    assert got == want


def test_window_functions_fuzz_unique_order(ray_session):
    _case_unique_order()


def test_window_functions_fuzz_tied_order(ray_session):
    _case_tied_order()


def test_null_partition_keys_are_one_group(ray_session):
    """Null keys of NUMERIC type must form ONE partition (SQL PARTITION
    BY NULL; string keys already did): raw numpy != fragments NaN keys
    into a segment per row. Same rule for session windows and NaT
    ORDER BY peers."""
    import pyarrow as pa
    import ray.data as rd

    from etl_reconciliate_ray.stages.windowfns import window_functions
    from etl_reconciliate_ray.stages.windows import session_window_agg

    t = pa.table({
        "k": pa.array([1, 1, None, None], pa.int64()),
        "o": pa.array([1, 2, 3, 4], pa.int64()),
    })
    out = (window_functions(rd.from_arrow(t), "k", ["o"],
                            row_number="rn", group_count="n")
           .to_pandas().sort_values("o").reset_index(drop=True))
    nulls = out[out["k"].isna()]
    assert sorted(nulls["rn"]) == [1, 2] and set(nulls["n"]) == {2}

    ev = pa.table({
        "user_id": pa.array([None, None], pa.int64()),
        "ts": pa.array([1_000_000, 2_000_000], pa.timestamp("us")),
        "event_id": pa.array([1, 2], pa.int64()),
    })
    ses = session_window_agg(rd.from_arrow(ev), key="user_id",
                             gap_minutes=30).to_pandas()
    assert len(ses) == 1 and int(ses["n_events"][0]) == 2


def test_rank_nat_order_values_are_peers(ray_session):
    """Tied NULL timestamps in ORDER BY are rank peers (the float path
    already was; NaT != NaT previously started a new tie-run)."""
    import pyarrow as pa
    import ray.data as rd

    from etl_reconciliate_ray.stages.windowfns import window_functions

    t = pa.table({
        "k": pa.array(["a", "a", "a"], pa.string()),
        "ts": pa.array([1_000_000, None, None], pa.timestamp("us")),
        "id": pa.array([1, 2, 3], pa.int64()),
    })
    out = (window_functions(rd.from_arrow(t), "k", ["ts"], rank="r",
                            keep=["k", "ts", "id"])
           .to_pandas().sort_values("id").reset_index(drop=True))
    assert out["r"].tolist() == [1, 2, 2]


def test_hopping_counts_null_ts_once(ray_session):
    """A null-ts event lands in the NULL window exactly once — the
    shift replication previously counted it width/hop times while
    tumbling counted it once."""
    import pyarrow as pa
    import ray.data as rd

    from etl_reconciliate_ray.stages.windows import (
        hopping_window_agg, tumbling_window_agg,
    )

    t = pa.table({
        "ts": pa.array([3_600_000_000, None], pa.timestamp("us")),
        "event_type": pa.array(["x", "x"], pa.string()),
    })
    hop = hopping_window_agg(rd.from_arrow(t), keys=["event_type"],
                             width_minutes=60, hop_minutes=30).to_pandas()
    tum = tumbling_window_agg(rd.from_arrow(t), keys=["event_type"],
                              width="hour").to_pandas()
    hop_null = hop[hop["window_start"].isna()]
    tum_null = tum[tum["window_start"].isna()]
    assert int(hop_null["n"].sum()) == 1 == int(tum_null["n"].sum())
