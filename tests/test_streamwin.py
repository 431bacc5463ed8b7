"""Watermark-window semantics (stages/streamwin): planted-lateness
exactness, the streaming accumulator's emit-once / drop-notice
contract vs the batch operator, and the driver state budget refusal."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from etl_reconciliate_ray.stages.streamwin import (
    WatermarkWindowStream,
    epoch_watermarks,
    watermark_window_agg,
)

US = 1_000_000
H = 3600 * US


def _fixture() -> pa.Table:
    """3 arrival epochs, 1 h windows, 0.5 h lateness; every behavior
    planted: in-window accept, within-lateness straggler accept,
    past-watermark late drop, still-open tail windows."""
    rows = [
        (0, 0.5, "a", 1.0),   # window [0,1)
        (0, 1.2, "a", 2.0),   # window [1,2)
        (1, 0.1, "a", 4.0),   # straggler, but [0,1) not closed yet (wm=0.7h) -> accepted
        (1, 3.5, "a", 8.0),   # advances watermark to 3.0h
        (2, 0.2, "a", 16.0),  # [0,1) closed at 3.0h watermark -> LATE
        (2, 3.9, "b", 32.0),  # open tail window
    ]
    return pa.table({
        "epoch": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([int(r[1] * H) for r in rows], pa.timestamp("us")),
        "k": pa.array([r[2] for r in rows]),
        "v": pa.array([r[3] for r in rows], pa.float64()),
    })


def _agg(df: pd.DataFrame) -> pd.DataFrame:
    out = (
        df.groupby(["k", "window_start"], as_index=False)
        .agg(n=("n", "sum"), n_late=("n_late", "sum"),
             sum_value=("sum_value", "sum"), closed=("closed", "max"))
        .sort_values(["k", "window_start"])
        .reset_index(drop=True)
    )
    return out


def test_epoch_watermarks_running_max(ray_session):
    import ray.data as rd

    wm = epoch_watermarks(rd.from_arrow(_fixture()), "epoch", "ts", 1800)
    assert wm[0] is None
    assert wm[1] == int(1.2 * H) - 1800 * US
    assert wm[2] == int(3.5 * H) - 1800 * US
    assert wm[-1] == int(3.9 * H) - 1800 * US


def test_batch_watermark_window_planted(ray_session):
    import ray.data as rd

    out = pd.DataFrame(
        watermark_window_agg(
            rd.from_arrow(_fixture()), "epoch", "ts", 3600, 1800,
            keys=["k"], value_col="v",
        ).take_all()
    ).sort_values(["k", "window_start"]).reset_index(drop=True)
    by = {(r.k, r.window_start.hour): r for r in out.itertuples()}
    w0 = by[("a", 0)]   # straggler accepted, late row dropped+counted
    assert (w0.n, w0.n_late, w0.sum_value, w0.closed) == (2, 1, 5.0, True)
    w1 = by[("a", 1)]
    assert (w1.n, w1.n_late, w1.closed) == (1, 0, True)
    assert by[("a", 3)].closed == False  # noqa: E712 - open tail
    assert by[("b", 3)].closed == False  # noqa: E712


def test_stream_equals_batch_after_reaggregation(ray_session):
    import ray.data as rd

    t = _fixture()
    batch = _agg(pd.DataFrame(
        watermark_window_agg(
            rd.from_arrow(t), "epoch", "ts", 3600, 1800,
            keys=["k"], value_col="v",
        ).take_all()
    ))
    st = WatermarkWindowStream("ts", 3600, 1800, keys=["k"], value_col="v")
    ems = []
    for e in range(3):
        em = st.advance(rd.from_arrow(t.filter(pc.equal(t["epoch"], e))))
        if em.num_rows:
            ems.append(em.to_pandas())
    fl = st.flush()
    if fl.num_rows:
        ems.append(fl.to_pandas())
    stream = _agg(pd.concat(ems, ignore_index=True))
    pd.testing.assert_frame_equal(batch, stream, check_dtype=False)


def test_stream_emits_closed_window_once_then_drop_notice(ray_session):
    import ray.data as rd

    t = _fixture()
    st = WatermarkWindowStream("ts", 3600, 1800, keys=["k"], value_col="v")
    em0 = st.advance(rd.from_arrow(t.filter(pc.equal(t["epoch"], 0))))
    assert em0.num_rows == 0  # nothing closed yet
    em1 = st.advance(rd.from_arrow(t.filter(pc.equal(t["epoch"], 1))))
    # watermark 3.0h closes [0,1),[1,2): both emit exactly here
    got = {(r["k"], r["window_start"].hour): r for r in em1.to_pylist()}
    assert got[("a", 0)]["n"] == 2 and got[("a", 0)]["closed"]
    assert got[("a", 1)]["n"] == 1
    em2 = st.advance(rd.from_arrow(t.filter(pc.equal(t["epoch"], 2))))
    # the late row surfaces as a drop notice, never mutating the emitted
    # aggregate (n=0, n_late=1)
    notices = [r for r in em2.to_pylist() if r["window_start"].hour == 0]
    assert len(notices) == 1
    assert notices[0]["n"] == 0 and notices[0]["n_late"] == 1
    fl = st.flush()
    assert all(not r["closed"] for r in fl.to_pylist())
    assert {(r["k"], r["window_start"].hour) for r in fl.to_pylist()} == {
        ("a", 3), ("b", 3)
    }


def test_stream_state_budget_refusal(ray_session):
    import ray.data as rd

    n = 64
    t = pa.table({
        "ts": pa.array(np.arange(n, dtype=np.int64) * H, pa.timestamp("us")),
        "k": pa.array([str(i) for i in range(n)]),
        "v": pa.array(np.ones(n), pa.float64()),
    })
    st = WatermarkWindowStream(
        "ts", 3600, 1e9, keys=["k"], value_col="v", state_budget_rows=10
    )  # huge lateness: nothing ever closes, state must grow past budget
    with pytest.raises(ValueError, match="budget"):
        st.advance(rd.from_arrow(t))


def test_empty_epoch_is_noop(ray_session):
    import ray.data as rd

    t = _fixture()
    st = WatermarkWindowStream("ts", 3600, 1800, keys=["k"], value_col="v")
    st.advance(rd.from_arrow(t.filter(pc.equal(t["epoch"], 0))))
    em = st.advance(rd.from_arrow(t.slice(0, 0)))
    assert em.num_rows == 0
    # watermark unchanged: epoch 1 behaves as if the empty one never was
    em1 = st.advance(rd.from_arrow(t.filter(pc.equal(t["epoch"], 1))))
    assert {r["window_start"].hour for r in em1.to_pylist()} == {0, 1}


def test_watermark_zero_max_is_not_unset(ray_session):
    """Falsy-zero regression: a running max of exactly 0 µs (the 1970
    epoch boundary) must hold against later pre-1970 event times — the
    old `running or -(1<<62)` treated 0 as 'unset' and let the
    watermark regress."""
    import ray.data as rd

    ds = rd.from_arrow(pa.table({
        "epoch": pa.array([0, 1, 2], pa.int64()),
        "ts": pa.array([0, -5_000_000, -7_000_000], pa.timestamp("us")),
    }))
    wm = epoch_watermarks(ds, "epoch", "ts", lateness_sec=0)
    assert wm[0] is None
    assert wm[1] == 0
    assert wm[2] == 0   # regressed to -5s under the falsy-or bug
    assert wm[-1] == 0  # final watermark: the max ever seen, monotone


def test_stream_empty_emissions_concat_with_nonempty(ray_session):
    """Zero-row emissions must carry the SAME schema as non-empty ones
    (int64 keys here) — the documented contract is 'concatenated
    emissions ∪ flush, re-aggregated'; a hardcoded string key type in
    the empty path broke pa.concat_tables."""
    import ray.data as rd

    t = pa.table({
        "ts": pa.array([0, int(0.5 * H)], pa.timestamp("us")),
        "k": pa.array([7, 7], pa.int64()),
        "v": pa.array([1.0, 2.0], pa.float64()),
    })
    st = WatermarkWindowStream("ts", 3600, 0, keys=["k"], value_col="v")
    em0 = st.advance(rd.from_arrow(t))  # nothing closes: EMPTY emission
    assert em0.num_rows == 0
    fl = st.flush()  # non-empty, int64 key
    assert fl.num_rows == 1
    merged = pa.concat_tables([em0, fl])  # must not raise
    assert merged["k"].type == pa.int64()


def test_watermark_null_ts_refused(ray_session):
    """Null event-time rows refuse loudly (batch + stream paths) rather
    than surfacing as an ArrowInvalid NaN truncation in a map task."""
    import ray.data as rd

    t = pa.table({
        "epoch": pa.array([0, 0], pa.int64()),
        "ts": pa.array([0, None], pa.timestamp("us")),
        "k": pa.array(["a", "a"]),
        "v": pa.array([1.0, 2.0], pa.float64()),
    })
    with pytest.raises(Exception, match="null 'ts'"):
        watermark_window_agg(
            rd.from_arrow(t), "epoch", "ts", 3600, 0, keys=["k"], value_col="v"
        ).take_all()
    st = WatermarkWindowStream("ts", 3600, 0, keys=["k"], value_col="v")
    with pytest.raises(Exception, match="null 'ts'"):
        st.advance(rd.from_arrow(t))


def test_watermark_unknown_epoch_refused(ray_session):
    """A caller-supplied watermark table that does not cover a data
    epoch (or a negative epoch id) refuses loudly instead of judging
    the row against a neighbor's watermark."""
    import ray.data as rd

    t = _fixture()
    partial_wm = {0: None, 1: 0, -1: 0}  # missing epoch 2
    with pytest.raises(Exception, match="no.*watermark entry|watermark entry"):
        watermark_window_agg(
            rd.from_arrow(t), "epoch", "ts", 3600, 1800,
            keys=["k"], value_col="v", watermarks=partial_wm,
        ).take_all()


def test_watermark_windows_normalize_timestamp_unit(ray_session):
    """A timestamp[ms] event-time column must produce the SAME windows
    as the equivalent timestamp[us] column — the µs window math would
    otherwise silently read milliseconds as microseconds (1000x-wide
    windows, 1970-era window_starts)."""
    import pyarrow as pa
    import ray.data as rd

    from etl_reconciliate_ray.stages.streamwin import watermark_window_agg

    us = [10_000_000, 3_600_000_000, 7_200_000_000, 100_000_000]
    eps = [0, 0, 1, 1]
    t_us = pa.table({
        "epoch": pa.array(eps, pa.int64()),
        "ts": pa.array(us, pa.timestamp("us")),
    })
    t_ms = pa.table({
        "epoch": pa.array(eps, pa.int64()),
        "ts": pa.array([v // 1000 for v in us], pa.timestamp("ms")),
    })
    out_us = (watermark_window_agg(rd.from_arrow(t_us), "epoch", "ts", 3600, 0)
              .to_pandas().sort_values("window_start").reset_index(drop=True))
    out_ms = (watermark_window_agg(rd.from_arrow(t_ms), "epoch", "ts", 3600, 0)
              .to_pandas().sort_values("window_start").reset_index(drop=True))
    assert out_us.equals(out_ms)
    assert len(out_us) == 3  # three distinct hour windows


def test_stream_empty_first_epoch_keeps_declared_key_type(ray_session):
    """An emission produced before any data (empty first epoch) must
    carry the DECLARED key type, not a string default — the documented
    concat contract for emissions would otherwise schema-mismatch."""
    import pyarrow as pa
    import ray.data as rd

    from etl_reconciliate_ray.stages.streamwin import WatermarkWindowStream

    st = WatermarkWindowStream(
        "ts", 3600, 0, keys=["k"], key_types={"k": pa.int64()},
    )
    empty = rd.from_arrow(pa.table({
        "k": pa.array([], pa.int64()), "ts": pa.array([], pa.timestamp("us")),
    }))
    e0 = st.advance(empty)
    full = rd.from_arrow(pa.table({
        "k": pa.array([7], pa.int64()),
        "ts": pa.array([3_600_000_000], pa.timestamp("us")),
    }))
    e1 = st.advance(full)
    fl = st.flush()
    merged = pa.concat_tables([e0, e1, fl])  # must not schema-mismatch
    assert merged.schema.field("k").type == pa.int64()
