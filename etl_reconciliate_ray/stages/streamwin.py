"""Event-time watermark windows with allowed lateness (Flink-style
streaming semantics) over an epoch-arriving stream.

The engine's other window stages (``stages/windows.py``) are
arrival-agnostic: late data simply lands in its window. A CDC-grade
streaming engine also needs the OTHER contract — windows that *close*
once the event-time watermark passes, with late arrivals counted and
dropped rather than silently reopening emitted results. The reference
is pure batch; this is graft-added stream semantics (SURVEY.md §2.8),
watermark discipline per the Dataflow model (Akidau et al., VLDB'15).

Semantics (epoch-granularity watermarks — the natural Ray Data shape,
where arrival order exists between epochs/micro-batches, not between
rows of one distributed batch):

- watermark BEFORE epoch e:  W(e) = max(event time in epochs < e) − L
  (L = allowed lateness; W(0) = −∞),
- a tumbling window [s, s+w) is CLOSED at epoch e iff s+w ≤ W(e),
- a row arriving in epoch e is LATE (dropped from the aggregate,
  counted in ``n_late``) iff its window is already closed at e,
- after the final epoch a window is reported ``closed`` iff
  s+w ≤ W(final+1); open windows carry their (still mutable)
  aggregate with ``closed = false``.

Scale shape: ONE tiny aggregate for per-epoch max event time
(O(epochs) rows to the driver — epochs are micro-batches, bounded),
one broadcast-free map pass (the watermark table rides the closure),
one partial-aggregated shuffle (``preagg_groupby``) whose exchange
volume is O(windows × keys). Nothing data-scale lands on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .agg import preagg_groupby

_US = 1_000_000


def _ts_to_us(col):
    """Event-time column -> int64 MICROSECONDS. All window/lateness
    math in this module is in µs, so a timestamp column of any unit
    (s/ms/us/ns) must normalize FIRST — a bare int64 cast of a
    timestamp[ms] column would yield milliseconds and make every
    window 1000x too wide, silently. Plain integer columns pass
    through (documented as already-µs)."""
    typ = col.type if hasattr(col, "type") else col.chunk(0).type
    if pa.types.is_timestamp(typ) and typ.unit != "us":
        col = pc.cast(col, pa.timestamp("us", tz=typ.tz))
    return pc.cast(col, pa.int64())


def _refuse_null_time(t: pa.Table, epoch_col: str | None, ts_col: str) -> None:
    """Loud contract refusal on null event-time / epoch rows — a null
    ts would otherwise surface as an obscure ArrowInvalid NaN-truncation
    deep inside a map task (and an all-null epoch as a TypeError in the
    watermark fold); pre-filter upstream, same contract as
    ``stages/graph.chain_edges``."""
    checks = [(ts_col, t[ts_col])]
    if epoch_col is not None:
        checks.append((epoch_col, t[epoch_col]))
    for name, col in checks:
        if col.null_count:
            raise ValueError(
                f"watermark windows: null {name!r} rows in input — "
                "pre-filter them (they can anchor no window/watermark)"
            )


def epoch_watermarks(ds, epoch_col: str, ts_col: str, lateness_sec: float):
    """Per-epoch watermark table: {epoch -> watermark in effect BEFORE
    that epoch (µs), and after the final epoch under key -1}. One tiny
    distributed max-aggregate; O(epochs) driver rows."""
    def project(t: pa.Table) -> pa.Table:
        _refuse_null_time(t, epoch_col, ts_col)
        return pa.table(
            {
                epoch_col: t[epoch_col],
                "__ts_us": _ts_to_us(t[ts_col]),
            }
        )

    per = (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby(epoch_col)
        .max("__ts_us")
        .take_all()
    )
    per.sort(key=lambda r: r[epoch_col])
    late_us = int(lateness_sec * _US)
    out: dict[int, int | None] = {}
    running: int | None = None
    for r in per:
        out[int(r[epoch_col])] = None if running is None else running - late_us
        mx = int(r["max(__ts_us)"])
        # NOT `running or ...`: a legitimate running max of exactly 0 µs
        # (the 1970 epoch boundary) is falsy and would let a later
        # negative event time REGRESS the watermark
        running = mx if running is None else max(running, mx)
    out[-1] = None if running is None else running - late_us  # final watermark
    return out


def watermark_window_agg(
    ds,
    epoch_col: str,
    ts_col: str,
    width_sec: int,
    lateness_sec: float,
    keys: list[str] | None = None,
    value_col: str | None = None,
    watermarks: dict[int, int | None] | None = None,
):
    """Tumbling event-time windows under watermark discipline.

    Returns a Dataset with columns ``keys + [window_start, n, n_late,
    (sum_value), closed]``: ``n``/``sum_value`` aggregate the ACCEPTED
    rows, ``n_late`` counts dropped late arrivals (a window whose every
    row was late still appears, documenting the drop), ``closed`` is
    the window's state under the final watermark. ``watermarks`` lets
    a caller (the streaming accumulator) supply precomputed watermarks.
    """
    keys = list(keys or [])
    wm = watermarks
    if wm is None:
        # materialize ONCE: the watermark fold and the assign pass are
        # two consumers — left lazy, the whole upstream pipeline would
        # execute twice, and a non-deterministic/mutable source could
        # desynchronize rows from the watermarks they're judged against
        # (the streaming class guards its advance() the same way)
        ds = ds.materialize()
        wm = epoch_watermarks(ds, epoch_col, ts_col, lateness_sec)
    width_us = int(width_sec) * _US
    final_wm = wm.get(-1)
    # dense epoch->watermark arrays for a vectorized per-row gather
    eps = sorted(k for k in wm if k >= 0)
    wm_arr = np.array(
        [wm[e] if wm[e] is not None else np.iinfo(np.int64).min for e in eps],
        dtype=np.int64,
    )

    eps_arr = np.array(eps, dtype=np.int64)

    def assign(t: pa.Table) -> pa.Table:
        _refuse_null_time(t, epoch_col, ts_col)
        ts_us = _ts_to_us(t[ts_col]).to_numpy(zero_copy_only=False)
        ws = (ts_us // width_us) * width_us
        ep = t[epoch_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # map each row's epoch to its watermark via searchsorted on the
        # (sorted, dense) epoch list — no per-row Python
        pos = np.searchsorted(eps_arr, ep)
        # loud contract check: every data epoch must be a key of the
        # watermark table (epochs are >= 0; -1 is the final-watermark
        # sentinel). A caller-supplied `watermarks` missing an epoch —
        # or a negative data epoch — would otherwise be judged against
        # a NEIGHBOR's watermark (or IndexError), silently mislabeling
        # lateness.
        known = (
            (pos < len(eps_arr))
            & (eps_arr[np.minimum(pos, max(len(eps_arr) - 1, 0))] == ep)
            if len(eps_arr)
            else np.zeros(len(ep), dtype=bool)
        )
        if not known.all():
            bad = np.unique(ep[~known])[:5]
            raise ValueError(
                f"watermark windows: epoch(s) {bad.tolist()} have no "
                "watermark entry (negative ids, or a caller-supplied "
                "`watermarks` dict that does not cover the data)"
            )
        late = (ws + width_us) <= wm_arr[pos]
        cols: dict[str, object] = {k: t[k] for k in keys}
        cols["window_start"] = pa.array(ws, pa.int64())
        cols["__acc"] = pa.array((~late).astype(np.int64))
        cols["n_late"] = pa.array(late.astype(np.int64))
        if value_col is not None:
            v = pc.fill_null(pc.cast(t[value_col], pa.float64()), 0.0)
            v = v.to_numpy(zero_copy_only=False) * (~late)
            cols["__vsum"] = pa.array(v, pa.float64())
        return pa.table(cols)

    sums = {"n": "__acc", "n_late": "n_late"}
    if value_col is not None:
        sums["sum_value"] = "__vsum"
    agg = preagg_groupby(
        ds.map_batches(assign, batch_format="pyarrow"),
        keys + ["window_start"],
        sums=sums,
    )

    def finish(t: pa.Table) -> pa.Table:
        ws = t["window_start"]
        end = pc.add(ws, width_us)
        closed = (
            pc.less_equal(end, final_wm)
            if final_wm is not None
            else pa.array([False] * t.num_rows)
        )
        cols = {k: t[k] for k in keys}
        cols["window_start"] = pc.cast(ws, pa.timestamp("us"))
        cols["n"] = t["n"]
        cols["n_late"] = t["n_late"]
        if value_col is not None:
            cols["sum_value"] = t["sum_value"]
        cols["closed"] = closed
        return pa.table(cols)

    return agg.map_batches(finish, batch_format="pyarrow")


class WatermarkWindowStream:
    """Incremental (follow-mode) face of ``watermark_window_agg``:
    feed epochs one at a time; closed windows EMIT exactly once, at the
    first epoch whose watermark passes them; ``flush()`` emits the
    still-open remainder with ``closed = false``.

    State = per-(window, key) partial sums over accepted rows — the
    per-epoch heavy work (window assignment, late filtering, partial
    aggregation) is distributed; only the O(open windows × keys) state
    table lands driver-side, guarded by ``state_budget_rows`` (a
    high-cardinality key set at 100 TB should keep state distributed —
    use the batch operator over sealed epochs instead; the budget
    refusal is loud, never a silent truncation).

    A late arrival to an ALREADY-EMITTED window surfaces as its own
    drop-notice emission (n = 0, n_late > 0) — the emitted aggregate is
    never mutated retroactively (Flink side-output discipline). The
    stream-vs-batch contract is therefore: concatenated emissions ∪
    flush, RE-AGGREGATED by (keys, window_start), equal the batch
    operator's output on the same rows (tested)."""

    def __init__(
        self,
        ts_col: str,
        width_sec: int,
        lateness_sec: float,
        keys: list[str] | None = None,
        value_col: str | None = None,
        state_budget_rows: int = 1_000_000,
        key_types: dict[str, pa.DataType] | None = None,
    ):
        self.ts_col = ts_col
        self.width_us = int(width_sec) * _US
        self.late_us = int(lateness_sec * _US)
        self.keys = list(keys or [])
        self.value_col = value_col
        self.budget = int(state_budget_rows)
        self._wm_us: int | None = None  # current watermark (µs)
        self._state: pa.Table | None = None
        # key-column types observed from data, so zero-row emissions
        # carry the SAME schema as non-empty ones (callers concat them).
        # For non-string keys, pass ``key_types`` up front: an emission
        # produced BEFORE any data arrives (empty first epoch, early
        # flush) otherwise defaults unknown key columns to string and
        # would break the documented concat contract.
        self._key_types: dict[str, pa.DataType] = dict(key_types or {})

    # -- one epoch -------------------------------------------------------
    def advance(self, epoch_ds) -> pa.Table:
        """Apply one arrival epoch; returns the windows that CLOSED as
        a result (possibly empty)."""
        wm = self._wm_us
        ts_col, width_us = self.ts_col, self.width_us
        keys, value_col = self.keys, self.value_col

        def assign(t: pa.Table) -> pa.Table:
            _refuse_null_time(t, None, ts_col)
            ts_us = _ts_to_us(t[ts_col]).to_numpy(zero_copy_only=False)
            ws = (ts_us // width_us) * width_us
            late = (
                (ws + width_us) <= wm
                if wm is not None
                else np.zeros(len(ws), dtype=bool)
            )
            cols: dict[str, object] = {k: t[k] for k in keys}
            cols["window_start"] = pa.array(ws, pa.int64())
            cols["n"] = pa.array((~late).astype(np.int64))
            cols["n_late"] = pa.array(late.astype(np.int64))
            cols["__max_ts"] = pa.array(ts_us, pa.int64())
            if value_col is not None:
                v = pc.fill_null(pc.cast(t[value_col], pa.float64()), 0.0)
                cols["__vsum"] = pa.array(
                    v.to_numpy(zero_copy_only=False) * (~late), pa.float64()
                )
            return pa.table(cols)

        sums = {"n": "n", "n_late": "n_late"}
        if value_col is not None:
            sums["__vsum"] = "__vsum"
        # materialize so the distributed assign map runs ONCE: both the
        # epoch-max aggregate and the partial groupby consume it, and a
        # lazy Dataset would re-execute the whole epoch pipeline per
        # consumer (desynchronizing the watermark from the aggregated
        # rows if the upstream re-read mutable input)
        assigned = epoch_ds.map_batches(
            assign, batch_format="pyarrow"
        ).materialize()
        partial = preagg_groupby(assigned, keys + ["window_start"], sums=sums)
        epoch_max = assigned.max("__max_ts")
        inc = pa.Table.from_pylist(
            partial.take_all(),
            schema=None,
        )
        if self._state is not None and self._state.num_rows:
            inc = pa.concat_tables(
                [self._state, inc.select(self._state.column_names)]
                if inc.num_rows
                else [self._state],
                promote_options="default",
            )
        if inc.num_rows:
            gcols = keys + ["window_start"]
            aggs = [(c, "sum") for c in sums]
            red = inc.group_by(gcols, use_threads=False).aggregate(aggs)
            # select by NAME (pyarrow names aggregates '<col>_sum'):
            # group_by's key/aggregate column ORDER is a pyarrow
            # implementation detail, and a positional rename would
            # silently mislabel every column if it changed
            inc = pa.table(
                {**{g: red[g] for g in gcols},
                 **{c: red[f"{c}_sum"] for c in sums}}
            )
            self._key_types = {k: inc.schema.field(k).type for k in keys}
        if inc.num_rows > self.budget:
            raise ValueError(
                f"open-window state ({inc.num_rows} rows) exceeds the "
                f"driver budget ({self.budget}); keep state distributed "
                "via the batch watermark_window_agg over sealed epochs"
            )
        # advance the watermark, then split closed vs open
        if epoch_max is not None:
            new_wm = int(epoch_max) - self.late_us
            self._wm_us = new_wm if wm is None else max(wm, new_wm)
        if inc.num_rows == 0:
            self._state = inc
            return self._emit(inc, closed=True)
        end = pc.add(inc["window_start"], self.width_us)
        is_closed = (
            pc.less_equal(end, self._wm_us)
            if self._wm_us is not None
            else pa.array([False] * inc.num_rows)
        )
        closed_t = inc.filter(is_closed)
        self._state = inc.filter(pc.invert(is_closed))
        return self._emit(closed_t, closed=True)

    def flush(self) -> pa.Table:
        """End of stream: emit the still-open windows (closed=false)."""
        t = self._state if self._state is not None else None
        self._state = pa.table({})
        if t is None or t.num_rows == 0:
            return self._emit(pa.table({}), closed=False)
        return self._emit(t, closed=False)

    def _emit(self, t: pa.Table, closed: bool) -> pa.Table:
        cols: dict[str, object] = {}
        n = t.num_rows if t is not None else 0
        if n == 0:
            base: dict[str, object] = {
                k: pa.array([], self._key_types.get(k, pa.string()))
                for k in self.keys
            }
            base["window_start"] = pa.array([], pa.timestamp("us"))
            base["n"] = pa.array([], pa.int64())
            base["n_late"] = pa.array([], pa.int64())
            if self.value_col is not None:
                base["sum_value"] = pa.array([], pa.float64())
            base["closed"] = pa.array([], pa.bool_())
            return pa.table(base)
        for k in self.keys:
            cols[k] = t[k]
        cols["window_start"] = pc.cast(t["window_start"], pa.timestamp("us"))
        cols["n"] = t["n"]
        cols["n_late"] = t["n_late"]
        if self.value_col is not None:
            cols["sum_value"] = t["__vsum"]
        cols["closed"] = pa.array([closed] * n)
        return pa.table(cols)
