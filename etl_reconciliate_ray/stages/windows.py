"""Streaming-shaped windowed aggregation over an ordered event log.

The reference is pure batch (SURVEY.md §2.8); the graft adds stream
semantics. Ray Data has no event-time windows, so tumbling windows are
expressed as: assign ``window_start = floor(ts, width)`` per batch
(vectorized Arrow temporal kernel), partial-aggregate per batch, then
one small ``groupby(keys + window)`` over partials (agg.preagg_groupby
pattern). Ordering assumption: none needed for tumbling count/sum —
window assignment is a pure row function; late data simply lands in
its own window (the CDC replay path handles true per-key ordering via
``seq``, not this stage).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .agg import preagg_groupby


def tumbling_window_agg(
    events_ds,
    ts_col: str = "ts",
    keys: list[str] | None = None,
    width: str = "hour",
    sums: dict[str, str] | None = None,
    count_alias: str = "n",
):
    """Count/sum per (keys..., window_start). ``width``: an Arrow
    ``floor_temporal`` unit ("minute", "hour", "day", ...)."""
    keys = list(keys or [])

    def assign(batch: pa.Table) -> pa.Table:
        w = pc.floor_temporal(batch[ts_col], unit=width)
        return batch.append_column("window_start", w)

    with_w = events_ds.map_batches(assign, batch_format="pyarrow")
    return preagg_groupby(
        with_w, keys + ["window_start"], sums=sums, count_alias=count_alias
    )
