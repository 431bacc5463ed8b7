"""Time-series resample + gap-fill (LOCF).

Regularizes an irregular event stream onto a fixed calendar grid —
the feature-engineering step every metrics/training pipeline needs
before sequence models or day-over-day diffs: per key, one row per
calendar unit between the key's first and last activity, carrying

- ``n_events``  — events observed in that unit (0 on gap units), and
- ``locf_cents`` — the last observed value (cents) carried forward
  (last observation carried forward; 0 until the first observation so
  the column is never null and the contract is type-stable).

Scale shape: the per-unit reduction happens map-side (each batch
collapses to at most one partial row per (key, unit) — counts sum,
"last value" partials carry their (ts, id) order key so partials
combine associatively), then ONE key-hash shuffle; gap expansion runs
inside ``map_groups`` per key and is bounded by the key's activity
span in units, never by the event count. Nothing corpus-sized ever
reaches the driver.

Reference analogue: the reference reconciler reports per-day match
tallies only for days present in the data (`ReconciliationService
.java:219-231` iterates loaded rows); the gap-filled calendar is the
generalization a monitoring consumer actually charts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_FREQ = {"day": "D", "hour": "h"}


def resample_locf(
    ds,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    unit: str = "day",
):
    """Per-``key`` calendar resample with LOCF gap-fill (see module
    docstring). ``id_col`` breaks same-timestamp ties so "last value"
    is deterministic. Returns (key, unit start as timestamp[us],
    n_events int64, locf_cents int64)."""
    freq = _FREQ[unit]

    def derive(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t[key]), pc.is_valid(t[ts_col]))
        t = t.filter(ok)
        day = pc.cast(pc.floor_temporal(t[ts_col], unit=unit), pa.timestamp("us"))
        cents = pc.cast(pc.round(pc.multiply(t[value_col], 100.0)), pa.int64())
        return pa.table({
            key: t[key],
            "day": day,
            "cents": cents,
            ts_col: t[ts_col],
            id_col: t[id_col],
        })

    def partial(t: pa.Table) -> pa.Table:
        # one row per (key, day): event count + the batch-local last
        # non-null value with its order key, so partials merge by
        # taking the (ts, id)-max across batches. Zero-copy Arrow:
        # dense group codes + bincount for n, winner-index lexsort for
        # the last non-null value, Arrow null-index take to left-join
        # the winner columns back onto the group grid.
        from ..functions.grouping import group_codes

        codes, first, G = group_codes(t, [key, "day"])
        n = np.bincount(codes, minlength=G).astype(np.int64)
        valid = pc.is_valid(t["cents"]).to_numpy(zero_copy_only=False)
        vi = np.flatnonzero(valid)
        win = np.full(G, -1, np.int64)
        if len(vi):
            ts = t[ts_col].to_numpy(zero_copy_only=False)[vi]
            ids = t[id_col].to_numpy(zero_copy_only=False)[vi]
            perm = np.lexsort((ids, ts, codes[vi]))
            sc = codes[vi][perm]
            w = vi[perm[np.flatnonzero(np.append(sc[1:] != sc[:-1], True))]]
            win[codes[w]] = w
        # null winner index -> null lts/lid/lcents (the how="left" leg)
        win_idx = pa.array(np.where(win >= 0, win, 0), mask=win < 0)
        last = t.select([ts_col, id_col, "cents"]).take(win_idx)
        rep = t.select([key, "day"]).take(pa.array(first))
        return pa.table({
            key: rep[key],
            "day": rep["day"],
            "n": pa.array(n),
            "lts": last[ts_col],
            "lid": last[id_col],
            "lcents": last["cents"],
        })

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        kv = df[key].iloc[0]
        n = df.groupby("day")["n"].sum()
        nn = df[df["lcents"].notna()].sort_values(["day", "lts", "lid"], kind="stable")
        last = nn.groupby("day")["lcents"].last()
        days = pd.date_range(df["day"].min(), df["day"].max(), freq=freq)
        out = pd.DataFrame({
            key: np.full(len(days), kv),
            # microsecond unit to match the SQL oracle's TIMESTAMP
            # (date_range yields ns; the driver compare normalizes, but
            # emitting the declared unit keeps the schema honest)
            "day": days.astype("datetime64[us]"),
            "n_events": n.reindex(days).fillna(0).astype("int64").to_numpy(),
            "locf_cents": last.reindex(days)
            .ffill()
            .fillna(0)
            .astype("int64")
            .to_numpy(),
        })
        return out

    return (
        ds.map_batches(derive, batch_format="pyarrow")
        .map_batches(partial, batch_format="pyarrow")
        .groupby(key)
        .map_groups(per_key, batch_format="pandas")
    )
