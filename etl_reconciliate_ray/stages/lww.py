"""Generic last-writer-wins latest-row operator (CDC compaction shape
applied to any keyed, ordered table).

Two-level reduce (no full-row shuffle of already-dominated rows):
1. per-batch partial: keep only each key's max-(order) row inside the
   batch (winner-INDEX selection over zero-copy Arrow — dictionary
   codes + order ranks lexsorted, one ``take`` of the winners; the
   payload columns are never sorted or copied per row),
2. bucket the survivors by key hash, one shuffle, per-bucket final
   reduce with the same kernel.

This is the same dedup-by-recency semantics as the lake merge
(stages/merge.lww_reduce) exposed as a standalone operator over
arbitrary key/order columns — e.g. "latest event per user".
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.grouping import group_codes


def _winner_take(tbl: pa.Table, key_cols: list[str], order_cols: list[str]) -> pa.Table:
    """One row per key: the max-(order_cols) row, ties resolved to the
    later table position (== stable sort + keep-last). Order columns of
    ANY type are reduced to min-tiebreak ranks (equal values share a
    rank, so ties fall through to position); nulls rank last, matching
    pandas sort_values' default na_position='last'."""
    if tbl.num_rows == 0:
        return tbl
    # collision-free composite codes (per-column dictionary encode with
    # null-as-own-code — no string-join separator ambiguity, and
    # (NULL, 'a') != (NULL, 'b') as in merge.lww_reduce)
    codes, _, _ = group_codes(tbl, key_cols)
    ranks = []
    for c in reversed(order_cols):  # least-significant first for lexsort
        col = tbl[c]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ranks.append(
            pc.rank(col, sort_keys="ascending", null_placement="at_end",
                    tiebreaker="min").to_numpy(zero_copy_only=False).astype(np.int64)
        )
    perm = np.lexsort((*ranks, codes))
    g = codes[perm]
    winner_idx = perm[np.flatnonzero(np.append(g[1:] != g[:-1], True))]
    return tbl.take(pa.array(winner_idx))  # the ONE payload gather


def lww_latest(
    ds,
    key_cols: Sequence[str] | str,
    order_cols: Sequence[str] | str,
    num_buckets: int = 32,
    batch_size: int = 65536,
):
    """Dataset of the max-(order_cols) row per key group."""
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)

    def partial(t: pa.Table) -> pa.Table:
        from .joins import _bucket_expr  # ONE routing definition engine-wide

        out = _winner_take(t, key_cols, order_cols)
        return out.append_column(
            "__bucket__", _bucket_expr(out[key_cols[0]], num_buckets)
        )

    def final(t: pa.Table) -> pa.Table:
        return _winner_take(t, key_cols, order_cols).drop_columns(["__bucket__"])

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
        .groupby("__bucket__")
        .map_groups(final, batch_format="pyarrow")
    )
