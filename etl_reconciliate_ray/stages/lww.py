"""Generic last-writer-wins latest-row operator (CDC compaction shape
applied to any keyed, ordered table).

Two-level reduce (no full-row shuffle of already-dominated rows):
1. per-batch partial: keep only each key's max-(order) row inside the
   batch (vectorized pandas sort + drop_duplicates),
2. bucket the survivors by key hash, one shuffle, per-bucket final
   reduce with the same vectorized kernel.

This is the same dedup-by-recency semantics as the lake merge
(stages/merge.lww_reduce) exposed as a standalone operator over
arbitrary key/order columns — e.g. "latest event per user".
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

from ..functions.hashing import hash64


def _keep_last(df: pd.DataFrame, key_cols: list[str], order_cols: list[str]) -> pd.DataFrame:
    df = df.sort_values(order_cols, kind="stable")
    return df.drop_duplicates(subset=key_cols, keep="last")


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

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = _keep_last(df, key_cols, order_cols)
        k = out[key_cols[0]]
        if pd.api.types.is_integer_dtype(k):
            bucket = (k.to_numpy(dtype=np.int64) % num_buckets).astype(np.int32)
        else:
            bucket = (hash64(k.to_numpy(dtype=object)) % np.uint64(num_buckets)).astype(np.int32)
        out = out.copy()
        out["__bucket__"] = bucket
        return out

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return _keep_last(df, key_cols, order_cols).drop(columns="__bucket__")

    return (
        ds.map_batches(partial, batch_format="pandas", batch_size=batch_size)
        .groupby("__bucket__")
        .map_groups(final, batch_format="pandas")
    )
