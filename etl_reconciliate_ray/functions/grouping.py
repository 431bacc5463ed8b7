"""Batch-local group coding over zero-copy Arrow columns.

``group_codes`` turns one or more key columns into dense int64 group
codes (0..G-1) plus the row index of each group's first occurrence —
the building block the map-side "partial" stages (stats, moments,
resample, HLL) use to replace per-batch pandas groupbys: downstream
kernels are plain ``np.bincount`` / ``np.maximum.at`` / winner-index
selections over the codes, and the representative key VALUES are
gathered once with a single ``take``.

Null semantics match SQL GROUP BY / pandas ``dropna=False``: a null
key value is its own group, distinct per column (``dictionary_encode``
leaves null indices, which are filled with a one-past-the-dictionary
code before the columns are combined)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def group_codes(tbl: pa.Table, cols: list[str]) -> tuple[np.ndarray, np.ndarray, int]:
    """Return (codes int64[num_rows], first_idx int64[G], G) for the
    composite key ``cols``. ``first_idx[g]`` is the first row of group
    ``g``; gather representatives with ``tbl.select(cols).take(...)``."""
    combined: np.ndarray | None = None
    first_idx = np.empty(0, np.int64)
    for c in cols:
        col = tbl[c]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        d = pc.dictionary_encode(col)
        k = len(d.dictionary)
        # null -> its own code (k), keeping (NULL, a) != (NULL, b)
        idx = (
            pc.fill_null(pc.cast(d.indices, pa.int64()), k)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        # compact to dense codes after EVERY column: the mixed-radix
        # value is then bounded by G_prev*(k+1) <= num_rows^2, which
        # cannot overflow int64 for any Arrow-addressable batch (a
        # single multiply across many high-cardinality columns could)
        combined = idx if combined is None else combined * (k + 1) + idx
        _, first_idx, combined = np.unique(
            combined, return_index=True, return_inverse=True
        )
    if combined is None or len(combined) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64), 0
    return combined.astype(np.int64), first_idx.astype(np.int64), len(first_idx)
