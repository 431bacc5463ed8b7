"""Distinct set operations (INTERSECT / EXCEPT) as one tagged shuffle.

The reference's reconcile legs are set differences computed row-by-row
against a JDBC-loaded map (`service/ReconciliationService.java:142-199`
matched/unmatched bookkeeping, SURVEY §2 J6/J7); this stage is the
standalone relational form over arbitrary key tuples.

Scale shape: each side is collapsed per batch to DISTINCT key tuples
with a side-presence flag (pyarrow hash aggregation — map-side
combiner), so only distinct (key, flag) partials cross the wire; one
``groupby(keys)`` merges presence flags and the verdict is a vectorized
filter. Exchange volume is O(distinct keys), never O(rows)."""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa
import pyarrow.compute as pc


def _presence(left, right, cols: Sequence[str]):
    from ray.data.aggregate import Max

    cols = list(cols)

    def with_flags(t: pa.Table, l: int, r: int) -> pa.Table:
        t = t.select(cols).group_by(cols, use_threads=False).aggregate([])
        return t.append_column(
            "__l", pa.array([l] * t.num_rows, pa.int64())
        ).append_column("__r", pa.array([r] * t.num_rows, pa.int64()))

    lt = left.map_batches(lambda t: with_flags(t, 1, 0), batch_format="pyarrow")
    rt = right.map_batches(lambda t: with_flags(t, 0, 1), batch_format="pyarrow")
    return (
        lt.union(rt)
        .groupby(cols)
        .aggregate(Max(on="__l", alias_name="__l"), Max(on="__r", alias_name="__r"))
    )


def except_distinct(left, right, cols: Sequence[str]):
    """``SELECT DISTINCT cols FROM left EXCEPT SELECT ... FROM right``."""
    cols = list(cols)
    merged = _presence(left, right, cols)

    def verdict(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.equal(t["__l"], 1), pc.equal(t["__r"], 0))
        return t.filter(keep).select(cols)

    return merged.map_batches(verdict, batch_format="pyarrow")


def intersect_distinct(left, right, cols: Sequence[str]):
    """``SELECT DISTINCT cols FROM left INTERSECT SELECT ... FROM right``."""
    cols = list(cols)
    merged = _presence(left, right, cols)

    def verdict(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.equal(t["__l"], 1), pc.equal(t["__r"], 1))
        return t.filter(keep).select(cols)

    return merged.map_batches(verdict, batch_format="pyarrow")
