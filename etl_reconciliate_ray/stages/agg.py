"""Aggregation helpers: partial (combiner-style) pre-aggregation before
the global shuffle.

Maps the reference's SQL aggregates (A1 per-message SUM at
``AsMonitoringMessagesDAOImpl.java:37,44-48``; A2 per-batch SUM at
``BpBatchDAOImpl.java:38-42``) to the scale-correct Ray Data pattern:
a bare ``groupby().aggregate()`` shuffles every row, so we first
collapse each batch to one row per key inside ``map_batches`` (pyarrow
hash aggregation, zero-copy) and only shuffle the partials —
orders-of-magnitude less exchange volume when keys repeat within
batches (ray_guide.md "Aggregation at scale").
"""

from __future__ import annotations

from typing import Mapping, Sequence

import pyarrow as pa


def preagg_groupby(
    ds,
    keys: Sequence[str],
    sums: Mapping[str, str] | None = None,
    count_alias: str | None = None,
    batch_size: int = 65536,
):
    """sum/count groupby with per-batch partial aggregation.

    ``sums``: {output_name: input_column}; ``count_alias``: name for the
    row count. Returns a Dataset with columns keys + outputs.
    """
    from ray.data.aggregate import Sum

    keys = list(keys)
    sums = dict(sums or {})

    def partial(batch: pa.Table) -> pa.Table:
        aggs = [(c, "sum") for c in sums.values()]
        if count_alias:
            batch = batch.append_column(
                "__ones__", pa.array([1] * batch.num_rows, pa.int64())
            )
            aggs.append(("__ones__", "sum"))
        red = batch.group_by(keys, use_threads=False).aggregate(aggs)
        cols: dict[str, pa.ChunkedArray | pa.Array] = {k: red[k] for k in keys}
        for out, src in sums.items():
            cols[out] = red[f"{src}_sum"]
        if count_alias:
            cols[count_alias] = red["__ones___sum"]
        return pa.table(cols)

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
    aggs = [Sum(on=out, alias_name=out) for out in sums]
    if count_alias:
        aggs.append(Sum(on=count_alias, alias_name=count_alias))
    return partials.groupby(keys).aggregate(*aggs)
