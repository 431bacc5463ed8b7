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


def rollup_groupby(
    ds,
    keys: Sequence[str],
    sums: Mapping[str, str] | None = None,
    count_alias: str | None = None,
    all_label: str = "ALL",
):
    """SQL ``GROUP BY ROLLUP(keys...)``: the finest grouping plus every
    key-prefix subtotal and the grand total, with collapsed key levels
    labelled ``all_label`` (COALESCE-style — unambiguous when real key
    values never equal the label, which the caller must ensure).

    Scale shape: the DATA is aggregated exactly once (the finest-level
    partial pre-aggregation + one shuffle, same as ``preagg_groupby``);
    every coarser level is an aggregate OF the finest aggregate, which
    is key-cardinality-sized, so the rollup cascade adds only
    sketch-sized work no matter how many rows flowed in. The finest
    result is materialized once and fanned out to the subtotal legs —
    O(distinct key combos), never O(rows).
    """
    keys = list(keys)
    sums = dict(sums or {})
    outs = list(sums) + ([count_alias] if count_alias else [])
    resum = {o: o for o in outs}

    finest = preagg_groupby(ds, keys=keys, sums=sums, count_alias=count_alias)
    finest = finest.materialize()  # aggregate-sized; reused by every level

    def finish(sub: Sequence[str]):
        """Project to the uniform (keys + outs) schema, labelling the
        collapsed key columns."""

        def fn(t: pa.Table) -> pa.Table:
            cols: dict[str, pa.Array | pa.ChunkedArray] = {}
            for k in keys:
                cols[k] = (
                    t[k]
                    if k in sub
                    else pa.array([all_label] * t.num_rows, pa.string())
                )
            for o in outs:
                cols[o] = t[o]
            return pa.table(cols)

        return fn

    levels = [finest.map_batches(finish(keys), batch_format="pyarrow")]
    for i in range(len(keys) - 1, -1, -1):
        sub = keys[:i]
        if sub:
            lvl = preagg_groupby(finest, keys=sub, sums=resum)
        else:
            # grand total: constant-key groupby, then drop the key
            tagged = finest.map_batches(
                lambda t: t.append_column(
                    "__all__", pa.array([0] * t.num_rows, pa.int64())
                ),
                batch_format="pyarrow",
            )
            lvl = preagg_groupby(tagged, keys=["__all__"], sums=resum).drop_columns(
                ["__all__"]
            )
        levels.append(lvl.map_batches(finish(sub), batch_format="pyarrow"))
    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out
