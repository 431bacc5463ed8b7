"""Per-group order statistics: distributed top-k per group and exact
grouped quantiles.

Top-k per group is the training-data workhorse ("best N documents per
domain/language by quality score"). Scale shape: a map-side COMBINER
keeps at most k rows per group per batch (so the shuffle moves
O(groups x k) rows per batch, never the corpus), then one final
per-group reduction applies the identical selection — associative, so
the two-level result equals a global sort. The reference's only
ordering is the report sort (SURVEY.md §2.6); top-k-per-group
generalizes its J9 first-candidate selection
(``ReconciliationService.java:129-147``: best match per message) to k
candidates per key.

Quantiles are exact by explicit rank semantics — the value at sorted
index ``floor(q * (n-1))`` — because "median" defined by an
interpolation mode can silently disagree between engines; an index into
the sorted multiset cannot. Groups are reduced whole (map_groups):
right for low-cardinality group keys (event types, languages); for
high-cardinality keys swap in a sketch (t-digest) — documented
partitioning assumption.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _rank_in_group(sorted_keys: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """0-based position of each row within its (contiguous) key run."""
    import pyarrow.compute as pc

    keys = sorted_keys.combine_chunks() if isinstance(sorted_keys, pa.ChunkedArray) else sorted_keys
    n = len(keys)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    a, b = keys.slice(1), keys.slice(0, n - 1)
    # NULL-SAFE boundary test: a null group key is its own group (SQL
    # PARTITION BY semantics). Plain not_equal is null when either side
    # is null, which flatnonzero would read as 'no boundary' — the null
    # run would then continue the previous group's rank sequence and
    # its rows would silently miss the top-k cut.
    ne = pc.fill_null(pc.not_equal(a, b), True)
    both_null = pc.and_(pc.is_null(a), pc.is_null(b))
    neq = pc.and_(ne, pc.invert(both_null)).to_numpy(zero_copy_only=False)
    starts = np.concatenate([[0], np.flatnonzero(neq) + 1]).astype(np.int64)
    lengths = np.diff(np.concatenate([starts, [n]]))
    return np.arange(n, dtype=np.int64) - np.repeat(starts, lengths)


def _select_topk(t: pa.Table, group_key: str, order_col: str, k: int,
                 tiebreak: str, descending: bool) -> pa.Table:
    order = "descending" if descending else "ascending"
    t = t.sort_by([(group_key, "ascending"), (order_col, order), (tiebreak, "ascending")])
    pos = _rank_in_group(t[group_key])
    out = t.filter(pa.array(pos < k))
    return out.append_column("rank", pa.array(pos[pos < k] + 1, pa.int64()))


def topk_per_group(
    ds,
    group_key: str,
    order_col: str,
    k: int,
    tiebreak: str,
    descending: bool = True,
):
    """Top-k rows per group with a deterministic total order
    (order_col, then tiebreak asc). Two-level: batch combiner then
    per-group final — only O(groups x k) rows shuffle."""

    def partial(t: pa.Table) -> pa.Table:
        if "rank" in t.column_names:
            # append_column would create a duplicate 'rank' and the
            # drop below would then die with a misleading KeyError —
            # refuse with the actual problem instead
            raise ValueError(
                "topk_per_group: input already has a 'rank' column "
                "(rename it; the stage emits its own)"
            )
        if t.num_rows == 0:
            return t
        return _select_topk(t, group_key, order_col, k, tiebreak, descending).drop_columns(
            ["rank"]
        )

    def final(t: pa.Table) -> pa.Table:
        return _select_topk(t, group_key, order_col, k, tiebreak, descending)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_key)
        .map_groups(final, batch_format="pyarrow")
    )


def histogram_quantiles(
    ds,
    group_key: str,
    value_col: str,
    quantiles: dict[str, float],
    lo: int,
    hi: int,
    num_bins: int = 1024,
):
    """MERGEABLE approximate quantiles — the scale path for
    high-cardinality groups where ``grouped_quantiles``' whole-group
    reduction is too big: each batch collapses to per-(group, bin)
    counts (vectorized bincount — a combiner), counts merge by sum (one
    tiny shuffle), and the quantile is the lower edge of the bin where
    the cumulative count crosses q*n. Error is bounded by ONE BIN WIDTH
    ((hi-lo)/num_bins) by construction FOR VALUES INSIDE [lo, hi) —
    property-tested against the exact reduction, not assumed. Values
    outside the range land in two dedicated overflow bins whose
    reported edge clamps to lo/hi; a quantile that resolves to an
    overflow bin carries NO width bound (its true value may sit
    arbitrarily far outside the configured range), so the finalize
    stage LOGS the overflow counts per group — never a silent clip."""
    import pyarrow.compute as pc

    width = max(1, (hi - lo + num_bins - 1) // num_bins)

    def to_bins(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # overflow bins -1 / num_bins instead of a silent clip into the
        # edge bins: rank arithmetic stays exact, the bound caveat is
        # detectable downstream
        b = np.clip((v - lo) // width, -1, num_bins)
        keys = t[group_key]
        tb = pa.table({group_key: keys, "bin": pa.array(b, pa.int64())})
        red = tb.group_by([group_key, "bin"], use_threads=False).aggregate([("bin", "count")])
        return pa.table({
            group_key: red[group_key],
            "bin": red["bin"],
            "n": pc.cast(red["bin_count"], pa.int64()),
        })

    merged = (
        ds.map_batches(to_bins, batch_format="pyarrow")
        .groupby([group_key, "bin"])
        .sum("n")
    )

    def finalize(t: pa.Table) -> pa.Table:
        import logging

        t = t.sort_by([("bin", "ascending")])
        n_col = "sum(n)" if "sum(n)" in t.column_names else "n"
        counts = t[n_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bins = t["bin"].to_numpy(zero_copy_only=False).astype(np.int64)
        total = int(counts.sum())
        cum = np.cumsum(counts)
        n_under = int(counts[bins < 0].sum())
        n_over = int(counts[bins >= num_bins].sum())
        gval = t[group_key][0].as_py()
        if n_under or n_over:
            logging.getLogger(__name__).warning(
                "histogram_quantiles: group %r has %d value(s) below lo=%d "
                "and %d above hi=%d — quantiles resolving to an overflow "
                "bin clamp to the range edge and carry NO one-bin-width "
                "bound (widen [lo, hi) to restore it)",
                gval, n_under, lo, n_over, hi,
            )
        row: dict[str, object] = {group_key: gval, "n": total}
        for name, q in quantiles.items():
            target = int(np.floor(q * (total - 1))) + 1  # rank, 1-based
            idx = int(np.searchsorted(cum, target))
            # lower bin edge, overflow bins clamped to the range
            row[name] = int(min(max(lo + bins[idx] * width, lo), hi))
        return pa.Table.from_pylist([row])

    return merged.groupby(group_key).map_groups(finalize, batch_format="pyarrow")


def grouped_quantiles(ds, group_key: str, value_col: str, quantiles: dict[str, float]):
    """Exact per-group order statistics: for each named quantile q, the
    value at sorted index ``floor(q * (n-1))`` (int64 values). One
    shuffle; each group reduced whole (see module docstring for the
    cardinality assumption)."""

    def reduce_group(t: pa.Table) -> pa.Table:
        v = np.sort(t[value_col].to_numpy(zero_copy_only=False).astype(np.int64))
        n = len(v)
        row: dict[str, object] = {group_key: t[group_key][0].as_py(), "n": n}
        for name, q in quantiles.items():
            row[name] = int(v[int(np.floor(q * (n - 1)))])
        return pa.Table.from_pylist([row])

    return ds.groupby(group_key).map_groups(reduce_group, batch_format="pyarrow")
