"""Heavy hitters via the Misra-Gries frequent-items sketch (Misra &
Gries 1982; merge rule from Agarwal et al., "Mergeable Summaries",
PODS 2012).

The reference's count diagnostics (SURVEY §2 A4,
``ReconciliationService.java`` matched/unmatched tallies) enumerate a
handful of fixed statuses; finding the most frequent values of an
UNBOUNDED-cardinality column (hot repos, dominant event types, spam
domains in a crawl) at 100 TB with an exact groupby shuffles every
distinct key. Misra-Gries replaces that with a fixed-size mergeable
summary:

- per batch: a value-counts partial trimmed MG-style — subtract the
  (capacity+1)-th largest count from all counters, keep the positive
  ones (≤ ``capacity`` rows per batch, whatever the batch holds);
- global: one tiny groupby-sum of the partial counters (exchange
  volume O(capacity × batches), independent of row count), then one
  final MG trim of that sketch-sized set.

Guarantees (standard MG, preserved by the merge): reported counts are
LOWER bounds; every item with true frequency > n/(capacity+1) is
present; per-item undercount ≤ n/(capacity+1). When ``capacity`` ≥ the
column's distinct count no trim ever fires and the counts are exact —
which is what the oracle-checked query exercises; the approximation
regime is covered by a property test.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _mg_trim(items: np.ndarray, counts: np.ndarray, capacity: int):
    """Misra-Gries decrement: keep ≤ capacity counters by subtracting
    the (capacity+1)-th largest count from all and dropping ≤ 0."""
    if len(counts) <= capacity:
        return items, counts
    order = np.argsort(counts)[::-1]
    dec = counts[order[capacity]]
    keep = order[:capacity]
    kept_counts = counts[keep] - dec
    pos = kept_counts > 0
    return items[keep][pos], kept_counts[pos]


def heavy_hitters(ds, col: str, capacity: int, alias: str = "n") -> pd.DataFrame:
    """Top frequent values of ``col`` as (item, count-lower-bound),
    descending by count (ties broken by item for determinism).

    Returns a pandas DataFrame — the result is sketch-sized (≤
    ``capacity`` rows) by construction. The only driver-side work is
    the final trim of the merged partials, which is O(capacity ×
    batches) rows — bounded by the sketch, never by the data.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        red = t.select([col]).group_by([col], use_threads=False).aggregate(
            [(col, "count")]
        )
        items = red[col].to_numpy(zero_copy_only=False)
        counts = red[f"{col}_count"].to_numpy(zero_copy_only=False).astype(np.int64)
        items, counts = _mg_trim(items, counts, capacity)
        return pa.table({"item": pa.array(items), alias: pa.array(counts, pa.int64())})

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("item")
        .aggregate(Sum(on=alias, alias_name=alias))
        .to_pandas()
    )
    items, counts = _mg_trim(
        merged["item"].to_numpy(), merged[alias].to_numpy().astype(np.int64), capacity
    )
    out = pd.DataFrame({"item": items, alias: counts})
    return out.sort_values([alias, "item"], ascending=[False, True]).reset_index(
        drop=True
    )
