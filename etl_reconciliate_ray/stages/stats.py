"""Grouped second-moment statistics (variance / stddev / covariance /
Pearson correlation) as a MERGEABLE sketch.

The reference only sums and counts (SURVEY §2 A1-A4); a training-data
pipeline also needs distributional statistics per slice (feature
drift, quality-score dispersion, length/score correlation). The naive
``E[x²]-E[x]²`` formula is catastrophically cancellative at 100 TB row
counts, so each batch emits CENTERED partials — (n, mean, M2, Cxy) per
key — and partials are merged pairwise with Chan's parallel update
(Chan, Golub, LeVeque 1983; the same combiner algebra used by Spark's
``StatCounter`` and DuckDB's windowed STDDEV):

    δ = mean_b - mean_a;  n = n_a + n_b
    mean = mean_a + δ·n_b/n
    M2   = M2_a + M2_b + δ²·n_a·n_b/n          (same form for Cxy)

Scale shape: per-batch partials are computed with pandas C-speed
``groupby.transform`` (no per-row Python); only one row per
(key, batch) crosses the wire; the global merge folds a handful of
partial rows per key inside ``map_groups``. Exchange volume is
O(keys × batches), independent of row count."""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd


def _chan_fold(g: pd.DataFrame, with_y: bool) -> dict:
    n, mx, m2x = 0.0, 0.0, 0.0
    my, m2y, cxy = 0.0, 0.0, 0.0
    for row in g.itertuples(index=False):
        nb, mxb, m2xb = float(row.n), row.mean_x, row.m2_x
        if nb == 0:
            continue
        tot = n + nb
        dx = mxb - mx
        if with_y:
            dy = row.mean_y - my
            cxy = cxy + row.cxy + dx * dy * n * nb / tot
            m2y = m2y + row.m2_y + dy * dy * n * nb / tot
            my = my + dy * nb / tot
        m2x = m2x + m2xb + dx * dx * n * nb / tot
        mx = mx + dx * nb / tot
        n = tot
    out = {"n": int(n), "mean_x": mx, "m2_x": m2x}
    if with_y:
        out.update({"mean_y": my, "m2_y": m2y, "cxy": cxy})
    return out


def grouped_stats(ds, keys: Sequence[str], x: str, y: str | None = None):
    """Per-key n / mean / sample-variance of ``x`` (and covariance +
    Pearson correlation with ``y`` if given).

    Returns a Dataset with columns: keys, n, mean_x, var_x
    (+ corr_xy). Single-pass, one tiny shuffle of centered partials.
    """
    keys = list(keys)
    with_y = y is not None

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # dropna=False: rows with a NULL group key form their own group
        # (SQL GROUP BY emits a NULL group; silently dropping them
        # would lose data from per-slice drift stats)
        g = df.groupby(keys, sort=False, observed=True, dropna=False)
        mx = g[x].transform("mean")
        dx = df[x] - mx
        work = pd.DataFrame({"__dx2": dx * dx})
        for k in keys:
            work[k] = df[k]
        if with_y:
            my = g[y].transform("mean")
            dy = df[y] - my
            work["__dy2"] = dy * dy
            work["__dxy"] = dx * dy
            work["__my"] = my
        work["__mx"] = mx
        w = work.groupby(keys, sort=False, observed=True, dropna=False)
        out = pd.DataFrame({
            "n": g[x].count().astype("int64"),
            "mean_x": g[x].mean(),
            "m2_x": w["__dx2"].sum(),
        })
        if with_y:
            out["mean_y"] = g[y].mean()
            out["m2_y"] = w["__dy2"].sum()
            out["cxy"] = w["__dxy"].sum()
        return out.reset_index()

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        acc = _chan_fold(g, with_y)
        n = acc["n"]
        row = {k: [g.iloc[0][k]] for k in keys}
        row["n"] = [n]
        row["mean_x"] = [acc["mean_x"]]
        row["var_x"] = [acc["m2_x"] / (n - 1) if n > 1 else np.nan]
        if with_y:
            denom = np.sqrt(acc["m2_x"] * acc["m2_y"])
            row["corr_xy"] = [acc["cxy"] / denom if denom > 0 else np.nan]
        return pd.DataFrame(row)

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(keys)
        .map_groups(merge, batch_format="pandas")
    )
