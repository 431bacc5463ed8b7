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

Scale shape: per-batch partials run over zero-copy Arrow — dense
group codes (functions/grouping.group_codes) + ``np.bincount``
reductions, no pandas round trip and no per-row Python on the full
stream; only one row per (key, batch) crosses the wire; the global
merge folds a handful of partial rows per key inside ``map_groups``.
Exchange volume is O(keys × batches), independent of row count."""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.grouping import group_codes


def _col_f64(t: pa.Table, name: str) -> np.ndarray:
    """Column as float64 ndarray, nulls -> NaN (the pandas view)."""
    return (
        pc.cast(t[name], pa.float64())
        .to_numpy(zero_copy_only=False)
        .astype(np.float64, copy=False)
    )


def _grp_mean(codes, valid, x, G):
    """Per-group count and mean over valid rows; mean NaN where n==0
    (pandas ``g[x].mean()`` of an all-null group)."""
    n = np.bincount(codes[valid], minlength=G).astype(np.int64)
    s = np.bincount(codes[valid], weights=x[valid], minlength=G)
    mean = np.divide(s, n, out=np.full(G, np.nan), where=n > 0)
    return n, mean


def _fold_triple(g: pd.DataFrame, n_col: str, mean_col: str, m2_col: str) -> tuple:
    """Chan-merge one (n, mean, M2) moment set across partial rows,
    using ITS OWN count column — x-, y- and pairwise moments have
    different valid-row subsets, so each set must fold with its own n
    (folding y-moments with the x count silently corrupts mean_y/var_y
    whenever the null patterns differ)."""
    n, m, m2 = 0.0, 0.0, 0.0
    for nb, mb, m2b in zip(g[n_col], g[mean_col], g[m2_col]):
        nb = float(nb)
        if nb == 0:
            continue
        tot = n + nb
        d = mb - m
        m2 = m2 + m2b + d * d * n * nb / tot
        m = m + d * nb / tot
        n = tot
    return n, m, m2


def _fold_pairwise(g: pd.DataFrame) -> dict:
    """Chan-merge the pairwise-valid moment set (n_xy; means, M2s and
    the cross-moment Cxy all centered on the SAME pairwise subset, the
    only centering under which the Cxy combiner is exact)."""
    n, mx, my, m2x, m2y, cxy = 0.0, 0.0, 0.0, 0.0, 0.0, 0.0
    for row in g.itertuples(index=False):
        nb = float(row.n_xy)
        if nb == 0:
            continue
        tot = n + nb
        dx = row.mean_x_xy - mx
        dy = row.mean_y_xy - my
        cxy = cxy + row.cxy + dx * dy * n * nb / tot
        m2x = m2x + row.m2x_xy + dx * dx * n * nb / tot
        m2y = m2y + row.m2y_xy + dy * dy * n * nb / tot
        mx = mx + dx * nb / tot
        my = my + dy * nb / tot
        n = tot
    return {"n_xy": n, "mean_x_xy": mx, "mean_y_xy": my,
            "m2x_xy": m2x, "m2y_xy": m2y, "cxy": cxy}


def grouped_stats(ds, keys: Sequence[str], x: str, y: str | None = None):
    """Per-key n / mean / sample-variance of ``x`` (and covariance +
    Pearson correlation with ``y`` if given).

    Returns a Dataset with columns: keys, n, mean_x, var_x
    (+ corr_xy). Single-pass, one tiny shuffle of centered partials.
    """
    keys = list(keys)
    with_y = y is not None

    def partial(t: pa.Table) -> pa.Table:
        # NULL group keys form their own group (SQL GROUP BY emits a
        # NULL group; silently dropping them would lose data from
        # per-slice drift stats) — group_codes guarantees this
        codes, first, G = group_codes(t, keys)
        xs = _col_f64(t, x)
        vx = ~np.isnan(xs)
        n, mx = _grp_mean(codes, vx, xs, G)
        dx = xs - mx[codes]
        rep = t.select(keys).take(pa.array(first))
        cols = {k: rep[k] for k in keys}
        cols["n"] = pa.array(n)
        cols["mean_x"] = pa.array(mx)
        cols["m2_x"] = pa.array(np.bincount(codes[vx], weights=(dx * dx)[vx], minlength=G))
        if with_y:
            # three independent moment sets, each centered on ITS OWN
            # subset's mean: y-stats over valid-y rows (SQL AVG/VAR),
            # cross-stats over pairwise-valid rows (SQL CORR/REGR_*) —
            # x-centered deltas reused for y subsets would break the
            # Chan combiner whenever null patterns differ (ADVICE r3)
            ys = _col_f64(t, y)
            vy = ~np.isnan(ys)
            n_y, my = _grp_mean(codes, vy, ys, G)
            dy = ys - my[codes]
            cols["n_y"] = pa.array(n_y)
            cols["mean_y"] = pa.array(my)
            cols["m2_y"] = pa.array(np.bincount(codes[vy], weights=(dy * dy)[vy], minlength=G))
            vxy = vx & vy
            n_xy, mxp = _grp_mean(codes, vxy, xs, G)
            _, myp = _grp_mean(codes, vxy, ys, G)
            dxp = xs - mxp[codes]
            dyp = ys - myp[codes]
            cols["n_xy"] = pa.array(n_xy)
            cols["mean_x_xy"] = pa.array(mxp)
            cols["mean_y_xy"] = pa.array(myp)
            cols["m2x_xy"] = pa.array(np.bincount(codes[vxy], weights=(dxp * dxp)[vxy], minlength=G))
            cols["m2y_xy"] = pa.array(np.bincount(codes[vxy], weights=(dyp * dyp)[vxy], minlength=G))
            cols["cxy"] = pa.array(np.bincount(codes[vxy], weights=(dxp * dyp)[vxy], minlength=G))
        return pa.table(cols)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        n, mean_x, m2_x = _fold_triple(g, "n", "mean_x", "m2_x")
        n = int(n)
        row = {k: [g.iloc[0][k]] for k in keys}
        row["n"] = [n]
        row["mean_x"] = [mean_x if n > 0 else np.nan]
        row["var_x"] = [m2_x / (n - 1) if n > 1 else np.nan]
        if with_y:
            n_y, mean_y, m2_y = _fold_triple(g, "n_y", "mean_y", "m2_y")
            n_y = int(n_y)
            pw = _fold_pairwise(g)
            denom = np.sqrt(pw["m2x_xy"] * pw["m2y_xy"])
            row["corr_xy"] = [pw["cxy"] / denom if denom > 0 else np.nan]
            # regression artifacts over the pairwise subset (slope =
            # Cxy/M2x is the same ratio for sample and population
            # forms, matching SQL REGR_SLOPE/REGR_INTERCEPT)
            row["mean_y"] = [mean_y if n_y > 0 else np.nan]
            row["var_y"] = [m2_y / (n_y - 1) if n_y > 1 else np.nan]
            slope = pw["cxy"] / pw["m2x_xy"] if pw["m2x_xy"] > 0 else np.nan
            row["slope_xy"] = [slope]
            row["icept_xy"] = [pw["mean_y_xy"] - slope * pw["mean_x_xy"]]
        return pd.DataFrame(row)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(keys)
        .map_groups(merge, batch_format="pandas")
    )


def _pebay_fold(g: pd.DataFrame) -> tuple[float, float, float, float, float]:
    """Merge per-batch (n, mean, M2, M3, M4) partials with Pébay's
    pairwise update (Pébay 2008, SAND2008-6212 — the M3/M4 analogue of
    Chan's M2 combiner). Returns (n, mean, M2, M3, M4)."""
    n, mx, m2, m3, m4 = 0.0, 0.0, 0.0, 0.0, 0.0
    for row in g.itertuples(index=False):
        nb = float(row.n)
        if nb == 0:
            continue
        mb, m2b, m3b, m4b = row.mean_x, row.m2_x, row.m3_x, row.m4_x
        tot = n + nb
        d = mb - mx
        d2 = d * d
        m4 = (
            m4 + m4b
            + d2 * d2 * n * nb * (n * n - n * nb + nb * nb) / (tot**3)
            + 6.0 * d2 * (n * n * m2b + nb * nb * m2) / (tot**2)
            + 4.0 * d * (n * m3b - nb * m3) / tot
        )
        m3 = (
            m3 + m3b
            + d * d2 * n * nb * (n - nb) / (tot**2)
            + 3.0 * d * (n * m2b - nb * m2) / tot
        )
        m2 = m2 + m2b + d2 * n * nb / tot
        mx = mx + d * nb / tot
        n = tot
    return n, mx, m2, m3, m4


def grouped_higher_moments(ds, keys: Sequence[str], x: str):
    """Per-key adjusted sample skewness and excess kurtosis — the
    distribution-shape drift monitors (a quality-score column going
    heavy-tailed is invisible to mean/variance). Same single-pass
    mergeable-sketch shape as ``grouped_stats``: batches emit centered
    (n, mean, M2, M3, M4) partials, one O(keys × batches) shuffle,
    Pébay's exact pairwise merge per key. Estimators match DuckDB /
    pandas adjusted conventions:

        skew = g1·sqrt(n(n-1))/(n-2),          g1 = (M3/n)/(M2/n)^1.5
        kurt = ((n+1)·g2 + 6)·(n-1)/((n-2)(n-3)), g2 = n·M4/M2² - 3

    Returns (keys, n, skew_e6, kurt_e6) with the e6-rounded integer
    contract (float merge order differs between engines by ulps; the
    rounding makes the comparison exact)."""
    keys = list(keys)

    def partial(t: pa.Table) -> pa.Table:
        codes, first, G = group_codes(t, keys)
        xs = _col_f64(t, x)
        vx = ~np.isnan(xs)
        n, mx = _grp_mean(codes, vx, xs, G)
        d = xs - mx[codes]
        d2 = d * d
        cv, dv2 = codes[vx], d2[vx]
        rep = t.select(keys).take(pa.array(first))
        cols = {k: rep[k] for k in keys}
        cols["n"] = pa.array(n)
        cols["mean_x"] = pa.array(mx)
        cols["m2_x"] = pa.array(np.bincount(cv, weights=dv2, minlength=G))
        cols["m3_x"] = pa.array(np.bincount(cv, weights=(d * d2)[vx], minlength=G))
        cols["m4_x"] = pa.array(np.bincount(cv, weights=dv2 * dv2, minlength=G))
        return pa.table(cols)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        n, _, m2, m3, m4 = _pebay_fold(g)
        row = {k: [g.iloc[0][k]] for k in keys}
        row["n"] = [int(n)]
        if n > 2 and m2 > 0:
            g1 = (m3 / n) / (m2 / n) ** 1.5
            skew = g1 * np.sqrt(n * (n - 1)) / (n - 2)
            row["skew_e6"] = [int(round(skew * 1e6))]
        else:
            row["skew_e6"] = [None]
        if n > 3 and m2 > 0:
            g2 = n * m4 / (m2 * m2) - 3.0
            kurt = ((n + 1) * g2 + 6.0) * (n - 1) / ((n - 2) * (n - 3))
            row["kurt_e6"] = [int(round(kurt * 1e6))]
        else:
            row["kurt_e6"] = [None]
        return pd.DataFrame(row).astype({"skew_e6": "Int64", "kurt_e6": "Int64"})

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(keys)
        .map_groups(merge, batch_format="pandas")
    )
