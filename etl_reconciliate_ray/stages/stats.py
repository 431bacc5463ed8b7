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
            ys = _col_f64(t, y)
            vy = ~np.isnan(ys)
            _, my = _grp_mean(codes, vy, ys, G)
            dy = ys - my[codes]
            vxy = vx & vy
            cols["mean_y"] = pa.array(my)
            cols["m2_y"] = pa.array(np.bincount(codes[vy], weights=(dy * dy)[vy], minlength=G))
            cols["cxy"] = pa.array(np.bincount(codes[vxy], weights=(dx * dy)[vxy], minlength=G))
        return pa.table(cols)

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
            # regression artifacts (slope = Cxy/M2x is the same ratio
            # for sample and population forms, matching SQL REGR_SLOPE)
            row["mean_y"] = [acc["mean_y"]]
            row["var_y"] = [acc["m2_y"] / (n - 1) if n > 1 else np.nan]
            slope = acc["cxy"] / acc["m2_x"] if acc["m2_x"] > 0 else np.nan
            row["slope_xy"] = [slope]
            row["icept_xy"] = [acc["mean_y"] - slope * acc["mean_x"]]
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
