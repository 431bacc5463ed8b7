"""Fuzzy (edit-distance) self-join over a string column.

The reconciliation-adjacent matcher the reference cannot do: find all
pairs of DISTINCT values within Levenshtein distance ``k`` — fuzzy key
matching for reconcile pipelines (typo'd account refs, renamed paths)
and near-identical-name dedup.

Scale design (all published):
1. collapse to distinct values FIRST — the quadratic step must run on
   the value universe, never on rows (a 100 TB table with 10^6
   distinct keys is a 10^6-value problem);
2. q-gram candidate generation with the PREFIX FILTER (Chaudhuri et
   al. 2006; Bayardo et al. 2007 "Scaling Up All Pairs"): a pair
   within distance k shares ≥ (max_grams - k*q) q-grams (the count
   filter of Gravano et al. 2001, VLDB), so each value only needs to
   emit its ``k*q + 1`` globally-RAREST grams — any qualifying pair
   still collides on at least one of them, and rare grams keep the
   per-gram groups small instead of piling everyone onto ``"e "``;
3. exact banded Wagner-Fischer verification (O(k·len) per candidate)
   inside ``map_batches``.

The gram filter is void only when BOTH strings are shorter than
``q*(k+1)`` (count-filter threshold ≤ 0); those few short values are
routed to a dedicated all-pairs pool (bounded: short strings over a
finite alphabet), so the join is EXACT — verified against a DuckDB
``levenshtein`` oracle, not a recall test.

Gram document frequencies are collected to the driver and broadcast:
the bigram universe is alphabet², structurally tiny, unlike anything
row-sized.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def _edit_distance_banded(a: str, b: str, k: int) -> int:
    """Banded Wagner-Fischer: exact distance if ≤ k, else k+1."""
    la, lb = len(a), len(b)
    if abs(la - lb) > k:
        return k + 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    big = k + 1
    if la == 0:
        return lb if lb <= k else big
    prev = list(range(la + 1))
    cur = [0] * (la + 1)
    for j in range(1, lb + 1):
        cur[0] = j
        lo = max(1, j - k)
        hi = min(la, j + k)
        if lo > 1:
            cur[lo - 1] = big
        # column 0 is a live band cell while j <= k — include it in
        # the early-exit minimum or a pure-insertion path gets cut
        best = j if j <= k else big
        bj = b[j - 1]
        for i in range(lo, hi + 1):
            if a[i - 1] == bj:
                c = prev[i - 1]
            else:
                c = min(prev[i - 1], prev[i], cur[i - 1]) + 1
            cur[i] = c
            if c < best:
                best = c
        if hi < la:
            cur[hi + 1] = big
        if best > k:
            return big
        prev, cur = cur, prev
    return prev[la] if prev[la] <= k else big


def _grams(s: str, q: int) -> list[str]:
    if len(s) < q:
        return [s]
    return [s[i : i + q] for i in range(len(s) - q + 1)]


def fuzzy_self_join(ds, col: str, k: int = 2, q: int = 2):
    """All distinct-value pairs of ``col`` within edit distance ``k``
    (see module docstring). Returns (name_a, name_b, dist) with
    name_a < name_b, dist int64."""
    import numpy as np
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Count

    short_cut = q * (k + 1)  # below this, the count filter is void

    # distinct values as a DATASET op (Dataset.unique collects to the
    # driver): per-batch distinct partials, one value-hash shuffle.
    # MATERIALIZED: consumed twice (gram-DF pass + candidate pass) —
    # left lazy, the full input scan and the distinct shuffle (the
    # scale-critical step) would execute twice
    names_ds = (
        ds.select_columns([col])
        .map_batches(
            lambda t: pa.table({col: pc.unique(pc.drop_null(t[col]))}),
            batch_format="pyarrow",
        )
        .groupby(col)
        .map_groups(lambda g: g.head(1), batch_format="pandas")
        .materialize()
    )

    # gram document frequency — bounded by the alphabet², tiny
    def explode(t: pa.Table) -> pa.Table:
        out = []
        for s in t[col].to_pylist():
            out.extend(set(_grams(s, q)))
        return pa.table({"gram": pa.array(out, pa.string())})

    df_rows = (
        names_ds.map_batches(explode, batch_format="pyarrow")
        .groupby("gram")
        .aggregate(Count(alias_name="df"))
        .take_all()
    )
    order = {
        r["gram"]: i
        for i, r in enumerate(
            sorted(df_rows, key=lambda r: (r["df"], r["gram"]))
        )
    }
    order_ref = ray.put(order)
    prefix_n = k * q + 1

    def emit_prefix(t: pa.Table) -> pa.Table:
        from ..functions.broadcast import fetch

        order = fetch(order_ref)
        grams, vals = [], []
        for s in t[col].to_pylist():
            if len(s) < short_cut:
                # short values: the count filter can be void for a
                # short-short pair (T <= 0), so they all meet in one
                # sentinel pool (bounded: short strings over a finite
                # alphabet). A short-LONG pair still has T =
                # g_long - k*q >= 1 (the long side is >= q*(k+1) by
                # definition), so the gram filter applies — but only
                # if the short side emits its FULL gram set (its
                # partner's prefix is unknowable), else boundary
                # pairs like ('abcd', 'abcdef') are silently lost.
                for g in set(_grams(s, q)):
                    grams.append(g)
                    vals.append(s)
                grams.append("\x00short")
                vals.append(s)
                continue
            gs = sorted(set(_grams(s, q)), key=order.__getitem__)
            for g in gs[:prefix_n]:
                grams.append(g)
                vals.append(s)
        return pa.table({
            "gram": pa.array(grams, pa.string()),
            "val": pa.array(vals, pa.string()),
        })

    def pairs_in_group(g: pd.DataFrame) -> pd.DataFrame:
        vs = sorted(set(g["val"]))
        out_a, out_b = [], []
        for i in range(len(vs)):
            for j in range(i + 1, len(vs)):
                if abs(len(vs[i]) - len(vs[j])) <= k:
                    out_a.append(vs[i])
                    out_b.append(vs[j])
        return pd.DataFrame({"name_a": out_a, "name_b": out_b})

    cand = (
        names_ds.map_batches(emit_prefix, batch_format="pyarrow")
        .groupby("gram")
        .map_groups(pairs_in_group, batch_format="pandas")
    )

    def verify(t: pa.Table) -> pa.Table:
        a = t["name_a"].to_pylist()
        b = t["name_b"].to_pylist()
        dist = [_edit_distance_banded(x, y, k) for x, y in zip(a, b)]
        keep = np.array(dist) <= k
        return pa.table({
            "name_a": pa.array(np.array(a, dtype=object)[keep], pa.string()),
            "name_b": pa.array(np.array(b, dtype=object)[keep], pa.string()),
            "dist": pa.array(np.array(dist, dtype=np.int64)[keep], pa.int64()),
        })

    verified = cand.map_batches(verify, batch_format="pyarrow")

    # a pair can surface via several shared prefix grams — dedupe
    def first_row(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return verified.groupby(["name_a", "name_b"]).map_groups(
        first_row, batch_format="pandas"
    )


def fuzzy_lookup(ds, col: str, canon: list[str]):
    """Nearest-canonical assignment: each DISTINCT value of ``col`` is
    mapped to the closest entry of the small ``canon`` list by exact
    Levenshtein distance (ties to the lexicographically smallest
    canonical) — the fuzzy dimension-lookup a reconcile pipeline uses
    to route dirty keys onto a reference vocabulary.

    Scale shape: distinct-first (the quadratic side is |values| ×
    |canon|, never rows × canon), the canonical list rides into every
    task as a closure constant (it is small by definition), and the
    per-batch DP is exact (band = full length, so no cutoff). Returns
    (value, canon, dist)."""
    import pyarrow.compute as pc

    canon_sorted = sorted(set(canon))
    if not canon_sorted:
        raise ValueError("fuzzy_lookup: canon list is empty")

    names_ds = (
        ds.select_columns([col])
        .map_batches(
            lambda t: pa.table({col: pc.unique(pc.drop_null(t[col]))}),
            batch_format="pyarrow",
        )
        .groupby(col)
        .map_groups(lambda g: g.head(1), batch_format="pandas")
    )

    def assign(t: pa.Table) -> pa.Table:
        vals = t[col].to_pylist()
        best_c, best_d = [], []
        for v in vals:
            bc, bd = None, None
            for c in canon_sorted:
                k = max(len(v), len(c))
                d = _edit_distance_banded(v, c, k)
                if bd is None or d < bd:  # ties keep the earlier (sorted) canon
                    bc, bd = c, d
            best_c.append(bc)
            best_d.append(bd)
        return pa.table({
            "value": pa.array(vals, pa.string()),
            "canon": pa.array(best_c, pa.string()),
            "dist": pa.array(best_d, pa.int64()),
        })

    return names_ds.map_batches(assign, batch_format="pyarrow")
